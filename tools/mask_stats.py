#!/usr/bin/env python3
"""Measure per-pass lane-activity on a real image: what fraction of blocks
the reference's early-out ladder would actually run in each pass.

This is the sizing data for pass-level compaction (run later passes on a
compacted survivor batch instead of masked full-width lanes).

  python tools/mask_stats.py [--size 1024] [--block 6x6] [--quality medium]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--block", default="6x6")
    ap.add_argument("--quality", default="medium")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ASTC_JAX_CACHE", "/tmp/jax_cache"))

    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.codec import compress as cm
    from astcenc_tpu.codec import trial

    bx, by = (int(v) for v in args.block.split("x"))
    qual = {"fastest": Quality.FASTEST, "fast": Quality.FAST,
            "medium": Quality.MEDIUM, "thorough": Quality.THOROUGH}[
                args.quality]
    cfg = api.config_init(Profile.LDR, bx, by, 1, qual, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = cm.EncKey(trial.build_encoder_tables(ctx.bsd), ctx.bsd)
    cfgs = cm._CfgStatic(ctx.config)

    src = "/root/reference/Test/Images/Small/LDR-RGB/ldr-rgb-00.png"
    from PIL import Image
    img = Image.open(src).convert("RGBA").resize((args.size, args.size))
    data = np.asarray(img)
    texels = _blockify(data, (bx, by))
    N = texels.shape[0]
    T = texels.shape[1]

    st = cm.make_block_state(jnp.asarray(texels), cfgs.channel_weights, 1,
                             alpha_weight=False)
    is_const = np.asarray(
        jnp.all(st["data_min"] == st["data_max"], axis=1))

    cw = cfgs.channel_weights
    ews = float(sum(cw)) * T
    thr = cfgs.tune_db_limit * ews
    overshoot = 1.0 / cfgs.tune_mse_overshoot

    et = ctx._enc_key.tables
    pot1 = jnp.zeros((N, T), jnp.int32)
    counts1 = jnp.zeros((N, 4), jnp.int32).at[:, 0].set(T)
    scb = trial.empty_scb(N, T)
    scb["finished"] = jnp.asarray(is_const)
    ql = jnp.full((N,), trial.QUANT_32, jnp.int32)

    # Pass 1: 1 partition 1 plane (the full pass)
    scb, errv = trial.compress_trial_1plane(
        st, et, cfgs, 1, False, pot1, counts1, jnp.zeros((N,), jnp.int32),
        1, False, jnp.full((N,), thr * overshoot, jnp.float32), ql, scb)
    err1 = np.asarray(errv)
    hit1 = err1 < thr
    print(f"N={N}  const={is_const.mean():.3f}")
    print(f"after 1p/1plane: finished(dblimit)={hit1.mean():.3f}")

    # 2-plane gating
    lc = np.asarray(cm._lowest_correlation(st["texels"], cw))
    skip2p = lc > cfgs.tune_2plane_early_out_limit_correlation
    gray = np.asarray(st["grayscale"])
    dmin = np.asarray(st["data_min"])
    dmax = np.asarray(st["data_max"])
    alive = ~hit1 & ~is_const
    any2p = np.zeros(N, bool)
    for comp in (3, 2, 1, 0):
        a = alive & ~skip2p
        if comp != 3:
            a &= ~gray
        a &= dmin[:, comp] != dmax[:, comp]
        print(f"2plane comp {comp}: active={(a.mean()):.3f}")
        any2p |= a
    print(f"2plane any-comp: {any2p.mean():.3f}")
    print(f"multi-partition pc=2 active: {alive.mean():.3f}")
    # pc=3 activity needs the pc=2 results; upper bound = alive
    print(f"(upper bound for pc=3/4: {alive.mean():.3f})")


def _blockify(data, block):
    bx, by = block
    H, W, _ = data.shape
    nx = (W + bx - 1) // bx
    ny = (H + by - 1) // by
    idx_x = np.minimum(np.arange(nx * bx), W - 1)
    idx_y = np.minimum(np.arange(ny * by), H - 1)
    padded = data[np.ix_(idx_y, idx_x)].astype(np.float32) * (65535.0 / 255.0)
    blocks = padded.reshape(ny, by, nx, bx, 4).transpose(0, 2, 1, 3, 4)
    return blocks.reshape(ny * nx, by * bx, 4)


if __name__ == "__main__":
    main()
