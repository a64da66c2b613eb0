#!/usr/bin/env python3
"""Per-phase device profile of the production (compacted) encode path.

Emits the committed profile artifact (PROFILE_rNN.json): steady-state
milliseconds per pipeline phase over one chunk at 6x6 -medium, plus the
survivor counts that size each compacted phase, plus pipelined end-to-end
throughput at several depths. One process = one warmup cost; every number
comes from explicit host syncs around a single phase.

Usage:
  python tools/profile_phases.py --chunk 8192 --out PROFILE_r04.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def load_chunk(size, bx, by, chunk):
    src = "/root/reference/Test/Images/Small/LDR-RGB/ldr-rgb-00.png"
    if os.path.exists(src):
        from PIL import Image
        img = Image.open(src).convert("RGBA").resize((size, size))
        data = np.asarray(img)
    else:
        rng = np.random.RandomState(0)
        data = rng.randint(0, 255, (size, size, 4), np.uint8)
    H, W, _ = data.shape
    nxb, nyb = (W + bx - 1) // bx, (H + by - 1) // by
    ix = np.minimum(np.arange(nxb * bx), W - 1)
    iy = np.minimum(np.arange(nyb * by), H - 1)
    padded = data[np.ix_(iy, ix)].astype(np.uint8)
    blocks = padded.reshape(nyb, by, nxb, bx, 4).transpose(
        0, 2, 1, 3, 4).reshape(-1, by * bx, 4)
    n = blocks.shape[0]
    if n < chunk:
        blocks = np.concatenate([blocks] * ((chunk + n - 1) // n))
    return blocks[:chunk]


def timed(fn, reps):
    """Median wall seconds of fn() over reps (fn must sync internally)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--block", default="6x6")
    ap.add_argument("--quality", default="medium")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ASTC_JAX_CACHE", "/tmp/jax_cache"))
    import jax.numpy as jnp

    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.codec import compress as cm
    from astcenc_tpu.codec.trial import build_encoder_tables

    bx, by = (int(v) for v in args.block.split("x"))
    qual = {"fastest": Quality.FASTEST, "fast": Quality.FAST,
            "medium": Quality.MEDIUM, "thorough": Quality.THOROUGH}[
                args.quality]
    cfg = api.config_init(Profile.LDR, bx, by, 1, qual, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = api._enc_key(ctx.bsd)
    cfgs = cm._CfgStatic(ctx.config)
    runner = cm.CompactRunner(ctx._dtables_key, ctx._enc_key, cfgs)

    blocks = load_chunk(args.size, bx, by, args.chunk)
    tex = jax.device_put(blocks)
    N = args.chunk
    prof = {"config": f"{args.block} -{args.quality}", "chunk": N,
            "image": f"kodak-like {args.size}x{args.size}",
            "phases_ms": {}, "survivors": {}, "pipeline": {}}

    # ---- Warmup: run the whole phase machine once (compiles everything).
    t0 = time.perf_counter()
    runner.run(tex)
    print(f"warmup (compile+run): {time.perf_counter() - t0:.1f}s",
          flush=True)

    # ---- Phase-by-phase steady state -----------------------------------
    # Each phase is now ONE dispatch (device-side while_loop over survivor
    # slices, see codec.compress._phase_while); timing = dispatch + sync.
    def sync(tree):
        jax.block_until_ready(tree)

    # stage1
    def run_stage1():
        scb, aux = cm._c_stage1_jit(ctx._dtables_key, ctx._enc_key, cfgs,
                                    tex)
        sync(scb["finished"])
        return scb, aux
    prof["phases_ms"]["stage1_1plane"] = 1e3 * timed(
        lambda: run_stage1(), args.reps)
    scb, aux = run_stage1()
    unfin = ~np.asarray(scb["finished"])
    skip2p = np.asarray(aux["skip2p"])
    prof["survivors"]["after_stage1"] = int(unfin.sum())
    prof["survivors"]["2plane_eligible"] = int((unfin & ~skip2p).sum())

    prof["slice_size"] = cm._loop_slice(N)

    def clone(tree):
        # Phase jits donate scb: give every timed rep its own device copy
        # (cheap async device-side copies, outside the dominant costs).
        import jax.numpy as _jnp
        return {k: _jnp.copy(v) for k, v in tree.items()}

    if runner.fuse_tail:
        def run_tail():
            s, bp = cm._c_tail_loop_jit(
                ctx._enc_key, cfgs, tex, clone(scb), aux["quant_limit"],
                aux["best0"], runner.pcs[0])
            sync(s["finished"])
            return s, bp
        prof["phases_ms"]["tail_2plane_pc%d" % runner.pcs[0]] = 1e3 * timed(
            lambda: run_tail(), args.reps)
        scb2, best_prev = run_tail()
        rest_pcs = runner.pcs[1:]
    else:
        def run_2a():
            s = cm._c_2a_loop_jit(ctx._enc_key, cfgs, tex, clone(scb),
                                  aux["quant_limit"], aux["best0"],
                                  aux["skip2p"])
            sync(s["finished"])
            return s
        if runner.has_2plane:
            prof["phases_ms"]["stage2a_2plane"] = 1e3 * timed(run_2a,
                                                              args.reps)
            scb2 = run_2a()
        else:
            scb2 = dict(scb)
        best_prev = aux["best0"]
        rest_pcs = runner.pcs

    # multi-partition levels on real survivor sets
    cur = scb2
    for pc in rest_pcs:
        fin = np.asarray(cur["finished"])
        idx = np.flatnonzero(~fin).astype(np.int32)
        prof["survivors"][f"entering_pc{pc}"] = int(len(idx))
        if not len(idx):
            break
        bp = best_prev

        def run_pc(cur=cur, pc=pc, bp=bp):
            s, b = cm._c_pc_loop_jit(ctx._enc_key, cfgs, tex, clone(cur),
                                     aux["quant_limit"], jnp.copy(bp), pc)
            sync(s["finished"])
            return s, b
        prof["phases_ms"][f"stage2b_pc{pc}"] = 1e3 * timed(
            lambda: run_pc(), args.reps)
        cur, best_prev = run_pc()

    # finalize + pack, split from the result fetch: pack-only syncs via a
    # 16-byte fetch of row 0 (block_until_ready alone can return early on
    # tunneled backends), so `fetch` isolates the (N,16) host transfer.
    def run_fin_pack():
        pcb = cm._c_finalize_jit(ctx._dtables_key, ctx._enc_key, cfgs,
                                 cur, aux)
        np.asarray(pcb[:1])
    def run_fin():
        np.asarray(cm._c_finalize_jit(ctx._dtables_key, ctx._enc_key, cfgs,
                                      cur, aux))
    prof["phases_ms"]["finalize_pack"] = 1e3 * timed(run_fin_pack,
                                                     args.reps)
    prof["phases_ms"]["finalize_pack_fetch"] = 1e3 * timed(run_fin,
                                                           args.reps)

    # Host->device input upload (rides the critical path at depth 1).
    def run_upload():
        t = jax.device_put(blocks)
        np.asarray(t[0, 0])
    prof["upload_ms"] = 1e3 * timed(run_upload, args.reps)

    total_ms = sum(v for k, v in prof["phases_ms"].items()
                   if k != "finalize_pack")
    prof["phases_ms"]["TOTAL_serial"] = total_ms
    texels = N * bx * by
    prof["serial_mts"] = round(texels / total_ms / 1e3, 3)

    # ----

    # Pipelined end-to-end at several depths (distinct buffers per chunk).
    rng = np.random.RandomState(1)
    n_chunks = 8
    chs = []
    for _ in range(n_chunks):
        c = blocks.copy()
        c[0, 0, 0] = rng.randint(0, 256)
        chs.append(jax.device_put(c))
    for depth in (1, 2, 4):
        t0 = time.perf_counter()
        for _ in runner.pipeline(iter(chs), depth):
            pass
        dt = time.perf_counter() - t0
        prof["pipeline"][f"depth{depth}_mts"] = round(
            n_chunks * texels / dt / 1e6, 3)
        print(f"pipeline depth={depth}: "
              f"{prof['pipeline'][f'depth{depth}_mts']} MT/s", flush=True)

    print(json.dumps(prof, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(prof, f, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
