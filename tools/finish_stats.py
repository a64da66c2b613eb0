#!/usr/bin/env python3
"""Measure per-stage finish fractions on the bench image.

How many blocks hit the quality threshold after the 1-partition pass,
after the 2-plane pass, etc.? This sets the ceiling for wavefront
compaction (only unfinished blocks proceed to later, costlier passes).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("ASTC_JAX_CACHE", "/tmp/jax_cache"))


def main():
    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.codec import compress as compress_mod
    from astcenc_tpu.codec import trial

    block = (6, 6)
    size = int(os.environ.get("ASTC_BENCH_SIZE", "1024"))
    qname = os.environ.get("ASTC_QUALITY", "medium")
    qual = {"fastest": Quality.FASTEST, "fast": Quality.FAST,
            "medium": Quality.MEDIUM, "thorough": Quality.THOROUGH}[qname]
    cfg = api.config_init(Profile.LDR, block[0], block[1], 1, qual, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = compress_mod.EncKey(
        trial.build_encoder_tables(ctx.bsd), ctx.bsd)
    cfgs = compress_mod._CfgStatic(ctx.config)

    src = "/root/reference/Test/Images/Small/LDR-RGB/ldr-rgb-00.png"
    from PIL import Image
    img = Image.open(src).convert("RGBA").resize((size, size))
    data = np.asarray(img)
    bx, by = block
    H, W, _ = data.shape
    nx, ny = W // bx, H // by
    data = data[:ny * by, :nx * bx]
    blocks = data.reshape(ny, by, nx, bx, 4).transpose(0, 2, 1, 3, 4)
    blocks = blocks.reshape(-1, by * bx, 4).astype(np.float32) * (65535.0/255.)
    N = blocks.shape[0]
    pad = (-N) % 8192
    if pad:
        blocks = np.concatenate(
            [blocks, np.broadcast_to(blocks[:1], (pad,) + blocks.shape[1:])])
    texels = jnp.asarray(blocks)
    print(f"N={N} (padded {blocks.shape[0]}) quality={qname}")

    stats = compress_mod.compress_stage_stats(
        ctx._dtables_key, ctx._enc_key, cfgs, texels)
    for name, frac in stats:
        print(f"{name::>28}: unfinished {frac*100:6.2f}%")


if __name__ == "__main__":
    main()
