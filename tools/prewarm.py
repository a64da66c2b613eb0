#!/usr/bin/env python3
"""Parallel compile-cache prewarmer for the quality/bench matrix.

The per-config XLA+Mosaic compiles dominate cold-start wall time (~20-30
minutes per (block, preset) at -medium on the axon tunnel), but they run
on the remote compile helper, not this host's CPU — so compiling several
configs CONCURRENTLY from one process (threads; compiles release the GIL)
collapses the matrix's total compile wall time toward the slowest single
config. Reference analog: none — the reference is AOT-compiled C++; this
is the TPU build's context-build cost, paid once into the persistent
compile cache (astcenc_tpu/__init__.py).

  python tools/prewarm.py --configs 4x4:medium,5x5:medium --threads 4
  python tools/prewarm.py --all --threads 5        # 5 blocks x 4 presets
"""

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BLOCKS = ("4x4", "5x5", "6x6", "8x8", "12x12")
PRESETS = ("fastest", "fast", "medium", "thorough")


def load_image():
    src = "/root/reference/Test/Images/Small/LDR-RGB/ldr-rgb-01.png"
    if os.path.exists(src):
        from PIL import Image
        return np.asarray(Image.open(src).convert("RGBA"))
    rng = np.random.RandomState(0)
    return rng.randint(0, 255, (256, 256, 4), np.uint8)


def _parse(spec: str):
    from astcenc_tpu.config import Profile, Quality
    parts = spec.split(":")
    dims = [int(v) for v in parts[0].split("x")]
    bx, by = dims[0], dims[1]
    bz = dims[2] if len(dims) > 2 else 1
    q = getattr(Quality, parts[1].upper())
    kind = parts[2] if len(parts) > 2 else "ldr"
    profile = Profile.HDR_RGB_LDR_A if kind == "hdr" else Profile.LDR
    return bx, by, bz, q, profile, kind


def warm_one(spec: str, img):
    from astcenc_tpu import api
    bx, by, bz, q, profile, _ = _parse(spec)
    t0 = time.perf_counter()
    cfg = api.config_init(profile, bx, by, bz, q, 0)
    ctx = api.context_alloc(cfg)
    vol = img[None] if bz == 1 else np.repeat(img[None], bz, 0)
    blocks = api.compress_image(ctx, vol)
    api.decompress_image(ctx, blocks, img.shape[1], img.shape[0], bz)
    dt = time.perf_counter() - t0
    print(f"warmed {spec}: {dt:.1f}s", flush=True)
    return spec, dt


def warm_chunk(spec: str, chunk: int):
    """Warm the compacted schedule at an explicit chunk shape (the
    bench/bench_matrix dispatch shapes, which differ from the image-bucket
    shapes warm_one hits). Zero blocks: every program still compiles, but
    the survivor loops run zero trips so the warm executes in
    milliseconds once compiled."""
    import jax
    from astcenc_tpu import api
    from astcenc_tpu.codec import compress as cm
    bx, by, bz, q, profile, kind = _parse(spec)
    t0 = time.perf_counter()
    cfg = api.config_init(profile, bx, by, bz, q, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = api._enc_key(ctx.bsd)
    runner = cm.CompactRunner(ctx._dtables_key, ctx._enc_key,
                              cm._CfgStatic(ctx.config))
    T = bx * by * bz
    dt_ = np.float32 if kind == "hdr" else np.uint8
    tex = jax.device_put(np.zeros((chunk, T, 4), dt_))
    blocks = runner.run(tex)
    # Matrix decode line: one 256x256(x6) image worth of blocks.
    n_img = (-(-256 // bx)) * (-(-256 // by))
    d = 6 if bz > 1 else 1
    api.decompress_image(ctx, blocks[:n_img], 256, 256, d, out_type="u8")
    dt = time.perf_counter() - t0
    print(f"warmed {spec}@{chunk}: {dt:.1f}s", flush=True)
    return spec, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=0,
                    help="warm the compacted schedule at this chunk shape "
                         "(bench/bench_matrix dispatch) instead of the "
                         "image path")
    args = ap.parse_args()

    specs = [s for s in args.configs.split(",") if s]
    if args.all:
        specs += [f"{b}:{p}" for p in PRESETS for b in BLOCKS]
    if not specs:
        ap.error("nothing to warm: pass --configs or --all")

    img = load_image()

    def safe(s):
        try:
            if args.chunk:
                return warm_chunk(s, args.chunk)
            return warm_one(s, img)
        except Exception as e:  # noqa: BLE001 - report, keep warming others
            print(f"FAILED {s}: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return s, None

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.threads) as ex:
        list(ex.map(safe, specs))
    print(f"total: {time.perf_counter() - t0:.1f}s for {len(specs)} configs",
          flush=True)


if __name__ == "__main__":
    main()
