#!/usr/bin/env python3
"""Profile one compressed chunk on the live backend.

Captures a JAX profiler trace of the monolithic compress program and
prints the per-op cost breakdown (the throughput to-do list for the
kernelization work). Usage:

  python tools/tpu_profile.py [--size 512] [--chunk 8192] [--block 6x6]
  python tools/tpu_profile.py --stage      # time split stages instead

The trace lands in /tmp/astc_trace (inspect with tensorboard or
xprof if available; the stdout summary is self-contained).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--block", default="6x6")
    ap.add_argument("--quality", default="medium")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--trace", default="/tmp/astc_trace")
    ap.add_argument("--stage", action="store_true",
                    help="time the split-stage path per stage")
    ap.add_argument("--compact", action="store_true",
                    help="profile the wavefront-compacted runner")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ASTC_JAX_CACHE", "/tmp/jax_cache"))

    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.codec import compress as compress_mod
    from astcenc_tpu.codec.trial import build_encoder_tables

    bx, by = (int(v) for v in args.block.split("x"))
    qual = {"fastest": Quality.FASTEST, "fast": Quality.FAST,
            "medium": Quality.MEDIUM, "thorough": Quality.THOROUGH}[
                args.quality]

    cfg = api.config_init(Profile.LDR, bx, by, 1, qual, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = api._enc_key(ctx.bsd)
    cfgs = compress_mod._CfgStatic(ctx.config)

    src = "/root/reference/Test/Images/Small/LDR-RGB/ldr-rgb-00.png"
    if os.path.exists(src):
        from PIL import Image
        img = Image.open(src).convert("RGBA").resize((args.size, args.size))
        data = np.asarray(img)
    else:
        rng = np.random.RandomState(0)
        data = rng.randint(0, 255, (args.size, args.size, 4), np.uint8)

    H, W, _ = data.shape
    nxb, nyb = (W + bx - 1) // bx, (H + by - 1) // by
    idx_x = np.minimum(np.arange(nxb * bx), W - 1)
    idx_y = np.minimum(np.arange(nyb * by), H - 1)
    # uint8 blocks, same as bench.py — device-side promotion, and the
    # jit signatures (and so the persistent compile cache) match.
    padded = data[np.ix_(idx_y, idx_x)].astype(np.uint8)
    blocks = padded.reshape(nyb, by, nxb, bx, 4).transpose(
        0, 2, 1, 3, 4).reshape(-1, by * bx, 4)
    n = blocks.shape[0]
    if n < args.chunk:
        reps_needed = (args.chunk + n - 1) // n
        blocks = np.concatenate([blocks] * reps_needed)[:args.chunk]
    chunk = jax.device_put(blocks[:args.chunk])

    if args.compact:
        runner = compress_mod.CompactRunner(ctx._dtables_key,
                                            ctx._enc_key, cfgs)

        def fn(_d, _e, _c, ch):
            return runner.run(ch)
    else:
        fn = compress_mod.compress_symbolic_batch_mono_u8
    t0 = time.perf_counter()
    np.asarray(fn(ctx._dtables_key, ctx._enc_key, cfgs, chunk))
    print(f"compile+run: {time.perf_counter() - t0:.1f}s", flush=True)

    for r in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(fn(ctx._dtables_key, ctx._enc_key, cfgs, chunk))
        dt = time.perf_counter() - t0
        mts = args.chunk * bx * by / dt / 1e6
        print(f"rep {r}: {dt:.3f}s = {mts:.2f} MT/s", flush=True)

    if args.stage:
        os.environ["ASTC_MONO_JIT"] = "0"
        t0 = time.perf_counter()
        np.asarray(compress_mod.compress_symbolic_batch(
            ctx._dtables_key, ctx._enc_key, cfgs, chunk))
        print(f"split compile+run: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        np.asarray(compress_mod.compress_symbolic_batch(
            ctx._dtables_key, ctx._enc_key, cfgs, chunk))
        print(f"split steady: {time.perf_counter() - t0:.3f}s")

    with jax.profiler.trace(args.trace):
        np.asarray(fn(ctx._dtables_key, ctx._enc_key, cfgs, chunk))
    print("trace written to", args.trace)


if __name__ == "__main__":
    main()
