#!/usr/bin/env python3
"""Benchmark: ASTC compression throughput at 6x6 -medium (BASELINE.json).

Prints one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: reference astcenc-avx2 Kodak 6x6 -medium = 9.48 MT/s on a 6-core
i5-9600K (BASELINE.md). Run on whatever jax.devices() provides (one TPU chip
under the driver; CPU with JAX_PLATFORMS=cpu).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

BASELINE_MTS = 9.48


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ASTC_JAX_CACHE", "/tmp/jax_cache"))

    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.codec import compress as compress_mod
    from astcenc_tpu.codec.trial import build_encoder_tables

    block = (6, 6)
    quality = Quality.MEDIUM

    # Input: a real test image if available, else synthetic texture data
    src = "/root/reference/Test/Images/Small/LDR-RGB/ldr-rgb-00.png"
    size = int(os.environ.get("ASTC_BENCH_SIZE", "1024"))
    if os.path.exists(src):
        from PIL import Image
        img = Image.open(src).convert("RGBA")
        img = img.resize((size, size)) if img.size != (size, size) else img
        data = np.asarray(img)
    else:
        rng = np.random.RandomState(0)
        base = rng.randint(0, 255, (size // 8, size // 8, 4), np.uint8)
        data = np.kron(base, np.ones((8, 8, 1), np.uint8))
        data[..., 3] = 255

    cfg = api.config_init(Profile.LDR, block[0], block[1], 1, quality, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = compress_mod.EncKey(build_encoder_tables(ctx.bsd), ctx.bsd)
    cfgs = compress_mod._CfgStatic(ctx.config)

    # Pre-blocked input so we time the pure codec step
    texels_np = _blockify(data, block)
    n_texels = texels_np.shape[0] * texels_np.shape[1]

    chunk = int(os.environ.get("ASTC_CHUNK", "8192"))
    nblocks = texels_np.shape[0]
    pad = (-nblocks) % chunk if nblocks > chunk else chunk - nblocks
    if pad:
        texels_np = np.concatenate(
            [texels_np, np.broadcast_to(texels_np[:1],
                                        (pad,) + texels_np.shape[1:])], 0)
    reps = int(os.environ.get("ASTC_BENCH_REPS", "5"))
    nchunks = texels_np.shape[0] // chunk
    # Distinct buffers per (rep, chunk) — a repeated identical dispatch can
    # be memoized by the device tunnel and report fantasy throughput.
    rng = np.random.RandomState(1)
    all_chunks = []
    for r in range(reps):
        for i in range(0, texels_np.shape[0], chunk):
            c = texels_np[i:i + chunk].copy()
            c[0, 0, 0] = float(rng.randint(0, 65536))
            all_chunks.append(jax.device_put(c))

    fn = compress_mod.compress_symbolic_batch_mono

    # Warmup / compile (single monolithic program); fetch to host — on
    # tunneled backends block_until_ready can return before execution ends.
    # Safety ladder: if a Pallas kernel family fails to compile on this
    # backend, fall back to the XLA formulation rather than losing the
    # whole benchmark run.
    for fallback in ("", "msearch", "msearch,refine,psearch,gather"):
        if fallback:
            print(f"bench: retrying with ASTC_DISABLE_KERNELS={fallback}",
                  file=sys.stderr)
            os.environ["ASTC_DISABLE_KERNELS"] = fallback
            jax.clear_caches()
        try:
            np.asarray(fn(ctx._dtables_key, ctx._enc_key, cfgs,
                          all_chunks[0]))
            break
        except Exception as e:      # noqa: BLE001 - any compile/run error
            print(f"bench: warmup failed ({type(e).__name__}: {e})",
                  file=sys.stderr)
    else:
        raise SystemExit("bench: all kernel fallbacks failed")

    # Serialized dispatch+fetch per chunk: block_until_ready alone does not
    # reliably wait on tunneled device backends, and deep in-flight queues
    # of this memory-heavy program thrash the device allocator.
    t0 = time.perf_counter()
    for ch in all_chunks:
        ti = time.perf_counter()
        np.asarray(fn(ctx._dtables_key, ctx._enc_key, cfgs, ch))
        if os.environ.get("ASTC_BENCH_VERBOSE"):
            print(f"iter: {time.perf_counter()-ti:.3f}s", flush=True)
    dt = (time.perf_counter() - t0) / reps

    mts = n_texels / dt / 1e6
    print(json.dumps({
        "metric": "compress_6x6_medium_throughput",
        "value": round(mts, 3),
        "unit": "Mtexels/s",
        "vs_baseline": round(mts / BASELINE_MTS, 3),
    }))


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
