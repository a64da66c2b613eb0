#!/usr/bin/env python3
"""Benchmark matrix: block sizes x presets, coding + decoding rates.

Reference analog: the coding/decoding rate report of the CLI
(astcenccli_toplevel.cpp:2351-2378) over the committed result-CSV matrix.
Emits one JSON object with a line per config to stdout and (with --out)
to a file, same schema as bench.py plus a decode line per block size.

  python tools/bench_matrix.py --out BENCH_MATRIX_r04.json
  python tools/bench_matrix.py --configs 6x6:medium,8x8:fastest
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

# Reference baselines: Kodak set coding rates, astcenc 5.0 AVX2 6-thread
# (BASELINE.md table; MT/s).
BASELINES = {
    ("4x4", "fastest"): 37.3, ("6x6", "fastest"): 42.5,
    ("8x8", "fastest"): 35.2, ("12x12", "fastest"): 51.0,
    ("4x4", "medium"): 5.14, ("6x6", "medium"): 9.48,
    ("8x8", "medium"): 7.68, ("12x12", "medium"): 8.83,
    ("4x4", "thorough"): 1.95, ("6x6", "thorough"): 1.90,
    ("8x8", "thorough"): 1.85, ("12x12", "thorough"): 1.44,
}

DEFAULT_CONFIGS = ("4x4:fastest", "6x6:fastest", "8x8:fastest",
                   "12x12:fastest", "4x4:medium", "6x6:medium",
                   "8x8:medium", "12x12:medium", "6x6:thorough")


def load_blocks(size, bx, by):
    src = "/root/reference/Test/Images/Small/LDR-RGB/ldr-rgb-00.png"
    if os.path.exists(src):
        from PIL import Image
        img = Image.open(src).convert("RGBA").resize((size, size))
        data = np.asarray(img)
    else:
        rng = np.random.RandomState(0)
        base = rng.randint(0, 255, (size // 8, size // 8, 4), np.uint8)
        data = np.kron(base, np.ones((8, 8, 1), np.uint8))
        data[..., 3] = 255
    H, W, _ = data.shape
    nx, ny = (W + bx - 1) // bx, (H + by - 1) // by
    ix = np.minimum(np.arange(nx * bx), W - 1)
    iy = np.minimum(np.arange(ny * by), H - 1)
    padded = data[np.ix_(iy, ix)].astype(np.uint8)
    blocks = padded.reshape(ny, by, nx, bx, 4).transpose(0, 2, 1, 3, 4)
    return blocks.reshape(ny * nx, by * bx, 4)


def bench_one(block, quality, size, reps, chunk):
    import jax
    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.codec import compress as cm

    bx, by = (int(v) for v in block.split("x"))
    qual = {"fastest": Quality.FASTEST, "fast": Quality.FAST,
            "medium": Quality.MEDIUM, "thorough": Quality.THOROUGH}[quality]
    cfg = api.config_init(Profile.LDR, bx, by, 1, qual, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = api._enc_key(ctx.bsd)
    cfgs = cm._CfgStatic(ctx.config)

    tx = load_blocks(size, bx, by)
    # Full fixed-size chunks from a cyclically-extended block stream
    # (bench.py scheme): every encoded block is real work.
    rng = np.random.RandomState(1)
    stream = []
    for r in range(reps):
        c = tx.copy()
        c[0, 0, 0] = rng.randint(0, 256)
        stream.append(c)
    stream = np.concatenate(stream, 0)
    pad = (-stream.shape[0]) % chunk
    if pad:
        stream = np.concatenate([stream, stream[:pad]], 0)
    n_texels_total = stream.shape[0] * tx.shape[1]
    chunks = [jax.device_put(stream[i:i + chunk])
              for i in range(0, stream.shape[0], chunk)]

    runner = cm.CompactRunner(ctx._dtables_key, ctx._enc_key, cfgs)
    runner.prewarm(chunks[0])
    out_blocks = runner.run(chunks[0])  # warm / compile
    depth = max(1, int(os.environ.get("ASTC_PIPELINE", "4")))
    t0 = time.perf_counter()
    for _ in runner.pipeline(iter(chunks), depth):
        pass
    enc_dt = time.perf_counter() - t0

    # Decode rate: same blocks through the batched decoder.
    w = h = size
    n_img = (-(-size // bx)) * (-(-size // by))
    api.decompress_image(ctx, out_blocks[:n_img], w, h, 1, out_type="u8")
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(api.decompress_image(ctx, out_blocks[:n_img],
                                        w, h, 1, out_type="u8"))
    dec_dt = (time.perf_counter() - t0) / reps
    n_texels = n_img * tx.shape[1]
    return n_texels_total / enc_dt / 1e6, n_texels / dec_dt / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(DEFAULT_CONFIGS))
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunk", type=int,
                    default=int(os.environ.get("ASTC_CHUNK", "65536")))
    ap.add_argument("--out")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ASTC_JAX_CACHE", "/tmp/jax_cache"))

    rows = []
    for spec in args.configs.split(","):
        block, quality = spec.split(":")
        try:
            enc, decr = bench_one(block, quality, args.size, args.reps,
                                  args.chunk)
        except Exception as e:  # noqa: BLE001 - record, keep going
            rows.append({"config": spec, "error": f"{type(e).__name__}: {e}"})
            print(json.dumps(rows[-1]), flush=True)
            continue
        base = BASELINES.get((block, quality))
        row = {"metric": f"compress_{block}_{quality}_throughput",
               "value": round(enc, 3), "unit": "Mtexels/s",
               "vs_baseline": round(enc / base, 3) if base else None,
               "decode_mts": round(decr, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"matrix": rows, "image": "ldr-rgb-00@%d" % args.size,
                       "chunk": args.chunk, "reps": args.reps}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
