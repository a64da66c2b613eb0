#!/usr/bin/env python3
"""Benchmark matrix: block sizes x presets, coding + decoding rates.

Reference analog: the coding/decoding rate report of the CLI
(astcenccli_toplevel.cpp:2351-2378) over the committed result-CSV matrix.
Emits one JSON object with a line per config to stdout and (with --out)
to a file, same schema as bench.py plus a decode rate per line.

Content is a native-resolution mosaic of the reference Small LDR-RGB
corpus (upscaling smooths content and flatters the early-exit economics),
so the matched baseline for each (block, preset) is the aggregate
whole-corpus rate of the same images from the committed reference result
CSVs (6-thread i5-9600K AVX2). The legacy Kodak-set baselines from
BASELINE.md are also reported where defined (different corpus — harder
to compare, kept for continuity).

HDR lines use hdr-rgb-00.hdr (the committed CSVs carry its per-image
rate); 3D lines (6x6x6) stack mosaic images into volumes (no 3D rows
exist in the reference CSVs).

  python tools/bench_matrix.py --out BENCH_MATRIX_r05.json
  python tools/bench_matrix.py --configs 6x6:medium,6x6:medium:hdr
"""

import argparse
import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

SMALL = "/root/reference/Test/Images/Small"
REF_CSV = SMALL + "/astc_reference-5.0-avx2_%s_results.csv"

# Legacy reference baselines: Kodak set coding rates, astcenc 5.0 AVX2
# 6-thread (BASELINE.md table; MT/s). Different corpus than the mosaic.
KODAK_BASELINES = {
    ("4x4", "fastest"): 37.3, ("6x6", "fastest"): 42.5,
    ("8x8", "fastest"): 35.2, ("12x12", "fastest"): 51.0,
    ("4x4", "medium"): 5.14, ("6x6", "medium"): 9.48,
    ("8x8", "medium"): 7.68, ("12x12", "medium"): 8.83,
    ("4x4", "thorough"): 1.95, ("6x6", "thorough"): 1.90,
    ("8x8", "thorough"): 1.85, ("12x12", "thorough"): 1.44,
}

DEFAULT_CONFIGS = ("4x4:fastest", "6x6:fastest", "8x8:fastest",
                   "12x12:fastest", "4x4:medium", "6x6:medium",
                   "8x8:medium", "12x12:medium", "6x6:thorough",
                   "4x4:medium:hdr", "6x6:medium:hdr",
                   "6x6x6:fastest", "6x6x6:medium")


def small_baseline(block, preset, kind):
    """Aggregate reference rate (total texels / total coding time) over the
    matched rows of the committed Small-set CSV."""
    path = REF_CSV % preset
    if not os.path.exists(path):
        return None
    total_t, total_s = 0.0, 0.0
    want = "hdr-rgb-00.hdr" if kind == "hdr" else "ldr-rgb-"
    for r in csv.DictReader(open(path)):
        if r["Block Size"] != block or not r["Name"].startswith(want):
            continue
        rate = float(r["Coding Rate"])
        if rate <= 0:
            continue
        texels = 256 * 256
        total_t += texels
        total_s += texels / (rate * 1e6)
    return (total_t / total_s / 1e6) if total_s else None


def _ldr_images():
    d = os.path.join(SMALL, "LDR-RGB")
    from PIL import Image
    return [np.asarray(Image.open(os.path.join(d, f)).convert("RGBA"))
            for f in sorted(os.listdir(d)) if f.endswith(".png")]


def _blockify2d(data, bx, by):
    H, W, _ = data.shape
    nx, ny = (W + bx - 1) // bx, (H + by - 1) // by
    ix = np.minimum(np.arange(nx * bx), W - 1)
    iy = np.minimum(np.arange(ny * by), H - 1)
    padded = data[np.ix_(iy, ix)]
    blocks = padded.reshape(ny, by, nx, bx, 4).transpose(0, 2, 1, 3, 4)
    return blocks.reshape(ny * nx, by * bx, 4)


def _blockify3d(vol, bx, by, bz):
    Z, H, W, _ = vol.shape
    nx, ny, nz = (W + bx - 1) // bx, (H + by - 1) // by, (Z + bz - 1) // bz
    ix = np.minimum(np.arange(nx * bx), W - 1)
    iy = np.minimum(np.arange(ny * by), H - 1)
    iz = np.minimum(np.arange(nz * bz), Z - 1)
    padded = vol[np.ix_(iz, iy, ix)]
    blocks = padded.reshape(nz, bz, ny, by, nx, bx, 4)
    blocks = blocks.transpose(0, 2, 4, 1, 3, 5, 6)
    return blocks.reshape(nz * ny * nx, bz * by * bx, 4)


def load_blocks(kind, bx, by, bz):
    """Native-res block stream for one config (uint8 for LDR, f32 LNS for
    HDR)."""
    if kind == "hdr":
        from astcenc_tpu.io import image_io
        from astcenc_tpu.ops import softfloat as sf
        import jax.numpy as jnp
        img, _, _ = image_io.load_image(os.path.join(
            SMALL, "HDR-RGB/hdr-rgb-00.hdr"))
        img = img.astype(np.float32)
        if img.shape[-1] == 3:
            img = np.concatenate(
                [img, np.ones(img.shape[:-1] + (1,), np.float32)], -1)
        lns = np.asarray(sf.float_to_lns(jnp.asarray(img)))
        unorm = np.clip(img * 65535.0, 0.0, 65535.0)
        data = lns.copy()
        data[..., 3] = unorm[..., 3]  # HDR_RGB_LDR_A alpha stays unorm
        return _blockify2d(data.astype(np.float32), bx, by)
    imgs = _ldr_images()
    if bz > 1:
        vols = [np.stack(imgs[i:i + bz]) for i in
                range(0, len(imgs) - bz + 1, bz)]
        return np.concatenate(
            [_blockify3d(v, bx, by, bz) for v in vols], 0)
    return np.concatenate([_blockify2d(d, bx, by) for d in imgs], 0)


def bench_one(block, quality, kind, reps, chunk):
    import jax
    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.codec import compress as cm

    dims = [int(v) for v in block.split("x")]
    bx, by = dims[0], dims[1]
    bz = dims[2] if len(dims) > 2 else 1
    qual = {"fastest": Quality.FASTEST, "fast": Quality.FAST,
            "medium": Quality.MEDIUM, "thorough": Quality.THOROUGH}[quality]
    profile = Profile.HDR_RGB_LDR_A if kind == "hdr" else Profile.LDR
    cfg = api.config_init(profile, bx, by, bz, qual, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = api._enc_key(ctx.bsd)
    cfgs = cm._CfgStatic(ctx.config)

    tx = load_blocks(kind, bx, by, bz)
    # Full fixed-size chunks from a cyclically-extended block stream
    # (bench.py scheme): every encoded block is real work; distinct
    # buffers per rep so a tunnel can't memoize identical dispatches.
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

    # Decode rate: one corpus image worth of blocks through the decoder.
    w = h = 256
    n_img = (-(-w // bx)) * (-(-h // by))
    d = 6 if bz > 1 else 1
    api.decompress_image(ctx, out_blocks[:n_img], w, h, d, out_type="u8")
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(api.decompress_image(ctx, out_blocks[:n_img],
                                        w, h, d, out_type="u8"))
    dec_dt = (time.perf_counter() - t0) / reps
    n_texels = n_img * tx.shape[1]
    return n_texels_total / enc_dt / 1e6, n_texels / dec_dt / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(DEFAULT_CONFIGS))
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
        parts = spec.split(":")
        block, quality = parts[0], parts[1]
        kind = parts[2] if len(parts) > 2 else (
            "3d" if block.count("x") == 2 else "ldr")
        chunk = args.chunk
        if kind == "3d":
            chunk = min(chunk, 16384)   # T=216: bound the working set
        if kind == "hdr":
            chunk = min(chunk, 32768)   # f32 LNS input, 4x u8 size
        try:
            enc, decr = bench_one(block, quality, kind, args.reps, chunk)
        except Exception as e:  # noqa: BLE001 - record, keep going
            rows.append({"config": spec, "error": f"{type(e).__name__}: {e}"})
            print(json.dumps(rows[-1]), flush=True)
            continue
        base = small_baseline(block, quality,
                              kind) if kind != "3d" else None
        kodak = KODAK_BASELINES.get((block, quality)) \
            if kind == "ldr" else None
        row = {"metric": f"compress_{block}_{quality}"
                         + (f"_{kind}" if kind != "ldr" else "")
                         + "_throughput",
               "value": round(enc, 3), "unit": "Mtexels/s",
               "vs_baseline": round(enc / base, 3) if base else None,
               "baseline_small_mts": round(base, 3) if base else None,
               "vs_kodak_baseline": (round(enc / kodak, 3)
                                     if kodak else None),
               "decode_mts": round(decr, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"matrix": rows,
                       "content": "Small LDR-RGB native-res mosaic "
                                  "(hdr: hdr-rgb-00.hdr; 3d: stacked "
                                  "mosaic volumes)",
                       "baseline": "matched Small-corpus aggregate from "
                                   "astc_reference-5.0-avx2 CSVs "
                                   "(6-thread i5-9600K)",
                       "chunk": args.chunk, "reps": args.reps}, f,
                      indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
