#!/usr/bin/env python3
"""Benchmark: ASTC compression throughput at 6x6 -medium (BASELINE.json).

Prints one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "degraded": bool, "disabled_kernels": "..."}

Baseline: reference astcenc-avx2 Kodak 6x6 -medium = 9.48 MT/s on a 6-core
i5-9600K (BASELINE.md). Run on whatever jax.devices() provides (one TPU chip
under the driver; CPU with JAX_PLATFORMS=cpu).

Structure:
  1. Kernel compile gate: the warmup dispatch compiles every Pallas kernel
     family with the real Mosaic compiler (this is the gate that round 2
     lacked — interpret-mode tests cannot catch hardware-only Mosaic
     rejections).
  2. Fallback ladder, one kernel family at a time, so a single broken
     family costs only that family's speedup — never the whole kernel set.
  3. Pipelined dispatch: keep ASTC_PIPELINE chunks in flight so the device
     never idles waiting on the host fetch of the previous chunk.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

# Matched baseline: aggregate whole-corpus rate of the reference
# (astcenc 5.0 AVX2, 6-thread i5-9600K) on the SAME images the bench
# encodes — the Small LDR-RGB set at 6x6 -medium, from the committed
# result CSV. (The earlier 9.48 MT/s figure is the Kodak-set average:
# different, easier content, kept in BASELINE.md for context.)
def _baseline_mts():
    import csv
    path = ("/root/reference/Test/Images/Small/"
            "astc_reference-5.0-avx2_medium_results.csv")
    if not os.path.exists(path):
        return 9.48  # fall back to the BASELINE.md Kodak figure
    tot_tex, tot_s = 0.0, 0.0
    for r in csv.DictReader(open(path)):
        if r["Block Size"] != "6x6" or not r["Name"].startswith("ldr-rgb-"):
            continue
        rate = float(r["Coding Rate"])
        tot_tex += 256 * 256
        tot_s += 256 * 256 / (rate * 1e6)
    return tot_tex / tot_s / 1e6

# One-family-at-a-time fallback tiers (VERDICT r2 weak #4): each tier
# disables the family most likely to be the culprit next, so a compile
# failure degrades minimally instead of falling off a cliff.
FALLBACK_TIERS = (
    "",
    "refine",
    "msearch",
    "refine,msearch",
    "refine,msearch,psearch",
    "refine,msearch,psearch,gather",
)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ASTC_JAX_CACHE", "/tmp/jax_cache"))

    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.codec import compress as compress_mod

    block = (6, 6)
    quality = Quality.MEDIUM

    # Input: a native-resolution mosaic of the reference Small corpus (the
    # honest content mix — upscaling smooths content and flatters the
    # early-exit economics); synthetic texture data as fallback.
    src_dir = "/root/reference/Test/Images/Small/LDR-RGB"
    if os.path.isdir(src_dir):
        from PIL import Image
        imgs = [np.asarray(Image.open(os.path.join(src_dir, f)).convert(
            "RGBA")) for f in sorted(os.listdir(src_dir))
            if f.endswith(".png")]
    else:
        rng = np.random.RandomState(0)
        base = rng.randint(0, 255, (128, 128, 4), np.uint8)
        data = np.kron(base, np.ones((8, 8, 1), np.uint8))
        data[..., 3] = 255
        imgs = [data]

    cfg = api.config_init(Profile.LDR, block[0], block[1], 1, quality, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = api._enc_key(ctx.bsd)
    cfgs = compress_mod._CfgStatic(ctx.config)

    # Pre-blocked input so we time the pure codec step. Blocks stay uint8
    # on the host; the mono-u8 entry promotes on device (4x less tunnel
    # transfer per chunk).
    texels_np = np.concatenate([_blockify_u8(d, block) for d in imgs], 0)

    chunk = int(os.environ.get("ASTC_CHUNK", "65536"))
    reps = int(os.environ.get("ASTC_BENCH_REPS", "10"))
    # One block stream of reps copies sliced into fixed-size chunks, so
    # chunks stay full (the per-dispatch fixed cost amortizes over real
    # blocks); only the final chunk carries padding. Distinct buffers per
    # rep — a repeated identical dispatch can be memoized by the device
    # tunnel and report fantasy throughput.
    rng = np.random.RandomState(1)
    stream = []
    for r in range(reps):
        c = texels_np.copy()
        c[0, 0, 0] = rng.randint(0, 256)
        stream.append(c)
    stream = np.concatenate(stream, 0)
    pad = (-stream.shape[0]) % chunk
    if pad:
        # Fill the tail chunk with more real image blocks (cyclic), not
        # sentinel padding: every encoded block then counts as work.
        stream = np.concatenate([stream, stream[:pad]], 0)
    n_texels_total = stream.shape[0] * texels_np.shape[1]
    all_chunks = [jax.device_put(stream[i:i + chunk])
                  for i in range(0, stream.shape[0], chunk)]

    use_compact = os.environ.get("ASTC_BENCH_MODE", "compact") == "compact"
    runner = compress_mod.CompactRunner(ctx._dtables_key, ctx._enc_key, cfgs)
    mono = compress_mod.compress_symbolic_batch_mono_u8

    def run_warm(ch):
        if use_compact:
            # Compiles every (stage, slice-width) the compacted schedule
            # can dispatch, not just the widths chunk 0 happens to need —
            # a mid-timing XLA compile would corrupt the measurement.
            runner.prewarm(ch)
            return runner.run(ch)
        return np.asarray(mono(ctx._dtables_key, ctx._enc_key, cfgs, ch))

    # Kernel compile gate + fallback ladder. The warmup dispatch forces
    # Mosaic compilation of every Pallas kernel family; fetch to host — on
    # tunneled backends block_until_ready can return before execution ends.
    disabled = None
    for fallback in FALLBACK_TIERS:
        if fallback:
            print(f"bench: retrying with ASTC_DISABLE_KERNELS={fallback}",
                  file=sys.stderr)
            os.environ["ASTC_DISABLE_KERNELS"] = fallback
            jax.clear_caches()
        try:
            run_warm(all_chunks[0])
            disabled = fallback
            break
        except Exception as e:      # noqa: BLE001 - any compile/run error
            print(f"bench: warmup failed ({type(e).__name__}: {e})",
                  file=sys.stderr)
    if disabled is None:
        raise SystemExit("bench: all kernel fallbacks failed")

    # Pipelined dispatch: keep `depth` chunks in flight so the device never
    # idles on host fetches. Compact mode: stage1 of chunk i+1 overlaps the
    # mask round-trip + compacted tail of chunk i.
    depth = max(1, int(os.environ.get("ASTC_PIPELINE", "4")))
    t0 = time.perf_counter()
    if use_compact:
        for _ in runner.pipeline(iter(all_chunks), depth):
            if os.environ.get("ASTC_BENCH_VERBOSE"):
                print(f"chunk done: {time.perf_counter()-t0:.3f}s",
                      flush=True)
    else:
        pending = []
        for ch in all_chunks:
            ti = time.perf_counter()
            pending.append(mono(ctx._dtables_key, ctx._enc_key, cfgs, ch))
            if len(pending) >= depth:
                np.asarray(pending.pop(0))
            if os.environ.get("ASTC_BENCH_VERBOSE"):
                print(f"iter: {time.perf_counter()-ti:.3f}s", flush=True)
        for p in pending:
            np.asarray(p)
    dt = time.perf_counter() - t0

    mts = n_texels_total / dt / 1e6
    baseline = _baseline_mts()
    out = {
        "metric": "compress_6x6_medium_throughput",
        "value": round(mts, 3),
        "unit": "Mtexels/s",
        "vs_baseline": round(mts / baseline, 3),
        "baseline_mts": round(baseline, 3),
        "baseline": "astcenc-5.0-avx2 6T, same Small LDR-RGB corpus",
    }
    if disabled:
        # Explicit failure signal for pipelines keying on this artifact
        # (a fallback-ladder completion is a degraded run, not a success).
        out["degraded"] = True
        out["disabled_kernels"] = disabled
    print(json.dumps(out))


def _blockify_u8(data, block):
    bx, by = block
    H, W, _ = data.shape
    nx = (W + bx - 1) // bx
    ny = (H + by - 1) // by
    idx_x = np.minimum(np.arange(nx * bx), W - 1)
    idx_y = np.minimum(np.arange(ny * by), H - 1)
    padded = data[np.ix_(idx_y, idx_x)].astype(np.uint8)
    blocks = padded.reshape(ny, by, nx, bx, 4).transpose(0, 2, 1, 3, 4)
    return blocks.reshape(ny * nx, by * bx, 4)


if __name__ == "__main__":
    main()
