#!/usr/bin/env python3
"""Host-side blocking profile of the pipelined compaction path.

The per-phase device profile (profile_phases.py) times phases with host
syncs between them, which folds one tunnel round-trip into every number.
This tool answers the complementary question: during a REAL pipelined run,
where does the host thread actually block? Each potentially blocking call
inside CompactRunner (dispatch submissions, mask fetches, result fetches,
uploads) is timed via ASTC_PIPE_TRACE and aggregated here.

If dispatch_* rows dominate, jit submission itself is synchronous-ish over
the tunnel and the fix is fewer dispatches per chunk; if fetch_* rows
dominate, the fix is deeper pipelining / earlier async fetches.

Usage:
  ASTC_CHUNK=32768 python tools/pipe_trace.py --depth 4 --reps 3
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3,
                    help="chunks per timed run = reps * 4")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    os.environ["ASTC_PIPE_TRACE"] = "1"
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ASTC_JAX_CACHE", "/tmp/jax_cache"))

    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.codec import compress as cm
    from astcenc_tpu.codec.trial import build_encoder_tables
    from profile_phases import load_chunk

    cfg = api.config_init(Profile.LDR, 6, 6, 1, Quality.MEDIUM, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = api._enc_key(ctx.bsd)
    cfgs = cm._CfgStatic(ctx.config)
    runner = cm.CompactRunner(ctx._dtables_key, ctx._enc_key, cfgs)

    blocks = load_chunk(args.size, 6, 6, args.chunk)
    t0 = time.perf_counter()
    runner.prewarm(jax.device_put(blocks))
    print(f"prewarm: {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.RandomState(1)
    n_chunks = args.reps * 4
    chs = []
    for _ in range(n_chunks):
        c = blocks.copy()
        c[0, 0, 0] = rng.randint(0, 256)
        chs.append(jax.device_put(c))

    cm.PIPE_TRACE.clear()
    t0 = time.perf_counter()
    for _ in runner.pipeline(iter(chs), args.depth):
        pass
    wall = time.perf_counter() - t0

    agg = {}
    for label, dt in cm.PIPE_TRACE:
        tot, cnt = agg.get(label, (0.0, 0))
        agg[label] = (tot + dt, cnt + 1)
    texels = n_chunks * args.chunk * 36
    out = {
        "config": "6x6 -medium", "chunk": args.chunk, "depth": args.depth,
        "n_chunks": n_chunks, "wall_s": round(wall, 3),
        "mts": round(texels / wall / 1e6, 3),
        "fuse_tail": runner.fuse_tail,
        "host_blocked": {
            k: {"total_ms": round(v[0] * 1e3, 1), "calls": v[1],
                "ms_per_call": round(v[0] * 1e3 / v[1], 2)}
            for k, v in sorted(agg.items(), key=lambda kv: -kv[1][0])},
        "host_blocked_total_ms": round(
            1e3 * sum(v[0] for v in agg.values()), 1),
    }
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
