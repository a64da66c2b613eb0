#!/usr/bin/env python3
"""Map profiler op names (fusion.35, copy.8052, ...) back to JAX source.

Compiles the mono pipeline AOT (hits the persistent compile cache) and
prints, for each requested HLO instruction name, the source metadata of
its root instruction. Companion to tools/trace_summary.py.

  python tools/hlo_names.py fusion.35 fusion.36 copy.8052 ...
  python tools/hlo_names.py --all-fusions   # every fusion with metadata
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--stage", default="mono",
                    choices=["mono", "stage1", "stage2a", "stage2b",
                             "finalize"])
    ap.add_argument("--slice", type=int, default=2048, dest="slice_n")
    ap.add_argument("--all-fusions", action="store_true")
    ap.add_argument("--dump", help="write full HLO text to this path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ASTC_JAX_CACHE", "/tmp/jax_cache"))

    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.codec import compress as cm
    from astcenc_tpu.codec.trial import build_encoder_tables

    cfg = api.config_init(Profile.LDR, 6, 6, 1, Quality.MEDIUM, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = api._enc_key(ctx.bsd)
    cfgs = cm._CfgStatic(ctx.config)
    N = args.chunk
    T = ctx.bsd.texel_count
    tex_u8 = jnp.zeros((N, T, 4), jnp.uint8)

    if args.stage == "mono":
        lowered = cm.compress_symbolic_batch_mono_u8.lower(
            ctx._dtables_key, ctx._enc_key, cfgs, tex_u8)
    elif args.stage == "stage1":
        lowered = cm._c_stage1_jit.lower(ctx._dtables_key, ctx._enc_key,
                                         cfgs, tex_u8)
    else:
        scb, aux = jax.eval_shape(
            lambda t: cm._c_stage1_jit(ctx._dtables_key, ctx._enc_key,
                                       cfgs, t), tex_u8)
        scb = {k: jnp.zeros(v.shape, v.dtype) for k, v in scb.items()}
        ql = jnp.zeros((N,), jnp.int32)
        b0 = jnp.zeros((N,), jnp.float32)
        idx = jnp.zeros((args.slice_n,), jnp.int32)
        if args.stage == "stage2a":
            lowered = cm._c_stage2a_jit.lower(ctx._enc_key, cfgs, tex_u8,
                                              scb, ql, b0, idx)
        elif args.stage == "stage2b":
            lowered = cm._c_stage2b_jit.lower(ctx._enc_key, cfgs, tex_u8,
                                              scb, ql, b0, idx)
        else:
            auxz = {k: jnp.zeros(v.shape, v.dtype) for k, v in aux.items()}
            lowered = cm._c_finalize_jit.lower(ctx._dtables_key,
                                               ctx._enc_key, cfgs, scb, auxz)

    txt = lowered.compile().as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(txt)
        print(f"wrote {len(txt)} bytes to {args.dump}")

    want = set(args.names)
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", line)
        if not m:
            continue
        name = m.group(1)
        if name in want or (args.all_fusions and name.startswith("fusion")):
            meta = re.search(r'metadata=\{([^}]*)\}', line)
            kind = re.search(r'= \S+ (\w+)\(', line)
            print(f"{name}: {kind.group(1) if kind else '?'} :: "
                  f"{meta.group(1)[:400] if meta else 'no-metadata'}")


if __name__ == "__main__":
    main()
