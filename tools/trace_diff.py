#!/usr/bin/env python3
"""Diff two encoder diagnostic traces (block/pass/candidate trees).

The parity-debugging workflow behind round-1's encoder fixes, now
committed (VERDICT r1 item 7): encode the same image with

  1. this encoder:      astcenc-tpu -cl in.png out.astc 6x6 -medium \
                            -dtrace ours.json
  2. a diagnostics build of the reference
     (cmake -DASTCENC_DIAGNOSTICS=ON):
                        astcenc -cl in.png out.astc 6x6 -medium \
                            -dtrace ref.json -j 1

then `python tools/trace_diff.py ours.json ref.json` reports, per block,
the first pass/candidate where the two encoders diverge (different pass
structure, different candidate mode shape, or errors apart by more than
--rtol), plus a summary count.

Both files use the reference's trace schema
(astcenc_diagnostic_trace.h:17-115); ours is written by
astcenc_tpu.codec.trace.Tracer.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from astcenc_tpu.codec.trace import parse_trace  # noqa: E402


def block_key(attrs):
    return (attrs.get("pos_x", 0), attrs.get("pos_y", 0),
            attrs.get("pos_z", 0))


def pass_sig(attrs):
    return (attrs.get("partition_count"), attrs.get("plane_count"),
            attrs.get("plane_component"), attrs.get("partition_index"))


def cand_sig(attrs):
    return (attrs.get("weight_x"), attrs.get("weight_y"),
            attrs.get("weight_z"), attrs.get("weight_quant"))


def _errs(attrs):
    out = []
    for k in ("error_prerealign", "error_postrealign"):
        v = attrs.get(k)
        if v is None:
            continue
        out += [float(x) for x in (v if isinstance(v, list) else [v])]
    return out


def diff_block(b1, b2, rtol):
    """First divergence inside one block; None if equivalent."""
    passes1 = [c for c in b1[2] if c[0] == "pass"]
    passes2 = [c for c in b2[2] if c[0] == "pass"]
    for pi, (p1, p2) in enumerate(zip(passes1, passes2)):
        s1, s2 = pass_sig(p1[1]), pass_sig(p2[1])
        if s1 != s2:
            return f"pass {pi}: signature {s1} vs {s2}"
        c1 = [c for c in p1[2] if c[0] == "candidate"]
        c2 = [c for c in p2[2] if c[0] == "candidate"]
        for ci, (a, b) in enumerate(zip(c1, c2)):
            if cand_sig(a[1]) != cand_sig(b[1]):
                return (f"pass {pi} cand {ci}: mode "
                        f"{cand_sig(a[1])} vs {cand_sig(b[1])}")
            e1, e2 = _errs(a[1]), _errs(b[1])
            for ei, (x, y) in enumerate(zip(e1, e2)):
                ref = max(abs(x), abs(y), 1.0)
                if abs(x - y) / ref > rtol:
                    return (f"pass {pi} cand {ci} err[{ei}]: "
                            f"{x:g} vs {y:g}")
        if len(c1) != len(c2):
            return f"pass {pi}: candidate count {len(c1)} vs {len(c2)}"
    if len(passes1) != len(passes2):
        return f"pass count {len(passes1)} vs {len(passes2)}"
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("ref")
    ap.add_argument("--rtol", type=float, default=1e-3)
    ap.add_argument("--limit", type=int, default=20,
                    help="max diverging blocks to print")
    args = ap.parse_args()

    t1 = parse_trace(args.ours)
    t2 = parse_trace(args.ref)
    blocks1 = {block_key(b[1]): b for b in t1[2] if b[0] == "block"}
    blocks2 = {block_key(b[1]): b for b in t2[2] if b[0] == "block"}

    keys = sorted(set(blocks1) & set(blocks2))
    missing = sorted(set(blocks1) ^ set(blocks2))
    ndiv = 0
    for k in keys:
        d = diff_block(blocks1[k], blocks2[k], args.rtol)
        if d:
            ndiv += 1
            if ndiv <= args.limit:
                print(f"block {k}: {d}")
    print(f"\n{len(keys)} blocks compared, {ndiv} diverge"
          f" ({len(missing)} unmatched positions)")
    return 1 if ndiv or missing else 0


if __name__ == "__main__":
    sys.exit(main())
