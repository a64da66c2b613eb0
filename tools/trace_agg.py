#!/usr/bin/env python3
"""Aggregate a jax.profiler trace (trace.json.gz) into a per-op cost table.

Usage: python tools/trace_agg.py [/tmp/astc_trace] [--top 30]

Groups TPU device-track events by a normalized op name (fusion numbers and
pallas call suffixes stripped) and prints total us, % of device time, and
call count — the throughput to-do list. No JAX import (safe to run while
another JAX process owns the TPU tunnel).
"""

import argparse
import collections
import glob
import gzip
import json
import re


def normalize(name: str) -> str:
    n = name.split("/")[-1]
    n = re.sub(r"\.\d+$", "", n)
    n = re.sub(r"\d+$", "", n)
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="/tmp/astc_trace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--raw", action="store_true",
                    help="group by raw event name instead")
    args = ap.parse_args()

    paths = sorted(glob.glob(
        args.trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {args.trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]

    # Device tracks: pid metadata names like "/device:TPU:0" or TensorFlow
    # Name Scope tracks; keep complete events ('X') on TPU pids.
    pid_name = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "tpu" in n or "Device" in n}

    tot = collections.Counter()
    cnt = collections.Counter()
    wall_lo, wall_hi = float("inf"), 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e["name"] if args.raw else normalize(e["name"])
        dur = e.get("dur", 0)
        tot[name] += dur
        cnt[name] += 1
        wall_lo = min(wall_lo, e["ts"])
        wall_hi = max(wall_hi, e["ts"] + dur)

    total = sum(tot.values())
    print(f"device tracks: {sorted(pid_name[p] for p in tpu_pids)}")
    print(f"total device op time: {total/1e3:.1f} ms   "
          f"wall span: {(wall_hi-wall_lo)/1e3:.1f} ms")
    print(f"{'op':55s} {'ms':>9s} {'%':>6s} {'count':>7s}")
    for name, us in tot.most_common(args.top):
        print(f"{name[:55]:55s} {us/1e3:9.2f} {100*us/total:6.1f} "
              f"{cnt[name]:7d}")


if __name__ == "__main__":
    main()
