#!/usr/bin/env python3
"""Aggregate a jax.profiler trace into a per-op device-time table.

Reads the newest *.trace.json.gz under the trace dir written by
`jax.profiler.trace()` (tools/tpu_profile.py), keeps only events on the
device compute tracks, and prints total microseconds grouped by fusion/op
name. This is the concrete "where do the milliseconds go" artifact the
throughput campaign works off.

Usage:
  python tools/trace_ops.py [--dir /tmp/astc_trace] [--top 40] [--json OUT]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def newest_trace(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    return max(paths, key=os.path.getmtime)


_CANON = re.compile(r"\.\d+$")


def canon(name):
    """Collapse numbered clones (fusion.123 -> fusion) of one program op."""
    return _CANON.sub("", name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/astc_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--json", default="")
    ap.add_argument("--raw", action="store_true",
                    help="don't collapse numbered op clones")
    args = ap.parse_args()

    path = newest_trace(args.dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    # Map pid -> process name so we can keep device tracks only.
    pid_name = {}
    tid_name = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pid_name[ev["pid"]] = ev["args"].get("name", "")
            elif ev.get("name") == "thread_name":
                tid_name[(ev["pid"], ev.get("tid"))] = \
                    ev["args"].get("name", "")

    device_pids = {pid for pid, name in pid_name.items()
                   if ("TPU" in name or "/device" in name.lower()
                       or "Device" in name) and "CPU" not in name}

    per_op = collections.Counter()
    per_op_n = collections.Counter()
    total_us = 0.0
    span_lo, span_hi = float("inf"), 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        tname = tid_name.get((ev["pid"], ev.get("tid")), "")
        # Keep compute steps; skip host-side and derived "Steps" tracks.
        if "step" in tname.lower():
            continue
        dur = float(ev.get("dur", 0.0))
        name = ev.get("name", "?")
        if not args.raw:
            name = canon(name)
        per_op[name] += dur
        per_op_n[name] += 1
        total_us += dur
        ts = float(ev.get("ts", 0.0))
        span_lo = min(span_lo, ts)
        span_hi = max(span_hi, ts + dur)

    if not per_op:
        tracks = sorted({(pid_name.get(p, "?"),
                          tid_name.get((p, t), "?"))
                         for p, t in tid_name})
        raise SystemExit(
            "no device events matched; available tracks:\n  "
            + "\n  ".join(str(t) for t in tracks))

    span_ms = (span_hi - span_lo) / 1e3
    print(f"trace: {path}")
    print(f"device busy: {total_us/1e3:.2f} ms over {span_ms:.2f} ms span "
          f"({100*total_us/1e3/max(span_ms,1e-9):.0f}% occupancy)")
    print(f"{'op':<64} {'ms':>9} {'count':>7} {'%':>6}")
    rows = []
    for name, us in per_op.most_common(args.top):
        rows.append({"op": name, "ms": round(us / 1e3, 3),
                     "count": per_op_n[name],
                     "pct": round(100 * us / total_us, 2)})
        print(f"{name[:64]:<64} {us/1e3:>9.2f} {per_op_n[name]:>7} "
              f"{100*us/total_us:>5.1f}%")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"trace": path, "device_busy_ms": total_us / 1e3,
                       "span_ms": span_ms, "ops": rows}, f, indent=2)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
