#!/usr/bin/env python3
"""Aggregate a JAX profiler trace into a per-op device-time table.

Parses the trace_viewer JSON (plugins/profile/*/  *.trace.json.gz) written
by jax.profiler.trace and sums durations per op name on the device tracks,
grouping fusions by their root op. Companion to tools/tpu_profile.py; the
output is the throughput to-do list (VERDICT r3 next-round item 1).

  python tools/tpu_profile.py ...            # writes /tmp/astc_trace
  python tools/trace_summary.py [--trace /tmp/astc_trace] [--top 40]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_events(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def summarize(events, device_only=True):
    # Identify process ids whose name mentions TPU/device XLA ops.
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def is_device(pid, tid):
        pn = pid_names.get(pid, "")
        tn = tid_names.get((pid, tid), "")
        return ("TPU" in pn or "/device:" in pn or "XLA Ops" in tn
                or "Steps" not in tn and "XLA" in tn)

    total = collections.Counter()
    count = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_only and not is_device(e.get("pid"), e.get("tid")):
            continue
        tn = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" not in tn:
            continue
        name = e.get("name", "?")
        total[name] += e.get("dur", 0)
        count[name] += 1
    return total, count


GROUPS = (
    ("pallas:refine", re.compile(r"trial1_full|trial2_full|refine")),
    ("pallas:msearch", re.compile(r"ms_kernel|mode_search|msearch")),
    ("pallas:psearch", re.compile(r"psearch")),
    ("pallas:gather", re.compile(r"gather.*kernel|row_lookup")),
    ("fusion", re.compile(r"^(loop_)?fusion")),
    ("convert/copy", re.compile(r"^(copy|convert|bitcast|transpose)")),
    ("dot", re.compile(r"^dot")),
    ("dynamic-slice/update", re.compile(r"dynamic")),
)


def group_of(name):
    for g, rx in GROUPS:
        if rx.search(name):
            return g
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="/tmp/astc_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    events = load_events(args.trace)
    total, count = summarize(events)
    if not total:
        total, count = summarize(events, device_only=False)
    gsum = collections.Counter()
    for name, us in total.items():
        gsum[group_of(name)] += us
    all_us = sum(total.values())
    print(f"total device op time: {all_us/1e3:.1f} ms "
          f"({len(total)} distinct ops)")
    print("\n-- by group --")
    for g, us in gsum.most_common():
        print(f"{us/1e3:9.2f} ms  {100*us/all_us:5.1f}%  {g}")
    print(f"\n-- top {args.top} ops --")
    for name, us in total.most_common(args.top):
        print(f"{us/1e3:9.2f} ms  x{count[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
