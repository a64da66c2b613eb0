#!/usr/bin/env python3
"""Generate astcenc_tpu/tables/data/percentiles_2d.npz from the oracle dump.

Run tools/build_ref_dump.sh && /tmp/dump_ref_tables /tmp/ref_tables.json first.
"""
import json
import os
import sys

import numpy as np

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_tables.json"
dst = os.path.join(os.path.dirname(__file__), "..", "astcenc_tpu", "tables",
                   "data", "percentiles_2d.npz")

d = json.load(open(src))
arrays = {}
for entry in d["percentiles"]:
    x, y = entry["dim"]
    arrays[f"{x}x{y}"] = np.array(entry["values"], dtype=np.float32)

np.savez_compressed(dst, **arrays)
print(f"wrote {dst} with {len(arrays)} tables")
