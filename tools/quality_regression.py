#!/usr/bin/env python3
"""Quality regression harness: per-image PSNR CSVs vs the reference.

Mirrors the shape of the reference's release gate
(reference: Test/astc_test_image.py:44-47 + Test/testlib/encoder.py:121-219):
encode a corpus at every (block size x preset), measure decoded PSNR, and
emit a CSV in the reference's schema
  Image Set,Block Size,Name,PSNR,Total Time,Coding Time,Coding Rate
so rows are directly comparable against the committed reference result
CSVs (e.g. Test/Images/Small/astc_reference-5.0-avx2_*_results.csv).

Decode goes through the REFERENCE binary when present (the strongest
cross-check: our physical stream, their decoder), else our own decoder
(bit-exact per tests/test_decode.py).

Usage:
  python tools/quality_regression.py run  --out results/astcenc_tpu_small
  python tools/quality_regression.py gate --ours results/..._medium_results.csv \
      --ref /root/reference/Test/Images/Small/astc_reference-5.0-avx2_medium_results.csv \
      --tol 0.05

The gate compares matching (Block Size, Name) rows and fails on any image
more than `tol` dB below the reference (BASELINE.json contract).
"""

import argparse
import csv
import os
import struct
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF_BIN = os.environ.get("ASTC_REF_BIN", "/tmp/refbuild/Source/astcenc-native")
DEFAULT_IMAGES = "/root/reference/Test/Images/Small/LDR-RGB"
BLOCKS = [(4, 4), (5, 5), (6, 6), (8, 8), (12, 12)]
PRESETS = ["fastest", "fast", "medium", "thorough"]


def astc_header(bx, by, bz, dx, dy, dz):
    return (struct.pack("<I3B", 0x5CA1AB13, bx, by, bz)
            + dx.to_bytes(3, "little") + dy.to_bytes(3, "little")
            + dz.to_bytes(3, "little"))


QUALITY_OF = {"fastest": "FASTEST", "fast": "FAST", "medium": "MEDIUM",
              "thorough": "THOROUGH", "verythorough": "VERYTHOROUGH",
              "exhaustive": "EXHAUSTIVE"}


def encode_image(img, bx, by, preset):
    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    q = getattr(Quality, QUALITY_OF[preset])
    cfg = api.config_init(Profile.LDR, bx, by, 1, q, 0)
    ctx = api.context_alloc(cfg)
    t0 = time.perf_counter()
    blob = api.compress_image(ctx, img)
    dt = time.perf_counter() - t0
    return ctx, bytes(blob), dt


def decode_blob(ctx, blob, bx, by, w, h):
    """Decode via the reference binary if available, else our decoder."""
    from PIL import Image
    if os.path.exists(REF_BIN):
        with tempfile.TemporaryDirectory() as td:
            astc = os.path.join(td, "x.astc")
            png = os.path.join(td, "x.png")
            with open(astc, "wb") as f:
                f.write(astc_header(bx, by, 1, w, h, 1) + blob)
            r = subprocess.run([REF_BIN, "-dl", astc, png, "-j", "1"],
                               capture_output=True, timeout=300)
            if r.returncode == 0:
                return np.asarray(Image.open(png).convert("RGBA")), "ref"
    from astcenc_tpu import api
    return np.asarray(api.decompress_image(ctx, np.frombuffer(blob, np.uint8),
                                           w, h, 1)), "own"


def ref_row(img_path, bx, by, preset, set_name):
    """Reference-binary row for presets without committed result CSVs
    (-verythorough/-exhaustive): encode + decode with the reference binary,
    PSNR through the same metric code our rows use."""
    from PIL import Image
    import numpy as np
    from astcenc_tpu.utils import metrics
    with tempfile.TemporaryDirectory() as td:
        astc = os.path.join(td, "x.astc")
        png = os.path.join(td, "x.png")
        t0 = time.perf_counter()
        r = subprocess.run([REF_BIN, "-cl", img_path, astc,
                            f"{bx}x{by}", "-" + preset, "-silent"],
                           capture_output=True, timeout=1800)
        enc_dt = time.perf_counter() - t0
        if r.returncode != 0:
            raise RuntimeError(r.stderr.decode()[:400])
        subprocess.run([REF_BIN, "-dl", astc, png], check=True,
                       capture_output=True, timeout=300)
        src = np.asarray(Image.open(img_path).convert("RGBA"))
        dec = np.asarray(Image.open(png).convert("RGBA"))
    h, w = src.shape[:2]
    psnr = metrics.psnr(src, dec)
    rate = w * h / enc_dt / 1e6
    return [set_name, f"{bx}x{by}", os.path.basename(img_path),
            f"{psnr:.4f}", f"{enc_dt:.4f}", f"{enc_dt:.4f}",
            f"{rate:.4f}"]


def refrun(args):
    """Write reference-binary result CSVs (same schema) for presets that
    have no committed reference CSVs."""
    images = sorted(f for f in os.listdir(args.images)
                    if f.lower().endswith((".png", ".tga", ".bmp")))
    if args.limit:
        images = images[:args.limit]
    blocks = ([tuple(int(v) for v in b.split("x")) for b in
               args.blocks.split(",")] if args.blocks else BLOCKS)
    presets = args.presets.split(",") if args.presets else PRESETS
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for preset in presets:
        path = f"{args.out}_{preset}_results.csv"
        with open(path, "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(["Image Set", "Block Size", "Name", "PSNR",
                         "Total Time", "Coding Time", "Coding Rate"])
            for bx, by in blocks:
                for name in images:
                    row = ref_row(os.path.join(args.images, name), bx, by,
                                  preset, args.set_name)
                    wr.writerow(row)
                    print(f"ref {preset} {bx}x{by} {name}: {row[3]} dB",
                          flush=True)
        print("wrote", path)


def run(args):
    from PIL import Image
    from astcenc_tpu.utils import metrics

    images = sorted(f for f in os.listdir(args.images)
                    if f.lower().endswith((".png", ".tga", ".bmp")))
    if args.limit:
        images = images[:args.limit]
    blocks = ([tuple(int(v) for v in b.split("x")) for b in
               args.blocks.split(",")] if args.blocks else BLOCKS)
    presets = args.presets.split(",") if args.presets else PRESETS

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for preset in presets:
        path = f"{args.out}_{preset}_results.csv"
        with open(path, "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(["Image Set", "Block Size", "Name", "PSNR",
                         "Total Time", "Coding Time", "Coding Rate"])
            for bx, by in blocks:
                for name in images:
                    img = np.asarray(Image.open(
                        os.path.join(args.images, name)).convert("RGBA"))
                    h, w = img.shape[:2]
                    try:
                        t0 = time.perf_counter()
                        ctx, blob, enc_dt = encode_image(img, bx, by, preset)
                        total_dt = time.perf_counter() - t0
                        dec, how = decode_blob(ctx, blob, bx, by, w, h)
                        psnr = metrics.psnr(img, dec)
                    except Exception as e:  # noqa: BLE001 - keep the run
                        # Loud failure row (PSNR -1 always trips the gate)
                        # instead of killing the remaining configs.
                        print(f"{preset} {bx}x{by} {name}: FAILED "
                              f"{type(e).__name__}: {str(e)[:200]}",
                              flush=True)
                        wr.writerow([args.set_name, f"{bx}x{by}", name,
                                     "-1.0", "0", "0", "0"])
                        f.flush()
                        continue
                    rate = w * h / enc_dt / 1e6
                    wr.writerow([args.set_name, f"{bx}x{by}", name,
                                 f"{psnr:.4f}", f"{total_dt:.4f}",
                                 f"{enc_dt:.4f}", f"{rate:.4f}"])
                    f.flush()
                    print(f"{preset} {bx}x{by} {name}: {psnr:.4f} dB "
                          f"({rate:.2f} MT/s, decode={how})", flush=True)
        print("wrote", path)


def load_rows(path):
    rows = {}
    with open(path) as f:
        for r in csv.DictReader(f):
            rows[(r["Block Size"], r["Name"])] = float(r["PSNR"])
    return rows


def gate(args):
    ours = load_rows(args.ours)
    ref = load_rows(args.ref)
    bad = []
    matched = 0
    for k, psnr in sorted(ours.items()):
        if k not in ref:
            continue
        matched += 1
        delta = psnr - ref[k]
        flag = " REGRESSION" if delta < -args.tol else ""
        print(f"{k[0]:>6} {k[1]:<20} ours {psnr:8.4f}  ref {ref[k]:8.4f} "
              f" delta {delta:+7.4f}{flag}")
        if delta < -args.tol:
            bad.append((k, delta))
    print(f"\n{matched} rows compared, {len(bad)} regressions "
          f"(tolerance {args.tol} dB)")
    return 1 if bad or matched == 0 else 0


def summarize(args):
    """Aggregate the per-preset comparisons into the committed artifact
    (QUALITY_rNN.json): per preset, rows compared, regressions at tol,
    worst/best delta, mean delta."""
    import json
    report = {"tolerance_db": args.tol, "presets": {}}
    ok = True
    for pair in args.pairs:
        preset, ours_csv, ref_csv = pair.split(":")
        ours = load_rows(ours_csv)
        ref = load_rows(ref_csv)
        deltas = {k: ours[k] - ref[k] for k in ours if k in ref}
        if not deltas:
            report["presets"][preset] = {"rows": 0, "error": "no overlap"}
            ok = False
            continue
        regress = {f"{k[0]}/{k[1]}": round(d, 4)
                   for k, d in deltas.items() if d < -args.tol}
        vals = list(deltas.values())
        report["presets"][preset] = {
            "rows": len(vals),
            "regressions": len(regress),
            "regressed_rows": regress,
            "worst_delta_db": round(min(vals), 4),
            "best_delta_db": round(max(vals), 4),
            "mean_delta_db": round(sum(vals) / len(vals), 4),
            "rows_beating_reference": sum(1 for v in vals if v > 0),
        }
        if regress:
            ok = False
    report["pass"] = ok
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print("wrote", args.out)
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for cmd in ("run", "refrun"):
        r = sub.add_parser(cmd)
        r.add_argument("--images", default=DEFAULT_IMAGES)
        r.add_argument("--out", default="results/astcenc_tpu_small")
        r.add_argument("--set-name", default="Small")
        r.add_argument("--blocks", default="")
        r.add_argument("--presets", default="")
        r.add_argument("--limit", type=int, default=0)
    g = sub.add_parser("gate")
    g.add_argument("--ours", required=True)
    g.add_argument("--ref", required=True)
    g.add_argument("--tol", type=float, default=0.05)
    sm = sub.add_parser("summarize")
    sm.add_argument("pairs", nargs="+",
                    help="preset:ours.csv:ref.csv triples")
    sm.add_argument("--tol", type=float, default=0.05)
    sm.add_argument("--out", default="QUALITY.json")
    args = ap.parse_args()
    if args.cmd == "run":
        run(args)
        return 0
    if args.cmd == "refrun":
        refrun(args)
        return 0
    if args.cmd == "summarize":
        return summarize(args)
    return gate(args)


if __name__ == "__main__":
    sys.exit(main())
