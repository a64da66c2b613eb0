#!/usr/bin/env python3
"""Continuous differential fuzzers for the TPU codec.

The batched analog of the reference's libFuzzer targets
(Source/Fuzzers/fuzz_astc_physical_to_symbolic.cpp, fuzz_astc_compress.cpp,
fuzz_astc_decompress.cpp): random and mutated inputs are driven through the
decode / encode / container surfaces in large batches; any crash, NaN leak,
or (when the reference binary is available) decode divergence is a finding.

Targets:
  decode     random 128-bit blocks -> decompress_image; differential vs the
             reference binary when ASTC_REF_BIN is set (illegal encodings
             must produce the spec error color, never crash).
  encode     random/structured images -> compress -> our decode must be
             bit-identical to the reference binary's decode of our stream.
  container  bit-flipped .astc/KTX/DDS headers -> loader must raise a clean
             error, never crash or hang.

Usage:
  python tools/fuzz_astc.py decode --blocks 4x4,6x6,12x12 --iters 50
  ASTC_REF_BIN=/tmp/refbuild/Source/astcenc-native \\
      python tools/fuzz_astc.py all --iters 10
"""

from __future__ import annotations

import argparse
import os
import struct
import subprocess
import sys
import tempfile
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from astcenc_tpu import api                      # noqa: E402
from astcenc_tpu.config import Profile, Quality  # noqa: E402
from astcenc_tpu.io import astc_file             # noqa: E402
from astcenc_tpu.io import image_io              # noqa: E402

REF_BIN = os.environ.get("ASTC_REF_BIN", "/tmp/refbuild/Source/astcenc-native")


def _ref_available():
    return os.path.exists(REF_BIN)


def _ref_decode(blocks, bx, by, w, h, tmpdir):
    astc = os.path.join(tmpdir, "f.astc")
    png = os.path.join(tmpdir, "f.png")
    astc_file.write_astc(astc, (bx, by, 1), (w, h, 1), blocks)
    subprocess.run([REF_BIN, "-dl", astc, png, "-silent"],
                   check=True, capture_output=True, timeout=120)
    return np.asarray(image_io.load_image(png)[0])


def fuzz_decode(blocks_list, iters, seed):
    rng = np.random.RandomState(seed)
    findings = 0
    for it in range(iters):
        for bs in blocks_list:
            bx, by = (int(v) for v in bs.split("x"))
            n = 2048
            raw = rng.randint(0, 256, (n, 16), dtype=np.uint8)
            # Mutation pool: half random, half structured (valid-ish mode
            # fields with corrupted payloads reach deeper decode paths).
            raw[n // 2:, 0:2] = rng.randint(0, 256, (n // 2, 2),
                                            dtype=np.uint8)
            nx = 64
            ny = (n + nx - 1) // nx
            w, h = nx * bx, ny * by
            pad = np.zeros((nx * ny, 16), np.uint8)
            pad[:n] = raw
            cfg = api.config_init(Profile.LDR, bx, by, 1, Quality.MEDIUM, 0)
            ctx = api.context_alloc(cfg)
            try:
                ours = api.decompress_image(ctx, pad, w, h, 1,
                                            out_type="u8")[0]
            except Exception:
                print(f"[decode] CRASH at iter {it} block {bs}")
                traceback.print_exc()
                np.save(f"fuzz_decode_crash_{bs}_{it}.npy", raw)
                findings += 1
                continue
            ours = np.asarray(ours)
            if _ref_available():
                with tempfile.TemporaryDirectory() as td:
                    ref = _ref_decode(pad, bx, by, w, h, td)
                if not np.array_equal(ours, ref):
                    bad = int(np.sum(np.any(ours != ref, axis=-1)))
                    print(f"[decode] DIVERGENCE iter {it} {bs}: "
                          f"{bad} texels differ")
                    np.save(f"fuzz_decode_div_{bs}_{it}.npy", raw)
                    findings += 1
        print(f"[decode] iter {it} ok", flush=True)
    return findings


def fuzz_encode(blocks_list, iters, seed):
    rng = np.random.RandomState(seed + 1)
    findings = 0
    for it in range(iters):
        for bs in blocks_list:
            bx, by = (int(v) for v in bs.split("x"))
            w = h = 96
            kind = it % 3
            if kind == 0:
                img = rng.randint(0, 256, (h, w, 4), np.uint8)
            elif kind == 1:   # flat + edges (const-block and clamp paths)
                img = np.full((h, w, 4), rng.randint(0, 256), np.uint8)
                img[:: by, :] = rng.randint(0, 256, 4)
            else:             # gradients (delta-format paths)
                gx = np.linspace(0, 255, w, dtype=np.uint8)
                img = np.stack([np.tile(gx, (h, 1))] * 4, -1)
            img[..., 3] = 255
            cfg = api.config_init(Profile.LDR, bx, by, 1, Quality.FASTEST, 0)
            ctx = api.context_alloc(cfg)
            try:
                blocks = np.asarray(api.compress_image(ctx, img[None]))
                ours = np.asarray(
                    api.decompress_image(ctx, blocks, w, h, 1,
                                         out_type="u8")[0])
            except Exception:
                print(f"[encode] CRASH at iter {it} block {bs} kind {kind}")
                traceback.print_exc()
                np.save(f"fuzz_encode_crash_{bs}_{it}.npy", img)
                findings += 1
                continue
            if _ref_available():
                with tempfile.TemporaryDirectory() as td:
                    ref = _ref_decode(blocks, bx, by, w, h, td)
                if not np.array_equal(ours, ref):
                    print(f"[encode] SELF/REF DECODE MISMATCH iter {it} "
                          f"{bs} kind {kind}")
                    np.save(f"fuzz_encode_div_{bs}_{it}.npy", img)
                    findings += 1
        print(f"[encode] iter {it} ok", flush=True)
    return findings


_CORPUS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "data", "fuzz")


def _clean_load(path):
    """Load a container; return None on a clean typed failure, or the
    exception on an unclean one (corpus and bit-flip fuzz share this
    contract: malformed input must raise, never crash or hang)."""
    from astcenc_tpu.io import ktx as ktx_io
    from astcenc_tpu.io import dds as dds_io
    try:
        if path.endswith(".astc"):
            astc_file.read_astc(path)
        elif path.endswith((".ktx", ".KTX")):
            ktx_io.read_ktx(path)
        elif path.endswith((".dds", ".DDS")):
            dds_io.read_dds(path)
        else:
            image_io.load_image(path)
    except Exception as e:                       # noqa: BLE001
        if type(e).__module__.startswith("astcenc_tpu") or isinstance(
                e, (ValueError, OSError, KeyError, EOFError,
                    NotImplementedError, struct.error)):
            return None
        return e
    return None


def fuzz_corpus():
    """Committed malformed-container corpus (tests/data/fuzz): every file
    must fail cleanly (reference analog: Test/Data corpora for the
    OSS-Fuzz targets, Source/Fuzzers/)."""
    findings = 0
    names = (sorted(os.listdir(_CORPUS_DIR))
             if os.path.isdir(_CORPUS_DIR) else [])
    for name in names:
        e = _clean_load(os.path.join(_CORPUS_DIR, name))
        if e is not None:
            print(f"[corpus] UNCLEAN ERROR on {name}: {type(e).__name__}")
            findings += 1
    print(f"[corpus] {len(names)} files ok", flush=True)
    return findings


def fuzz_container(iters, seed, time_budget=None):
    import time as _time
    rng = np.random.RandomState(seed + 2)
    findings = 0
    with tempfile.NamedTemporaryFile(suffix=".astc", delete=False) as f:
        base_path = f.name
    astc_file.write_astc(base_path, (6, 6, 1), (12, 12, 1),
                         np.zeros((4, 16), np.uint8))
    base = open(base_path, "rb").read()
    os.unlink(base_path)
    t0 = _time.time()
    for it in range(iters):
        for _ in range(256):
            buf = bytearray(base)
            nflip = rng.randint(1, 6)
            for _ in range(nflip):
                buf[rng.randint(0, len(buf))] ^= 1 << rng.randint(0, 8)
            with tempfile.NamedTemporaryFile(suffix=".astc",
                                             delete=False) as f:
                f.write(bytes(buf))
                path = f.name
            try:
                e = _clean_load(path)
                if e is not None:
                    print(f"[container] UNCLEAN ERROR {type(e)}")
                    findings += 1
            finally:
                os.unlink(path)
        print(f"[container] iter {it} ok", flush=True)
        if time_budget and _time.time() - t0 > time_budget:
            break
    return findings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("target", nargs="?", default="gate",
                    choices=["decode", "encode", "container", "corpus",
                             "gate", "all"])
    ap.add_argument("--blocks", default="4x4,6x6,8x8,12x12")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--time-budget", type=float, default=None,
                    help="seconds; container fuzz stops after this")
    args = ap.parse_args()
    blocks = args.blocks.split(",")
    findings = 0
    if args.target in ("corpus", "gate", "all"):
        findings += fuzz_corpus()
    if args.target in ("container", "gate", "all"):
        findings += fuzz_container(args.iters, args.seed,
                                   time_budget=args.time_budget)
    if args.target in ("decode", "all"):
        findings += fuzz_decode(blocks, args.iters, args.seed)
    if args.target in ("encode", "all"):
        findings += fuzz_encode(blocks, args.iters, args.seed)
    print(f"findings: {findings}")
    sys.exit(1 if findings else 0)


if __name__ == "__main__":
    main()
