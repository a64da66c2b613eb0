"""Golden endpoint-pack parity vs the reference encoder.

Feeds random + adversarial (color0, color1, rgbs, rgbo, format, quant)
vectors through BOTH the reference's pack_color_endpoints
(Source/astcenc_color_quantize.cpp:1909-2147, via tools/pack_oracle.cpp)
and the TPU port (astcenc_tpu/ops/color_pack.py + color_pack_hdr.py), and
requires bit-exact (returned format, packed values) agreement.

This is the choice-parity gate VERDICT r1 item 6 asks for: the HDR
quantizers' mode-selection loops are all-or-nothing — one different mode
pick changes the decoded color entirely, so exactness (not tolerance) is
the contract.
"""

import os
import struct
import subprocess

import numpy as np
import pytest

from astcenc_tpu.ops import color_unquant as cuq

REF_DIR = os.environ.get("ASTC_REF_DIR", "/root/reference")
REF_BUILD = os.environ.get("ASTC_REF_BUILD", "/tmp/refbuild")
ORACLE_BIN = "/tmp/pack_oracle"

# Only formats the search can request: pack_color_endpoints' dispatcher
# has no case for the *_DELTA ids (they are only ever RESULTS of packing
# a base format; requesting one leaves the reference's output
# uninitialized — astcenc_color_quantize.cpp:1935-2147).
LDR_FORMATS = (
    cuq.FMT_LUMINANCE, cuq.FMT_LUMINANCE_ALPHA, cuq.FMT_RGB_SCALE,
    cuq.FMT_RGB_SCALE_ALPHA, cuq.FMT_RGB, cuq.FMT_RGBA,
)
HDR_FORMATS = (
    cuq.FMT_HDR_RGB_SCALE, cuq.FMT_HDR_RGB, cuq.FMT_HDR_RGB_LDR_ALPHA,
    cuq.FMT_HDR_RGBA, cuq.FMT_HDR_LUMINANCE_LARGE_RANGE,
    cuq.FMT_HDR_LUMINANCE_SMALL_RANGE,
)
# Endpoint color quant levels: QUANT_6 (4) .. QUANT_256 (20)
QUANTS = tuple(range(4, 21))


@pytest.fixture(scope="session")
def pack_oracle():
    if not os.path.exists(ORACLE_BIN):
        src = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "pack_oracle.cpp")
        lib = os.path.join(REF_BUILD, "Source",
                           "libastcenc-native-static.a")
        if not (os.path.isdir(REF_DIR) and os.path.exists(lib)):
            pytest.skip("reference build unavailable for pack oracle")
        try:
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-ffp-contract=off",
                 "-pthread", "-I", os.path.join(REF_DIR, "Source"),
                 src, lib, "-o", ORACLE_BIN],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("cannot build pack oracle")
    return ORACLE_BIN


def _run_oracle(binpath, c0, c1, rgbs, rgbo, fmt, quant):
    n = c0.shape[0]
    buf = bytearray()
    for i in range(n):
        buf += struct.pack(
            "<16f2B", *c0[i], *c1[i], *rgbs[i], *rgbo[i],
            int(fmt[i]), int(quant[i]))
    out = subprocess.run([binpath], input=bytes(buf),
                         capture_output=True, check=True).stdout
    assert len(out) == n * 9
    rec = np.frombuffer(out, np.uint8).reshape(n, 9)
    return rec[:, 0].astype(np.int32), rec[:, 1:9].astype(np.int32)


def _run_ours(profile, c0, c1, rgbs, rgbo, fmt, quant):
    import jax.numpy as jnp
    from astcenc_tpu.ops import color_pack_hdr as cph
    ofmt, ovals = cph.pack_color_endpoints(
        profile, jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(rgbs),
        jnp.asarray(rgbo), jnp.asarray(fmt), jnp.asarray(quant))
    return np.asarray(ofmt), np.asarray(ovals)


def _gen_vectors(rng, n, formats):
    """Random endpoint requests biased toward the quantizer edge cases."""
    c0 = rng.rand(n, 4).astype(np.float32) * 65535.0
    c1 = rng.rand(n, 4).astype(np.float32) * 65535.0
    # A slab of near-equal endpoints (delta/blue-contract paths)
    m = n // 4
    c1[:m] = c0[:m] + rng.randn(m, 4).astype(np.float32) * 900.0
    # A slab of dark colors (small-range / offset modes)
    c0[m:2 * m] *= 0.02
    c1[m:2 * m] *= 0.02
    c0 = np.clip(c0, 0.0, 65535.0)
    c1 = np.clip(c1, 0.0, 65535.0)
    # rgbs: rgb + scale in [0,1]; rgbo: rgb + offset
    rgbs = np.concatenate(
        [rng.rand(n, 3).astype(np.float32) * 65535.0,
         rng.rand(n, 1).astype(np.float32)], axis=1)
    rgbo = rng.rand(n, 4).astype(np.float32) * 40000.0
    fmt = np.asarray(formats, np.int32)[rng.randint(0, len(formats), n)]
    quant = np.asarray(QUANTS, np.int32)[rng.randint(0, len(QUANTS), n)]
    return c0, c1, rgbs, rgbo, fmt, quant


def _compare(profile, vectors, binpath):
    c0, c1, rgbs, rgbo, fmt, quant = vectors
    rfmt, rvals = _run_oracle(binpath, c0, c1, rgbs, rgbo, fmt, quant)
    ofmt, ovals = _run_ours(profile, c0, c1, rgbs, rgbo, fmt, quant)
    # Compare only the value slots the format actually uses
    # (integer count of a CEM is ((cem >> 2) + 1) * 2, ASTC spec 18.12)
    nvals = np.asarray([((int(f) >> 2) + 1) * 2 for f in rfmt])
    bad = []
    for i in range(len(rfmt)):
        k = nvals[i]
        if ofmt[i] != rfmt[i] or not np.array_equal(ovals[i, :k],
                                                    rvals[i, :k]):
            bad.append((i, int(fmt[i]), int(quant[i]), int(rfmt[i]),
                        int(ofmt[i]), rvals[i, :k].tolist(),
                        ovals[i, :k].tolist()))
    assert not bad, (f"{len(bad)}/{len(rfmt)} mismatches; first 5: "
                     f"{bad[:5]}")


@pytest.mark.slow
def test_pack_golden_ldr(pack_oracle):
    rng = np.random.RandomState(11)
    _compare(1, _gen_vectors(rng, 4096, LDR_FORMATS), pack_oracle)


@pytest.mark.slow
def test_pack_golden_hdr(pack_oracle):
    rng = np.random.RandomState(12)
    _compare(3, _gen_vectors(rng, 4096, HDR_FORMATS), pack_oracle)
