"""Exact integer <-> fp16 / LNS conversions, batched in jnp.

These reproduce the reference codec's bit-exact conversion semantics
(reference: Source/astcenc_vecmathlib.h:495-620, astcenc_mathlib_softfloat.cpp):
ASTC decodes to UNORM16 (LDR) or 16-bit LNS (HDR) integers, converts those to
fp16 bit patterns, and only then widens to fp32. Matching the 0.05 dB quality
gate requires matching these conversions exactly, so they are implemented as
integer ops rather than "close enough" float math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unorm16_to_sf16(p: jnp.ndarray) -> jnp.ndarray:
    """UNORM16 [0, 65535] -> fp16 bits in [0, 1] (reference: :503-533)."""
    p = p.astype(jnp.int32)
    fp16_one = jnp.int32(0x3C00)
    fp16_small = p << 8

    is_one = p == 0xFFFF
    is_small = p < 4

    lz = jax.lax.clz(p) - 16
    pn = (p * (1 << jnp.clip(lz + 1, 0, 31))) & 0xFFFF
    pn = pn >> 6
    pn = pn | ((14 - lz) << 10)

    r = jnp.where(is_one, fp16_one, pn)
    r = jnp.where(is_small, fp16_small, r)
    return r


def lns_to_sf16(p: jnp.ndarray) -> jnp.ndarray:
    """16-bit LNS -> fp16 bits (reference: :537-556)."""
    p = p.astype(jnp.int32)
    mc = p & 0x7FF
    ec = p >> 11
    mt = jnp.where(mc < 512, mc * 3,
                   jnp.where(mc < 1536, mc * 4 - 512, mc * 5 - 2048))
    res = (ec << 10) | (mt >> 3)
    return jnp.minimum(res, 0x7BFF)


def float16_to_float(bits: jnp.ndarray) -> jnp.ndarray:
    """fp16 bit pattern (int) -> fp32 value, IEEE-exact."""
    u16 = bits.astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(u16, jnp.float16).astype(jnp.float32)


def float_to_float16(x: jnp.ndarray) -> jnp.ndarray:
    """fp32 -> fp16 bit pattern (int), round-to-nearest-even."""
    f16 = x.astype(jnp.float16)
    return jax.lax.bitcast_convert_type(f16, jnp.uint16).astype(jnp.int32)


def float_to_lns(a: jnp.ndarray) -> jnp.ndarray:
    """fp32 -> 16-bit LNS value as float (reference: :582-620).

    Used on the HDR encode path when loading image blocks.
    """
    a = a.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(a, jnp.int32)
    exp = ((bits >> 23) & 0xFF) - 126
    # Mask with 0x807FFFFF (sign + mantissa), set exponent to 0x3F000000
    manti = (bits & jnp.int32(0x007FFFFF)) | (bits & jnp.int32(-0x80000000)) | 0x3F000000
    mant = jax.lax.bitcast_convert_type(manti, jnp.float32)

    mask_underflow_nan = ~(a > (1.0 / 67108864.0))
    mask_infinity = a >= 65536.0

    exp_lt_m13 = exp < -13
    a1a = a * 33554432.0
    a1b = (mant - 0.5) * 4096.0
    av = jnp.where(exp_lt_m13, a1a, a1b)
    expv = jnp.where(exp_lt_m13, 0, exp + 14)

    a2 = jnp.where(av < 384.0, av * (4.0 / 3.0),
                   jnp.where(av <= 1408.0, av + 128.0,
                             (av + 512.0) * (4.0 / 5.0)))
    out = a2 + expv.astype(jnp.float32) * 2048.0 + 1.0
    out = jnp.where(mask_infinity, 65535.0, out)
    out = jnp.where(mask_underflow_nan, 0.0, out)
    return out
