"""Batched encoder-side color endpoint packing (LDR formats).

TPU redesign of pack_color_endpoints and its helpers
(reference: Source/astcenc_color_quantize.cpp): every delta / blue-contract
variant is evaluated for the whole batch with validity masks, and the best
valid variant is selected per element — replacing the reference's sequential
try/fallback chain while keeping its exact trial order and error tie-breaks.

All colors here are in the 0..255 "uquant" domain (inputs are pre-scaled by
1/257 from the 0..65535 working domain). Quantization uses the
unquant->uquant lo/hi tie-break tables from tables.quant.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..tables import ise, quant
from . import color_unquant as cuq
from . import lut as lut_ops

_BIG = jnp.float32(1e30)


@functools.cache
def _quant_tables():
    """(lo (17, 256), hi (17, 256)) int32 stacked color quant tables."""
    lo = np.zeros((17, 256), np.int32)
    hi = np.zeros((17, 256), np.int32)
    for q in range(ise.QUANT_6, 21):
        t = quant.color_quant_tables(q)
        lo[q - ise.QUANT_6] = t["unquant_to_uquant_lo"]
        hi[q - ise.QUANT_6] = t["unquant_to_uquant_hi"]
    return lo, hi


class QuantQ:
    """Per-row color quant tables with gather-free lookups.

    Elementwise gathers from the (17, 256) lo/hi tables scalarize on TPU
    (they were 96% of encoder device time); instead the block's two table
    rows are selected once with a one-hot contraction and every lookup runs
    against the per-row tables via factored one-hot matmuls
    (lut.lookup_rows).

    Duck-types the integer qidx array so existing call sites keep working:
    broadcast indexing (``qidx[..., None]``) returns self, and ``<=`` / ``<``
    comparisons defer to the underlying indices.
    """

    def __init__(self, qidx):
        self.idx = qidx                              # (B,) int32
        lo, hi = _quant_tables()
        tab = jnp.asarray(np.stack([lo, hi], axis=-1), jnp.float32)
        oh = lut_ops.onehot(qidx, 17)
        self.rows = jnp.einsum("nq,qvc->nvc", oh, tab)   # (B, 256, 2)

    def __getitem__(self, key):
        return self

    def __le__(self, other):
        return self.idx <= other

    def __lt__(self, other):
        return self.idx < other

    def lookup(self, value):
        """(lo, hi) table values for ``value``: (B, ...) -> (B, ..., 2)."""
        B = value.shape[0]
        flat = jnp.clip(value.reshape(B, -1), 0, 255)
        out = lut_ops.lookup_rows(self.rows, flat, a=32)
        return out.reshape(value.shape + (2,))


def quant_color(qidx, value):
    """quant_color(q, value) — round ties up (reference: :73-78)."""
    if isinstance(qidx, QuantQ):
        return qidx.lookup(value)[..., 1].astype(jnp.int32)
    _, hi = _quant_tables()
    return jnp.asarray(hi)[qidx, jnp.clip(value, 0, 255)]


def quant_color_res(qidx, value, valuef):
    """quant_color(q, value, valuef) with residual bias (reference: :108-125)."""
    residual = valuef - value.astype(jnp.float32)
    use_hi = residual >= -0.1
    if isinstance(qidx, QuantQ):
        lh = qidx.lookup(value)
        return jnp.where(use_hi, lh[..., 1], lh[..., 0]).astype(jnp.int32)
    lo, hi = _quant_tables()
    v = jnp.clip(value, 0, 255)
    return jnp.where(use_hi, jnp.asarray(hi)[qidx, v], jnp.asarray(lo)[qidx, v])


def _rtn(x):
    """float_to_int_rtn: trunc(x + 0.5)."""
    return jnp.floor(x + 0.5).astype(jnp.int32)


def _rgb_sum(v):
    return v[..., 0] + v[..., 1] + v[..., 2]


_NUDGE_STEPS = 32


def _quantize_rgb(c0, c1, qidx):
    """quantize_rgb fallback (reference: :169-192), nudges parallelized.

    The reference's do-while nudges c0 down / c1 up by 0.2 until the
    quantized sums order correctly. Run as a data-dependent loop, a single
    pathological lane would stall the whole batch, so we evaluate all nudge
    steps in parallel and pick each lane's first valid step (identical
    result for any lane converging within _NUDGE_STEPS). Lanes needing more
    nudging collapse to the quantized midpoint both loops converge towards.
    """
    k = jnp.arange(_NUDGE_STEPS, dtype=jnp.float32)
    c0k = c0[:, None, :] - 0.2 * k[None, :, None]       # (B, K, 4)
    c1k = c1[:, None, :] + 0.2 * k[None, :, None]

    qk = qidx[:, None, None]
    c0q = jnp.maximum(_rtn(c0k), 0)
    c0i = quant_color_res(qk, c0q, c0k)
    c1q = jnp.minimum(_rtn(c1k), 255)
    c1i = quant_color_res(qk, c1q, c1k)

    ok = _rgb_sum(c0i) <= _rgb_sum(c1i)                 # (B, K)
    first_ok = jnp.argmax(ok, axis=1)
    any_ok = jnp.any(ok, axis=1)

    sel = first_ok[:, None, None]
    c0_sel = jnp.take_along_axis(c0i, sel, axis=1)[:, 0]
    c1_sel = jnp.take_along_axis(c1i, sel, axis=1)[:, 0]

    # Fallback: equal endpoints at the quantized midpoint (always ordered)
    avg = (c0 + c1) * 0.5
    avg_i = quant_color_res(qidx[..., None],
                            jnp.clip(_rtn(avg), 0, 255), avg)
    c0_out = jnp.where(any_ok[:, None], c0_sel, avg_i)
    c1_out = jnp.where(any_ok[:, None], c1_sel, avg_i)
    return c0_out, c1_out


def _try_rgb_delta(c0, c1, qidx):
    """try_quantize_rgb_delta (reference: :321-400).

    Returns (ok, out0, out1) with alpha lanes zeroed.
    """
    qi = qidx[..., None]
    c0a = _rtn(c0) << 1
    c0b = c0a & 0xFF
    c0be = quant_color(qi, c0b)
    c0b2 = c0be | (c0a & 0x100)

    c1d = (_rtn(c1) << 1) - c0b2
    c1d = c1d.at[..., 3].set(0)

    ok = jnp.all((c1d[..., :3] <= 63) & (c1d[..., :3] >= -64), axis=-1)

    c1d = (c1d & 0x7F) | ((c0b2 & 0x100) >> 1)
    c1de = quant_color(qi, c1d)

    flips = (c1d ^ c1de) & 0xC0
    ok &= jnp.all(flips[..., :3] == 0, axis=-1)

    # bit_transfer_signed(ep1=c1de, ep0=c0be)
    ep1 = (c1de >> 1) | (c0be & 0x80)
    ep0 = (c0be >> 1) & 0x3F
    ep0 = jnp.where((ep0 & 0x20) != 0, ep0 - 0x40, ep0)
    # NOTE argument order: reference passes (input1=ep1_color, input0=ep0):
    # bit_transfer_signed(ep1, ep0) sign-extends ep1 and shifts ep0.
    d = (c1de >> 1) & 0x3F
    d = jnp.where((d & 0x20) != 0, d - 0x40, d)
    base = (c0be >> 1) | (c1de & 0x80)

    ok &= _rgb_sum(d) >= 0
    s = base + d
    ok &= jnp.all((s[..., :3] >= 0) & (s[..., :3] <= 0xFF), axis=-1)

    return ok, c0be, c1de


def _try_alpha_delta(c0, c1, qidx):
    """try_quantize_alpha_delta (reference: :505-556). Returns (ok, a0, a1)."""
    a0 = c0[..., 3]
    a1 = c1[..., 3]
    a0a = _rtn(a0) << 1
    a0b = a0a & 0xFF
    a0be = quant_color(qidx, a0b)
    a0b2 = a0be | (a0a & 0x100)
    a1d = (_rtn(a1) << 1) - a0b2
    ok = (a1d <= 63) & (a1d >= -64)
    a1d = (a1d & 0x7F) | ((a0b2 & 0x100) >> 1)
    a1de = quant_color(qidx, a1d)
    ok &= ((a1d ^ a1de) & 0xC0) == 0
    a1du = a1de & 0x7F
    a1du = jnp.where((a1du & 0x40) != 0, a1du - 0x80, a1du)
    a1du = a1du + a0b2
    ok &= (a1du >= 0) & (a1du <= 0x1FF)
    return ok, a0be, a1de


def _bc(c):
    """Inverse blue contraction: c + (c - c.b) on RGB lanes (ref: :245-247)."""
    b = c[..., 2:3]
    rgb = c[..., :3] * 2.0 - b
    return jnp.concatenate([rgb, c[..., 3:]], axis=-1)


def _try_rgb_blue_contract(c0, c1, qidx):
    """try_quantize_rgb_blue_contract (reference: :238-270).

    Returns (ok, out0, out1) — note output swap.
    """
    c0b = _bc(c0)
    c1b = _bc(c1)
    ok = jnp.all((c0b[..., :3] >= 0) & (c0b[..., :3] <= 255.0)
                 & (c1b[..., :3] >= 0) & (c1b[..., :3] <= 255.0), axis=-1)
    qi = qidx[..., None]
    c0i = quant_color_res(qi, _rtn(c0b), c0b)
    c1i = quant_color_res(qi, _rtn(c1b), c1b)
    ok &= _rgb_sum(c1i) > _rgb_sum(c0i)
    return ok, c1i, c0i


def _try_rgb_delta_blue_contract(c0in, c1in, qidx):
    """try_quantize_rgb_delta_blue_contract (reference: :403-485)."""
    # Swap at start
    c0 = _bc(c1in)
    c1 = _bc(c0in)
    ok = jnp.all((c0[..., :3] >= 0) & (c0[..., :3] <= 255.0)
                 & (c1[..., :3] >= 0) & (c1[..., :3] <= 255.0), axis=-1)

    qi = qidx[..., None]
    c0a = _rtn(c0) << 1
    c0b = c0a & 0xFF
    c0be = quant_color(qi, c0b)
    c0b2 = c0be | (c0a & 0x100)

    c1d = (_rtn(c1) << 1) - c0b2
    c1d = c1d.at[..., 3].set(0)
    ok &= jnp.all((c1d[..., :3] <= 63) & (c1d[..., :3] >= -64), axis=-1)

    c1d = (c1d & 0x7F) | ((c0b2 & 0x100) >> 1)
    c1de = quant_color(qi, c1d)
    flips = (c1d ^ c1de) & 0xC0
    ok &= jnp.all(flips[..., :3] == 0, axis=-1)

    d = (c1de >> 1) & 0x3F
    d = jnp.where((d & 0x20) != 0, d - 0x40, d)
    base = (c0be >> 1) | (c1de & 0x80)

    ok &= _rgb_sum(d) < 0
    s = base + d
    ok &= jnp.all((s[..., :3] >= 0) & (s[..., :3] <= 0xFF), axis=-1)
    return ok, c0be, c1de


def _encoding_error(c0f, c1f, u0, u1):
    e0 = c0f - u0.astype(jnp.float32)
    e1 = c1f - u1.astype(jnp.float32)
    return jnp.sum(e0 * e0 + e1 * e1, axis=-1)


def _unpack_rgba(e0, e1):
    """Decoder-side direct unpack for error measurement (alpha included)."""
    o0, o1 = cuq._rgba_unpack(e0, e1)
    return o0, o1


def _unpack_rgba_delta(e0, e1):
    o0, o1 = cuq._rgba_delta_unpack(e0, e1)
    return o0, o1


def pack_rgb_or_rgba(c0, c1, qidx, with_alpha: bool):
    """FMT_RGB / FMT_RGBA packing with delta + blue-contract trials.

    Reference: pack_color_endpoints FMT_RGB / FMT_RGBA cases (:1933-2096).
    c0/c1 are (B, 4) floats in the 0..255 domain.

    Returns (fmt (B,), values (B, 8) int32).
    """
    B = c0.shape[0]
    best_err = jnp.full((B,), _BIG)
    best_fmt = jnp.zeros((B,), jnp.int32)
    out0 = jnp.zeros((B, 4), jnp.int32)
    out1 = jnp.zeros((B, 4), jnp.int32)

    delta_ok_quant = qidx <= (18 - ise.QUANT_6)  # quant_level <= QUANT_160

    def consider(ok, fmt_id, e0, e1, unpack_delta, strict=True):
        nonlocal best_err, best_fmt, out0, out1
        if with_alpha:
            u0, u1 = (_unpack_rgba_delta(e0, e1) if unpack_delta
                      else _unpack_rgba(e0, e1))
        else:
            u0, u1 = (_unpack_rgba_delta(e0, e1) if unpack_delta
                      else _unpack_rgba(e0, e1))
            u0 = u0.at[..., 3].set(255)
            u1 = u1.at[..., 3].set(255)
        err = _encoding_error(c0, c1, u0, u1)
        better = err < best_err if strict else jnp.ones_like(ok)
        take = ok & better
        best_err = jnp.where(take, err, best_err)
        best_fmt = jnp.where(take, fmt_id, best_fmt)
        out0 = jnp.where(take[..., None], e0, out0)
        out1 = jnp.where(take[..., None], e1, out1)

    # Trial order mirrors the reference exactly.
    if with_alpha:
        okd, e0d, e1d = _try_rgb_delta_blue_contract(c0, c1, qidx)
        oka, a0, a1 = _try_alpha_delta(c1, c0, qidx)  # swapped for BC
        ok = okd & oka & delta_ok_quant
        e0d = e0d.at[..., 3].set(a0)
        e1d = e1d.at[..., 3].set(a1)
        consider(ok, cuq.FMT_RGBA_DELTA, e0d, e1d, True)

        okd, e0d, e1d = _try_rgb_delta(c0, c1, qidx)
        oka, a0, a1 = _try_alpha_delta(c0, c1, qidx)
        ok = okd & oka & delta_ok_quant
        e0d = e0d.at[..., 3].set(a0)
        e1d = e1d.at[..., 3].set(a1)
        consider(ok, cuq.FMT_RGBA_DELTA, e0d, e1d, True)

        okb, e0b, e1b = _try_rgb_blue_contract(c0, c1, qidx)
        # Alpha swaps with blue contract
        a0q = quant_color_res(qidx, _rtn(c1[..., 3]), c1[..., 3])
        a1q = quant_color_res(qidx, _rtn(c0[..., 3]), c0[..., 3])
        e0b = e0b.at[..., 3].set(a0q)
        e1b = e1b.at[..., 3].set(a1q)
        consider(okb & (qidx < 16), cuq.FMT_RGBA, e0b, e1b, False)

        e0q, e1q = _quantize_rgb(c0, c1, qidx)
        a0q = quant_color_res(qidx, _rtn(c0[..., 3]), c0[..., 3])
        a1q = quant_color_res(qidx, _rtn(c1[..., 3]), c1[..., 3])
        e0q = e0q.at[..., 3].set(a0q)
        e1q = e1q.at[..., 3].set(a1q)
        # Fallback: taken whenever better OR nothing chosen yet
        err = _encoding_error(c0, c1, *_unpack_rgba(e0q, e1q))
        take = (err < best_err) | (best_err >= _BIG)
        best_fmt = jnp.where(take, cuq.FMT_RGBA, best_fmt)
        out0 = jnp.where(take[..., None], e0q, out0)
        out1 = jnp.where(take[..., None], e1q, out1)

        vals = jnp.stack([out0[..., 0], out1[..., 0], out0[..., 1],
                          out1[..., 1], out0[..., 2], out1[..., 2],
                          out0[..., 3], out1[..., 3]], axis=-1)
    else:
        okd, e0d, e1d = _try_rgb_delta_blue_contract(c0, c1, qidx)
        consider(okd & delta_ok_quant, cuq.FMT_RGB_DELTA, e0d, e1d, True)

        okd, e0d, e1d = _try_rgb_delta(c0, c1, qidx)
        consider(okd & delta_ok_quant, cuq.FMT_RGB_DELTA, e0d, e1d, True)

        okb, e0b, e1b = _try_rgb_blue_contract(c0, c1, qidx)
        consider(okb & (qidx < 16), cuq.FMT_RGB, e0b, e1b, False)

        e0q, e1q = _quantize_rgb(c0, c1, qidx)
        u0, u1 = _unpack_rgba(e0q, e1q)
        u0 = u0.at[..., 3].set(255)
        u1 = u1.at[..., 3].set(255)
        err = _encoding_error(c0, c1, u0, u1)
        take = (err < best_err) | (best_err >= _BIG)
        best_fmt = jnp.where(take, cuq.FMT_RGB, best_fmt)
        out0 = jnp.where(take[..., None], e0q, out0)
        out1 = jnp.where(take[..., None], e1q, out1)

        vals = jnp.stack([out0[..., 0], out1[..., 0], out0[..., 1],
                          out1[..., 1], out0[..., 2], out1[..., 2],
                          jnp.zeros_like(out0[..., 0]),
                          jnp.zeros_like(out0[..., 0])], axis=-1)
    return best_fmt, vals


def pack_rgbs(rgbs, qidx):
    """FMT_RGB_SCALE (reference: quantize_rgbs :734-766). rgbs is the
    (B, 4) scale vector in 0..65535 domain with scalediv in lane 3."""
    scale = 1.0 / 257.0
    rgb = jnp.clip(rgbs[..., :3] * scale, 0.0, 255.0)
    q = quant_color_res(qidx[..., None], _rtn(rgb), rgb)
    oldsum = _rgb_sum(rgbs) * scale
    newsum = jnp.sum(q, axis=-1).astype(jnp.float32)
    scalea = jnp.clip(rgbs[..., 3] * (oldsum + 1e-10) / (newsum + 1e-10),
                      0.0, 1.0)
    scale_idx = jnp.clip(_rtn(scalea * 256.0), 0, 255)
    s = quant_color(qidx, scale_idx)
    return jnp.stack([q[..., 0], q[..., 1], q[..., 2], s], axis=-1)


def pack_luminance(c0, c1, qidx):
    """FMT_LUMINANCE (reference: quantize_luminance :795-820)."""
    lum0 = _rgb_sum(c0) / 3.0
    lum1 = _rgb_sum(c1) / 3.0
    swap = lum0 > lum1
    avg = (lum0 + lum1) * 0.5
    lum0 = jnp.where(swap, avg, lum0)
    lum1 = jnp.where(swap, avg, lum1)
    l0 = quant_color_res(qidx, _rtn(lum0), lum0)
    l1 = quant_color_res(qidx, _rtn(lum1), lum1)
    return jnp.stack([l0, l1], axis=-1)


def _try_lum_alpha_delta(c0, c1, qidx):
    """try_quantize_luminance_alpha_delta (reference: :573-666)."""
    l0 = _rgb_sum(c0) / 3.0
    l1 = _rgb_sum(c1) / 3.0
    a0 = c0[..., 3]
    a1 = c1[..., 3]

    def chan_delta(v0, v1):
        v0a = _rtn(v0) << 1
        v0b = v0a & 0xFF
        v0be = quant_color(qidx, v0b)
        v0b2 = v0be | (v0a & 0x100)
        v1d = (_rtn(v1) << 1) - v0b2
        ok = (v1d <= 63) & (v1d >= -64)
        v1d = (v1d & 0x7F) | ((v0b2 & 0x100) >> 1)
        v1de = quant_color(qidx, v1d)
        ok &= ((v1d ^ v1de) & 0xC0) == 0
        v1du = v1de & 0x7F
        v1du = jnp.where((v1du & 0x40) != 0, v1du - 0x80, v1du)
        v1du = v1du + v0b2
        ok &= (v1du >= 0) & (v1du <= 0x1FF)
        return ok, v0be, v1de

    okl, l0e, l1e = chan_delta(l0, l1)
    oka, a0e, a1e = chan_delta(a0, a1)
    ok = okl & oka
    vals = jnp.stack([l0e, l1e, a0e, a1e], axis=-1)
    return ok, vals


def pack_luminance_alpha(c0, c1, qidx):
    """FMT_LUMINANCE_ALPHA with delta trial (reference: :2105-2117)."""
    ok, dvals = _try_lum_alpha_delta(c0, c1, qidx)
    ok &= qidx <= (18 - ise.QUANT_6)  # quant_level <= 18 (QUANT_192)

    lum0 = _rgb_sum(c0) / 3.0
    lum1 = _rgb_sum(c1) / 3.0
    a0 = c0[..., 3]
    a1 = c1[..., 3]
    vals = jnp.stack([
        quant_color_res(qidx, _rtn(lum0), lum0),
        quant_color_res(qidx, _rtn(lum1), lum1),
        quant_color_res(qidx, _rtn(a0), a0),
        quant_color_res(qidx, _rtn(a1), a1)], axis=-1)

    fmt = jnp.where(ok, cuq.FMT_LUMINANCE_ALPHA_DELTA, cuq.FMT_LUMINANCE_ALPHA)
    return fmt, jnp.where(ok[..., None], dvals, vals)


def pack_color_endpoints_ldr(ep0, ep1, rgbs, req_fmt, quant_level):
    """Batched LDR pack_color_endpoints (reference: :1909-2147).

    Args:
      ep0/ep1: (B, 4) endpoints in 0..65535 domain.
      rgbs: (B, 4) RGB+scale vector for the scale formats.
      req_fmt: (B,) requested format id.
      quant_level: (B,) absolute color quant method (>= QUANT_6).

    Returns (fmt (B,), values (B, 8) int32 in 0..255).
    """
    qidx = QuantQ(jnp.clip(quant_level - ise.QUANT_6, 0, 16))
    c0 = jnp.clip(ep0, 0.0, 65535.0) / 257.0
    c1 = jnp.clip(ep1, 0.0, 65535.0) / 257.0

    B = ep0.shape[0]
    zero8 = jnp.zeros((B, 8), jnp.int32)

    fmt_rgb, vals_rgb = pack_rgb_or_rgba(c0, c1, qidx, with_alpha=False)
    fmt_rgba, vals_rgba = pack_rgb_or_rgba(c0, c1, qidx, with_alpha=True)

    vals_rgbs = zero8.at[:, :4].set(pack_rgbs(rgbs, qidx))

    # FMT_RGB_SCALE_ALPHA: a0/a1 then rgbs (reference: :778-793)
    a0q = quant_color_res(qidx, _rtn(c0[..., 3]), c0[..., 3])
    a1q = quant_color_res(qidx, _rtn(c1[..., 3]), c1[..., 3])
    vals_rgbsa = zero8.at[:, :4].set(pack_rgbs(rgbs, qidx))
    vals_rgbsa = vals_rgbsa.at[:, 4].set(a0q).at[:, 5].set(a1q)

    vals_lum = zero8.at[:, :2].set(pack_luminance(c0, c1, qidx))

    fmt_la, v_la = pack_luminance_alpha(c0, c1, qidx)
    vals_la = zero8.at[:, :4].set(v_la)

    out_fmt = jnp.select(
        [req_fmt == cuq.FMT_RGB,
         req_fmt == cuq.FMT_RGBA,
         req_fmt == cuq.FMT_RGB_SCALE,
         req_fmt == cuq.FMT_RGB_SCALE_ALPHA,
         req_fmt == cuq.FMT_LUMINANCE,
         req_fmt == cuq.FMT_LUMINANCE_ALPHA],
        [fmt_rgb, fmt_rgba,
         jnp.full((B,), cuq.FMT_RGB_SCALE),
         jnp.full((B,), cuq.FMT_RGB_SCALE_ALPHA),
         jnp.full((B,), cuq.FMT_LUMINANCE),
         fmt_la],
        default=jnp.full((B,), cuq.FMT_LUMINANCE))

    out_vals = jnp.select(
        [(req_fmt == cuq.FMT_RGB)[:, None],
         (req_fmt == cuq.FMT_RGBA)[:, None],
         (req_fmt == cuq.FMT_RGB_SCALE)[:, None],
         (req_fmt == cuq.FMT_RGB_SCALE_ALPHA)[:, None],
         (req_fmt == cuq.FMT_LUMINANCE)[:, None],
         (req_fmt == cuq.FMT_LUMINANCE_ALPHA)[:, None]],
        [vals_rgb, vals_rgba, vals_rgbs, vals_rgbsa, vals_lum, vals_la],
        default=vals_lum)

    return out_fmt, out_vals
