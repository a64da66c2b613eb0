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
from . import gather_pallas as gather_ops
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
        self._rows = None
        self._rows1 = None

    @property
    def rows(self):
        if self._rows is None:
            lo, hi = _quant_tables()
            tab = jnp.asarray(np.stack([lo, hi], axis=-1), jnp.float32)
            oh = lut_ops.onehot(self.idx, 17)
            self._rows = jnp.einsum("nq,qvc->nvc", oh, tab)  # (B, 256, 2)
        return self._rows

    @property
    def rows1(self):
        """(B, 256) float rows with lo + hi*256 packed.

        The pack happens elementwise AFTER the one-hot row selection: this
        backend executes f32 matmuls at bf16 precision, which is exact for
        the <=8-bit lo/hi payloads but NOT for a 16-bit packed payload.
        """
        if self._rows1 is None:
            r = self.rows                                    # (B, 256, 2)
            self._rows1 = r[..., 0] + r[..., 1] * 256.0
        return self._rows1

    def lookup_many(self, vals):
        """Batched lookup: vals (B, K) int -> (lo, hi) int32 (B, K).

        One hardware gather against the block's packed row (Pallas
        dynamic-gather on TPU; one-hot contraction fallback elsewhere),
        replacing the per-call-site factored one-hot matmuls (dozens of
        tiny dot_generals per pack).
        """
        v = jnp.clip(vals, 0, 255)
        if gather_ops._use_pallas():
            lo, hi = _quant_tables()
            packed = gather_ops.master_lookup(self.idx, v, lo, hi)
        else:
            packed = gather_ops.row_lookup(self.rows1, v).astype(jnp.int32)
        return packed & 0xFF, packed >> 8

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
        if gather_ops._use_pallas():
            lo, hi = _quant_tables()
            packed = gather_ops.master_lookup(self.idx, flat, lo, hi)
            out = jnp.stack([packed & 0xFF, packed >> 8],
                            axis=-1).astype(jnp.float32)
        else:
            out = gather_ops.row_lookup(self.rows, flat)
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




def _quantize_rgb(c0, c1, qidx):
    """quantize_rgb fallback (reference: :169-192), exact masked loop.

    The reference's do-while nudges c0 down / c1 up by 0.2 (ACCUMULATED
    f32 subtraction, not k*0.2) until the quantized rgb sums order
    correctly. Finished lanes freeze; the while_loop runs until the worst
    lane converges (bounded: at 0.2/step the endpoints meet within ~1300
    steps and equal endpoints always order). Typical encoder inputs are
    already ordered, so the loop body runs once for whole batches.
    """
    qk = qidx[..., None]

    def eval_quant(c0v, c1v):
        c0i = quant_color_res(qk, jnp.maximum(_rtn(c0v), 0), c0v)
        c1i = quant_color_res(qk, jnp.minimum(_rtn(c1v), 255), c1v)
        return c0i, c1i

    c0i0, c1i0 = eval_quant(c0, c1)
    done0 = _rgb_sum(c0i0) <= _rgb_sum(c1i0)

    def cond(carry):
        done = carry[0]
        return ~jnp.all(done)

    def body(carry):
        done, c0v, c1v, o0, o1, it = carry
        c0n = jnp.where(done[:, None], c0v, c0v - jnp.float32(0.2))
        c1n = jnp.where(done[:, None], c1v, c1v + jnp.float32(0.2))
        c0i, c1i = eval_quant(c0n, c1n)
        ok = _rgb_sum(c0i) <= _rgb_sum(c1i)
        newly = ok & ~done
        o0 = jnp.where(newly[:, None], c0i, o0)
        o1 = jnp.where(newly[:, None], c1i, o1)
        # Safety valve mirroring the loop's guaranteed convergence: after
        # the endpoints have crossed far past each other every quantized
        # sum orders; cap keeps the compiled loop finite on NaN inputs.
        force = it >= 2048
        return (done | ok | force, c0n, c1n,
                jnp.where((force & ~done & ~ok)[:, None], c1i, o0),
                jnp.where((force & ~done & ~ok)[:, None], c1i, o1),
                it + 1)

    init = (done0, c0, c1, c0i0, c1i0, jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    return out[3], out[4]


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
    lum0 = _rgb_sum(c0) * jnp.float32(1.0 / 3.0)
    lum1 = _rgb_sum(c1) * jnp.float32(1.0 / 3.0)
    swap = lum0 > lum1
    avg = (lum0 + lum1) * 0.5
    lum0 = jnp.where(swap, avg, lum0)
    lum1 = jnp.where(swap, avg, lum1)
    l0 = quant_color_res(qidx, _rtn(lum0), lum0)
    l1 = quant_color_res(qidx, _rtn(lum1), lum1)
    return jnp.stack([l0, l1], axis=-1)


def _try_lum_alpha_delta(c0, c1, qidx):
    """try_quantize_luminance_alpha_delta (reference: :573-666)."""
    l0 = _rgb_sum(c0) * jnp.float32(1.0 / 3.0)
    l1 = _rgb_sum(c1) * jnp.float32(1.0 / 3.0)
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

    lum0 = _rgb_sum(c0) * jnp.float32(1.0 / 3.0)
    lum1 = _rgb_sum(c1) * jnp.float32(1.0 / 3.0)
    a0 = c0[..., 3]
    a1 = c1[..., 3]
    vals = jnp.stack([
        quant_color_res(qidx, _rtn(lum0), lum0),
        quant_color_res(qidx, _rtn(lum1), lum1),
        quant_color_res(qidx, _rtn(a0), a0),
        quant_color_res(qidx, _rtn(a1), a1)], axis=-1)

    fmt = jnp.where(ok, cuq.FMT_LUMINANCE_ALPHA_DELTA, cuq.FMT_LUMINANCE_ALPHA)
    return fmt, jnp.where(ok[..., None], dvals, vals)


def _pack_color_endpoints_ldr_ref(ep0, ep1, rgbs, req_fmt, quant_level):
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


# ---------------------------------------------------------------------------
# Phased LDR pack: every quantizer lookup in the whole pack is batched into
# two QuantQ.lookup_many calls (one per data-dependency level), replacing
# ~35 per-call-site factored lookups (dozens of tiny dot_generals dominated
# the encoder's device profile). Semantically identical to
# _pack_color_endpoints_ldr_ref; tests/test_color_pack.py checks equality.
# ---------------------------------------------------------------------------

def _adelta_phase2(v0be, rtn_v0, rtn_v1):
    """Shared second phase of the channel-delta trials (reference
    try_quantize_alpha_delta / luminance_alpha_delta :505-666)."""
    v0a = rtn_v0 << 1
    v0b2 = v0be | (v0a & 0x100)
    v1d = (rtn_v1 << 1) - v0b2
    ok = (v1d <= 63) & (v1d >= -64)
    v1d2 = (v1d & 0x7F) | ((v0b2 & 0x100) >> 1)
    return ok, v0b2, v1d2


def _adelta_phase3(ok, v0b2, v1d2, v1de):
    ok &= ((v1d2 ^ v1de) & 0xC0) == 0
    v1du = v1de & 0x7F
    v1du = jnp.where((v1du & 0x40) != 0, v1du - 0x80, v1du)
    v1du = v1du + v0b2
    ok &= (v1du >= 0) & (v1du <= 0x1FF)
    return ok


def _rgbdelta_phase3(ok, c0be, c1d2, c1de, want_negative_sum: bool):
    """Shared tail of try_quantize_rgb_delta[_blue_contract] (:321-485)."""
    flips = (c1d2 ^ c1de) & 0xC0
    ok &= jnp.all(flips[..., :3] == 0, axis=-1)
    d = (c1de >> 1) & 0x3F
    d = jnp.where((d & 0x20) != 0, d - 0x40, d)
    base = (c0be >> 1) | (c1de & 0x80)
    if want_negative_sum:
        ok &= _rgb_sum(d) < 0
    else:
        ok &= _rgb_sum(d) >= 0
    s = base + d
    ok &= jnp.all((s[..., :3] >= 0) & (s[..., :3] <= 0xFF), axis=-1)
    return ok


def pack_color_endpoints_ldr(ep0, ep1, rgbs, req_fmt, quant_level):
    """Batched LDR pack_color_endpoints (reference: :1909-2147).

    Args:
      ep0/ep1: (B, 4) endpoints in 0..65535 domain.
      rgbs: (B, 4) RGB+scale vector for the scale formats.
      req_fmt: (B,) requested format id.
      quant_level: (B,) absolute color quant method (>= QUANT_6).

    Returns (fmt (B,), values (B, 8) int32 in 0..255).
    """
    qidx_i = jnp.clip(quant_level - ise.QUANT_6, 0, 16)
    qq = QuantQ(qidx_i)
    c0 = jnp.clip(ep0, 0.0, 65535.0) / 257.0
    c1 = jnp.clip(ep1, 0.0, 65535.0) / 257.0
    B = ep0.shape[0]
    zero8 = jnp.zeros((B, 8), jnp.int32)
    f32 = jnp.float32

    # ===================== phase 1: first-level queries =====================
    reqs = {}

    def req(name, arr):
        reqs[name] = arr.reshape(B, -1).astype(jnp.int32)

    rtn_c0 = _rtn(c0)
    rtn_c1 = _rtn(c1)
    a0f = c0[..., 3]
    a1f = c1[..., 3]
    rtn_a0 = rtn_c0[..., 3]
    rtn_a1 = rtn_c1[..., 3]

    # rgb delta (straight)
    c0a_d = rtn_c0 << 1
    req("d_c0b", c0a_d & 0xFF)
    # rgb delta blue-contract (inputs swapped then contracted)
    cc0 = _bc(c1)
    cc1 = _bc(c0)
    ok_dbc0 = jnp.all((cc0[..., :3] >= 0) & (cc0[..., :3] <= 255.0)
                      & (cc1[..., :3] >= 0) & (cc1[..., :3] <= 255.0), -1)
    rtn_cc0 = _rtn(cc0)
    rtn_cc1 = _rtn(cc1)
    c0a_dbc = rtn_cc0 << 1
    req("dbc_c0b", c0a_dbc & 0xFF)
    # rgb blue contract (non-delta; outputs swap)
    b0 = _bc(c0)
    b1 = _bc(c1)
    ok_bc = jnp.all((b0[..., :3] >= 0) & (b0[..., :3] <= 255.0)
                    & (b1[..., :3] >= 0) & (b1[..., :3] <= 255.0), -1)
    rtn_b0 = _rtn(b0)
    rtn_b1 = _rtn(b1)
    req("bc_c0", rtn_b0)
    req("bc_c1", rtn_b1)
    # quantize_rgb nudge: the 32 0.2-steps only touch 8 consecutive ints
    j8 = jnp.arange(8, dtype=jnp.int32)
    req("n0", rtn_c0[:, :, None] - j8[None, None, :])      # (B, 4, 8)
    req("n1", rtn_c1[:, :, None] + j8[None, None, :])
    avgf = (c0 + c1) * 0.5
    avg_v = jnp.clip(_rtn(avgf), 0, 255)
    req("n_avg", avg_v)
    # alpha deltas (both argument orders)
    req("ad01_a0b", (rtn_a0 << 1) & 0xFF)
    req("ad10_a0b", (rtn_a1 << 1) & 0xFF)
    # plain alpha
    req("res_a0", rtn_a0)
    req("res_a1", rtn_a1)
    # rgb-scale
    scale = 1.0 / 257.0
    rgbv = jnp.clip(rgbs[..., :3] * scale, 0.0, 255.0)
    rtn_rgbv = _rtn(rgbv)
    req("rgbs_rgb", rtn_rgbv)
    # luminance (averaged on swap)
    lum0 = _rgb_sum(c0) * jnp.float32(1.0 / 3.0)
    lum1 = _rgb_sum(c1) * jnp.float32(1.0 / 3.0)
    lswap = lum0 > lum1
    lavg = (lum0 + lum1) * 0.5
    lum0s = jnp.where(lswap, lavg, lum0)
    lum1s = jnp.where(lswap, lavg, lum1)
    req("lum0", _rtn(lum0s))
    req("lum1", _rtn(lum1s))
    # luminance+alpha (delta first stage + non-delta)
    rtn_l0 = _rtn(lum0)
    rtn_l1 = _rtn(lum1)
    req("lad_l0b", (rtn_l0 << 1) & 0xFF)
    req("lad_a0b", (rtn_a0 << 1) & 0xFF)
    req("la_l0", rtn_l0)
    req("la_l1", rtn_l1)

    names = list(reqs)
    sizes = [reqs[n].shape[1] for n in names]
    cat = jnp.concatenate([reqs[n] for n in names], axis=1)
    lo_all, hi_all = qq.lookup_many(cat)
    res1 = {}
    off = 0
    for n, sz in zip(names, sizes):
        res1[n] = (lo_all[:, off:off + sz], hi_all[:, off:off + sz])
        off += sz

    def hi1(n):
        return res1[n][1]

    def pick(n, value, valuef):
        lo, hi = res1[n]
        lo = lo.reshape(value.shape)
        hi = hi.reshape(value.shape)
        use_hi = (valuef - value.astype(f32)) >= -0.1
        return jnp.where(use_hi, hi, lo)

    # ===================== phase 2: dependent queries ========================
    # rgb delta (straight)
    c0be_d = hi1("d_c0b").reshape(B, 4)
    c0b2_d = c0be_d | (c0a_d & 0x100)
    c1d_d = (rtn_c1 << 1) - c0b2_d
    c1d_d = c1d_d.at[..., 3].set(0)
    ok_d = jnp.all((c1d_d[..., :3] <= 63) & (c1d_d[..., :3] >= -64), -1)
    c1d2_d = (c1d_d & 0x7F) | ((c0b2_d & 0x100) >> 1)
    # rgb delta blue-contract
    c0be_dbc = hi1("dbc_c0b").reshape(B, 4)
    c0b2_dbc = c0be_dbc | (c0a_dbc & 0x100)
    c1d_dbc = (rtn_cc1 << 1) - c0b2_dbc
    c1d_dbc = c1d_dbc.at[..., 3].set(0)
    ok_dbc = ok_dbc0 & jnp.all((c1d_dbc[..., :3] <= 63)
                               & (c1d_dbc[..., :3] >= -64), -1)
    c1d2_dbc = (c1d_dbc & 0x7F) | ((c0b2_dbc & 0x100) >> 1)
    # alpha/luminance channel deltas
    ok_ad01, a0b2_01, a1d2_01 = _adelta_phase2(
        hi1("ad01_a0b")[:, 0], rtn_a0, rtn_a1)
    ok_ad10, a0b2_10, a1d2_10 = _adelta_phase2(
        hi1("ad10_a0b")[:, 0], rtn_a1, rtn_a0)
    ok_ladl, l0b2, l1d2 = _adelta_phase2(
        hi1("lad_l0b")[:, 0], rtn_l0, rtn_l1)
    ok_lada, laa0b2, laa1d2 = _adelta_phase2(
        hi1("lad_a0b")[:, 0], rtn_a0, rtn_a1)
    # rgb-scale second stage
    q_rgbs = pick("rgbs_rgb", rtn_rgbv, rgbv)              # (B, 3)
    oldsum = _rgb_sum(rgbs) * scale
    newsum = jnp.sum(q_rgbs, axis=-1).astype(f32)
    scalea = jnp.clip(rgbs[..., 3] * (oldsum + 1e-10) / (newsum + 1e-10),
                      0.0, 1.0)
    scale_idx = jnp.clip(_rtn(scalea * 256.0), 0, 255)

    reqs2 = {}
    req2 = reqs2.__setitem__
    req2("d_c1d", c1d2_d)
    req2("dbc_c1d", c1d2_dbc)
    req2("ad01_a1d", a1d2_01[:, None])
    req2("ad10_a1d", a1d2_10[:, None])
    req2("lad_l1d", l1d2[:, None])
    req2("lad_a1d", laa1d2[:, None])
    req2("rgbs_s", scale_idx[:, None])
    names2 = list(reqs2)
    sizes2 = [reqs2[n].shape[1] for n in names2]
    cat2 = jnp.concatenate([reqs2[n].astype(jnp.int32) for n in names2],
                           axis=1)
    _, hi2_all = qq.lookup_many(cat2)
    res2 = {}
    off = 0
    for n, sz in zip(names2, sizes2):
        res2[n] = hi2_all[:, off:off + sz]
        off += sz

    # ===================== phase 3: finalize every trial =====================
    delta_ok_quant = qq.idx <= (18 - ise.QUANT_6)

    # rgb delta (straight)
    c1de_d = res2["d_c1d"]
    ok_d = _rgbdelta_phase3(ok_d, c0be_d, c1d2_d, c1de_d, False)
    # rgb delta blue-contract (wants negative delta sum; endpoints are the
    # swapped/contracted pair)
    c1de_dbc = res2["dbc_c1d"]
    ok_dbc = _rgbdelta_phase3(ok_dbc, c0be_dbc, c1d2_dbc, c1de_dbc, True)
    # alpha deltas
    a1de_01 = res2["ad01_a1d"][:, 0]
    ok_ad01 = _adelta_phase3(ok_ad01, a0b2_01, a1d2_01, a1de_01)
    a0e_01 = hi1("ad01_a0b")[:, 0]
    a1de_10 = res2["ad10_a1d"][:, 0]
    ok_ad10 = _adelta_phase3(ok_ad10, a0b2_10, a1d2_10, a1de_10)
    a0e_10 = hi1("ad10_a0b")[:, 0]
    # blue contract non-delta (swapped outputs)
    c0i_bc = pick("bc_c0", rtn_b0, b0)
    c1i_bc = pick("bc_c1", rtn_b1, b1)
    ok_bc = ok_bc & (_rgb_sum(c1i_bc) > _rgb_sum(c0i_bc))
    e0_bc, e1_bc = c1i_bc, c0i_bc
    # quantize_rgb nudge: exact masked while-loop (reference do-while with
    # accumulated 0.2 nudges, astcenc_color_quantize.cpp:169-192); typical
    # encoder inputs are already ordered so the body runs ~once.
    e0q, e1q = _quantize_rgb(c0, c1, qq)
    # plain alpha / rgb-scale / luminance components
    a0q = pick("res_a0", rtn_a0, a0f)
    a1q = pick("res_a1", rtn_a1, a1f)
    s_rgbs = res2["rgbs_s"][:, 0]
    rgbs_vals = jnp.stack([q_rgbs[..., 0], q_rgbs[..., 1], q_rgbs[..., 2],
                           s_rgbs], axis=-1)
    l0q = pick("lum0", _rtn(lum0s), lum0s)
    l1q = pick("lum1", _rtn(lum1s), lum1s)
    la_l0 = pick("la_l0", rtn_l0, lum0)
    la_l1 = pick("la_l1", rtn_l1, lum1)

    # --------------- FMT_RGB / FMT_RGBA trial-order selection ---------------
    def run_trials(with_alpha: bool):
        best_err = jnp.full((B,), _BIG)
        best_fmt = jnp.zeros((B,), jnp.int32)
        out0 = jnp.zeros((B, 4), jnp.int32)
        out1 = jnp.zeros((B, 4), jnp.int32)

        def consider(ok, fmt_id, e0, e1, unpack_delta, strict=True):
            nonlocal best_err, best_fmt, out0, out1
            u0, u1 = (_unpack_rgba_delta(e0, e1) if unpack_delta
                      else _unpack_rgba(e0, e1))
            if not with_alpha:
                u0 = u0.at[..., 3].set(255)
                u1 = u1.at[..., 3].set(255)
            err = _encoding_error(c0, c1, u0, u1)
            better = err < best_err if strict else jnp.ones_like(ok)
            take = ok & better
            best_err = jnp.where(take, err, best_err)
            best_fmt = jnp.where(take, fmt_id, best_fmt)
            out0 = jnp.where(take[..., None], e0, out0)
            out1 = jnp.where(take[..., None], e1, out1)

        if with_alpha:
            e0d = c0be_dbc.at[..., 3].set(a0e_10)
            e1d = c1de_dbc.at[..., 3].set(a1de_10)
            consider(ok_dbc & ok_ad10 & delta_ok_quant,
                     cuq.FMT_RGBA_DELTA, e0d, e1d, True)
            e0d = c0be_d.at[..., 3].set(a0e_01)
            e1d = c1de_d.at[..., 3].set(a1de_01)
            consider(ok_d & ok_ad01 & delta_ok_quant,
                     cuq.FMT_RGBA_DELTA, e0d, e1d, True)
            e0b = e0_bc.at[..., 3].set(a1q)   # alpha swaps with blue contract
            e1b = e1_bc.at[..., 3].set(a0q)
            consider(ok_bc & (qq.idx < 16), cuq.FMT_RGBA, e0b, e1b, False)
            e0n = e0q.at[..., 3].set(a0q)
            e1n = e1q.at[..., 3].set(a1q)
            err = _encoding_error(c0, c1, *_unpack_rgba(e0n, e1n))
            take = (err < best_err) | (best_err >= _BIG)
            best_fmt = jnp.where(take, cuq.FMT_RGBA, best_fmt)
            out0 = jnp.where(take[..., None], e0n, out0)
            out1 = jnp.where(take[..., None], e1n, out1)
            vals = jnp.stack([out0[..., 0], out1[..., 0], out0[..., 1],
                              out1[..., 1], out0[..., 2], out1[..., 2],
                              out0[..., 3], out1[..., 3]], axis=-1)
        else:
            consider(ok_dbc & delta_ok_quant, cuq.FMT_RGB_DELTA,
                     c0be_dbc, c1de_dbc, True)
            consider(ok_d & delta_ok_quant, cuq.FMT_RGB_DELTA,
                     c0be_d, c1de_d, True)
            consider(ok_bc & (qq.idx < 16), cuq.FMT_RGB, e0_bc, e1_bc, False)
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

    fmt_rgb, vals_rgb = run_trials(False)
    fmt_rgba, vals_rgba = run_trials(True)

    vals_rgbs = zero8.at[:, :4].set(rgbs_vals)
    vals_rgbsa = vals_rgbs.at[:, 4].set(a0q).at[:, 5].set(a1q)
    vals_lum = zero8.at[:, :2].set(jnp.stack([l0q, l1q], axis=-1))

    # luminance+alpha: delta variant when every channel-delta check passes
    la_ok = ok_ladl & ok_lada
    l0e_la = hi1("lad_l0b")[:, 0]
    l1e_la = res2["lad_l1d"][:, 0]
    la_ok = _adelta_phase3(la_ok, l0b2, l1d2, l1e_la)
    a0e_la = hi1("lad_a0b")[:, 0]
    a1e_la = res2["lad_a1d"][:, 0]
    la_ok = _adelta_phase3(la_ok, laa0b2, laa1d2, a1e_la)
    la_ok &= qq.idx <= (18 - ise.QUANT_6)
    dvals_la = jnp.stack([l0e_la, l1e_la, a0e_la, a1e_la], axis=-1)
    nvals_la = jnp.stack([la_l0, la_l1, a0q, a1q], axis=-1)
    fmt_la = jnp.where(la_ok, cuq.FMT_LUMINANCE_ALPHA_DELTA,
                       cuq.FMT_LUMINANCE_ALPHA)
    vals_la = zero8.at[:, :4].set(
        jnp.where(la_ok[..., None], dvals_la, nvals_la))

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
