"""Row-structured LDR endpoint pack / unpack.

The same algorithms as ops/color_pack.pack_color_endpoints_ldr and
ops/color_unquant.unpack_color_endpoints (LDR formats), expressed over a
struct-of-rows representation: a color is a list of four same-shaped
arrays (one per channel), packed values are a list of eight. Every
operation is plain elementwise jnp, so the functions run identically

- inside a Pallas TPU kernel on (1, BT) lane-vector rows (the fused
  refinement kernel's layout, see refine_pallas.py), and
- on ordinary (B,) arrays for CPU validation against the array-form
  implementations they mirror.

Quantizer lookups go through a caller-injected callable so the kernel can
batch every lookup of a pack phase into one in-VMEM gather while tests use
a direct numpy gather.

Reference: astcenc_color_quantize.cpp:1909-2147 (pack dispatch),
astcenc_color_unquantize.cpp:844-1023 (unpack dispatch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import color_unquant as cuq
from ..tables import ise

_BIG = 1e30


def _rtn(x):
    return jnp.floor(x + 0.5).astype(jnp.int32)


def _sum3(v):
    return v[0] + v[1] + v[2]


class LutBatch:
    """Collects lookup requests, then resolves them in one batch.

    Usage: phase 1 registers requests via req(); the driver calls
    resolve(lut) with lut(rows_list) -> (lo_list, hi_list); afterwards
    lo(name, i) / hi(name, i) return the per-request rows.
    """

    def __init__(self):
        self._names = []
        self._rows = []
        self._index = {}
        self._lo = None
        self._hi = None

    def req(self, name, rows):
        self._index[name] = (len(self._rows), len(rows))
        self._names.append(name)
        self._rows.extend(rows)

    def resolve(self, lut):
        self._lo, self._hi = lut(self._rows)

    def lo(self, name, i=0):
        off, _ = self._index[name]
        return self._lo[off + i]

    def hi(self, name, i=0):
        off, _ = self._index[name]
        return self._hi[off + i]

    def pick(self, name, i, value, valuef):
        """quant_color_res: hi unless the residual is below -0.1."""
        use_hi = (valuef - value.astype(jnp.float32)) >= -0.1
        return jnp.where(use_hi, self.hi(name, i), self.lo(name, i))


# ---------------------------------------------------------------------------
# Decode-side helpers (rows forms of color_unquant internals)
# ---------------------------------------------------------------------------

def _uncontract_rows(c):
    return [(c[0] + c[2]) >> 1, (c[1] + c[2]) >> 1, c[2], c[3]]


def _rgba_unpack_rows(v0, v1):
    swap = _sum3(v0) > _sum3(v1)
    u0 = _uncontract_rows(v0)
    u1 = _uncontract_rows(v1)
    out0 = [jnp.where(swap, u1[i], v0[i]) for i in range(4)]
    out1 = [jnp.where(swap, u0[i], v1[i]) for i in range(4)]
    return out0, out1


def _rgba_delta_unpack_rows(v0, v1):
    d = []
    base = []
    for i in range(4):
        b2 = (v0[i] >> 1) | (v1[i] & 0x80)
        a2 = (v1[i] >> 1) & 0x3F
        a2 = jnp.where((a2 & 0x20) != 0, a2 - 0x40, a2)
        d.append(a2)
        base.append(b2)
    rgb_sum = _sum3(d)
    hi = [d[i] + base[i] for i in range(4)]
    swap = rgb_sum < 0
    u0 = _uncontract_rows(base)
    u1 = _uncontract_rows(hi)
    out0 = [jnp.clip(jnp.where(swap, u1[i], base[i]), 0, 255)
            for i in range(4)]
    out1 = [jnp.clip(jnp.where(swap, u0[i], hi[i]), 0, 255)
            for i in range(4)]
    return out0, out1


def unpack_ldr_rows(profile: int, fmt, v):
    """LDR unpack_color_endpoints over rows.

    Args:
      profile: static PRF_LDR or PRF_LDR_SRGB.
      fmt: format id array; v: list of 8 value rows (int32).

    Returns (ep0 rows[4], ep1 rows[4]) in UNORM16 integer space.
    """
    assert profile in (cuq.PRF_LDR, cuq.PRF_LDR_SRGB)
    zero = jnp.zeros_like(v[0])
    n255 = zero + 255

    outs0 = {}
    outs1 = {}

    outs0[0] = [v[0], v[0], v[0], n255]
    outs1[0] = [v[1], v[1], v[1], n255]

    l0 = (v[0] >> 2) | (v[1] & 0xC0)
    l1 = jnp.minimum(l0 + (v[1] & 0x3F), 255)
    outs0[1] = [l0, l0, l0, n255]
    outs1[1] = [l1, l1, l1, n255]

    outs0[4] = [v[0], v[0], v[0], v[2]]
    outs1[4] = [v[1], v[1], v[1], v[3]]

    lum0 = (v[0] | ((v[1] & 0x80) << 1)) >> 1
    alp0 = (v[2] | ((v[3] & 0x80) << 1)) >> 1
    lum1 = v[1] & 0x7F
    alp1 = v[3] & 0x7F
    lum1 = jnp.where((lum1 & 0x40) != 0, lum1 - 0x80, lum1) >> 1
    alp1 = jnp.where((alp1 & 0x40) != 0, alp1 - 0x80, alp1) >> 1
    lum1 = jnp.clip(lum1 + lum0, 0, 255)
    alp1 = jnp.clip(alp1 + alp0, 0, 255)
    outs0[5] = [lum0, lum0, lum0, alp0]
    outs1[5] = [lum1, lum1, lum1, alp1]

    sc6 = [(v[i] * v[3]) >> 8 for i in range(3)]
    outs0[6] = [sc6[0], sc6[1], sc6[2], n255]
    outs1[6] = [v[0], v[1], v[2], n255]

    e0, e1 = _rgba_unpack_rows([v[0], v[2], v[4], zero],
                               [v[1], v[3], v[5], zero])
    outs0[8] = e0[:3] + [n255]
    outs1[8] = e1[:3] + [n255]

    e0, e1 = _rgba_delta_unpack_rows([v[0], v[2], v[4], zero],
                                     [v[1], v[3], v[5], zero])
    outs0[9] = e0[:3] + [n255]
    outs1[9] = e1[:3] + [n255]

    sc10 = [(v[i] * v[3]) >> 8 for i in range(3)]
    outs0[10] = [sc10[0], sc10[1], sc10[2], v[4]]
    outs1[10] = [v[0], v[1], v[2], v[5]]

    outs0[12], outs1[12] = _rgba_unpack_rows(
        [v[0], v[2], v[4], v[6]], [v[1], v[3], v[5], v[7]])
    outs0[13], outs1[13] = _rgba_delta_unpack_rows(
        [v[0], v[2], v[4], v[6]], [v[1], v[3], v[5], v[7]])

    # HDR formats decode as the error color in LDR profiles.
    err = [n255, zero, n255, n255]
    ldr_fmts = (0, 1, 4, 5, 6, 8, 9, 10, 12, 13)

    ep0 = []
    ep1 = []
    for ch in range(4):
        a0 = err[ch]
        a1 = err[ch]
        for f in ldr_fmts:
            m = fmt == f
            a0 = jnp.where(m, outs0[f][ch], a0)
            a1 = jnp.where(m, outs1[f][ch], a1)
        ep0.append(a0)
        ep1.append(a1)

    if profile == cuq.PRF_LDR:
        ep0 = [c * 257 for c in ep0]
        ep1 = [c * 257 for c in ep1]
    else:  # PRF_LDR_SRGB
        ep0 = [(c << 8) | 0x80 for c in ep0]
        ep1 = [(c << 8) | 0x80 for c in ep1]
    return ep0, ep1


# ---------------------------------------------------------------------------
# Pack (rows form of color_pack.pack_color_endpoints_ldr)
# ---------------------------------------------------------------------------

def _bc_rows(c):
    return [c[0] * 2.0 - c[2], c[1] * 2.0 - c[2], c[2], c[3]]


def _adelta_phase2_rows(v0be, rtn_v0, rtn_v1):
    v0a = rtn_v0 << 1
    v0b2 = v0be | (v0a & 0x100)
    v1d = (rtn_v1 << 1) - v0b2
    ok = (v1d <= 63) & (v1d >= -64)
    v1d2 = (v1d & 0x7F) | ((v0b2 & 0x100) >> 1)
    return ok, v0b2, v1d2


def _adelta_phase3_rows(ok, v0b2, v1d2, v1de):
    ok &= ((v1d2 ^ v1de) & 0xC0) == 0
    v1du = v1de & 0x7F
    v1du = jnp.where((v1du & 0x40) != 0, v1du - 0x80, v1du)
    v1du = v1du + v0b2
    ok &= (v1du >= 0) & (v1du <= 0x1FF)
    return ok


def _rgbdelta_phase3_rows(ok, c0be, c1d2, c1de, want_negative_sum: bool):
    for i in range(3):
        ok &= ((c1d2[i] ^ c1de[i]) & 0xC0) == 0
    d = []
    for i in range(3):
        di = (c1de[i] >> 1) & 0x3F
        d.append(jnp.where((di & 0x20) != 0, di - 0x40, di))
    if want_negative_sum:
        ok &= _sum3(d) < 0
    else:
        ok &= _sum3(d) >= 0
    for i in range(3):
        s = ((c0be[i] >> 1) | (c1de[i] & 0x80)) + d[i]
        ok &= (s >= 0) & (s <= 0xFF)
    return ok


def _encoding_error_rows(c0, c1, u0, u1):
    acc = None
    for i in range(4):
        e0 = c0[i] - u0[i].astype(jnp.float32)
        e1 = c1[i] - u1[i].astype(jnp.float32)
        t = e0 * e0 + e1 * e1
        acc = t if acc is None else acc + t
    return acc


def pack_ldr_rows(ep0, ep1, rgbs, req_fmt, qidx, lut):
    """Rows form of pack_color_endpoints_ldr.

    Args:
      ep0/ep1: color rows (4 arrays) in 0..65535 domain.
      rgbs: rows (4) RGB + scale vector.
      req_fmt: requested format id array.
      qidx: color quant table row (quant_level - QUANT_6, clipped 0..16).
      lut: callable(list_of_int_rows) -> (lo_rows, hi_rows) resolving the
        per-element (qidx, value) quantizer lookups.

    Returns (fmt array, vals list of 8 rows).
    """
    c0 = [jnp.clip(c, 0.0, 65535.0) / 257.0 for c in ep0]
    c1 = [jnp.clip(c, 0.0, 65535.0) / 257.0 for c in ep1]
    f32 = jnp.float32

    lb = LutBatch()

    rtn_c0 = [_rtn(c) for c in c0]
    rtn_c1 = [_rtn(c) for c in c1]
    a0f, a1f = c0[3], c1[3]
    rtn_a0, rtn_a1 = rtn_c0[3], rtn_c1[3]

    # rgb delta (straight)
    c0a_d = [c << 1 for c in rtn_c0]
    lb.req("d_c0b", [c & 0xFF for c in c0a_d])
    # rgb delta blue-contract (inputs swapped then contracted)
    cc0 = _bc_rows(c1)
    cc1 = _bc_rows(c0)
    ok_dbc0 = None
    for i in range(3):
        t = ((cc0[i] >= 0) & (cc0[i] <= 255.0)
             & (cc1[i] >= 0) & (cc1[i] <= 255.0))
        ok_dbc0 = t if ok_dbc0 is None else ok_dbc0 & t
    rtn_cc0 = [_rtn(c) for c in cc0]
    rtn_cc1 = [_rtn(c) for c in cc1]
    c0a_dbc = [c << 1 for c in rtn_cc0]
    lb.req("dbc_c0b", [c & 0xFF for c in c0a_dbc])
    # rgb blue contract (non-delta; outputs swap)
    b0 = _bc_rows(c0)
    b1 = _bc_rows(c1)
    ok_bc = None
    for i in range(3):
        t = ((b0[i] >= 0) & (b0[i] <= 255.0)
             & (b1[i] >= 0) & (b1[i] <= 255.0))
        ok_bc = t if ok_bc is None else ok_bc & t
    rtn_b0 = [_rtn(c) for c in b0]
    rtn_b1 = [_rtn(c) for c in b1]
    lb.req("bc_c0", rtn_b0)
    lb.req("bc_c1", rtn_b1)
    # alpha deltas (both argument orders)
    lb.req("ad01_a0b", [(rtn_a0 << 1) & 0xFF])
    lb.req("ad10_a0b", [(rtn_a1 << 1) & 0xFF])
    # plain alpha
    lb.req("res_a0", [rtn_a0])
    lb.req("res_a1", [rtn_a1])
    # rgb-scale
    scale = 1.0 / 257.0
    rgbv = [jnp.clip(rgbs[i] * scale, 0.0, 255.0) for i in range(3)]
    rtn_rgbv = [_rtn(v) for v in rgbv]
    lb.req("rgbs_rgb", rtn_rgbv)
    # luminance (averaged on swap)
    lum0 = _sum3(c0) / 3.0
    lum1 = _sum3(c1) / 3.0
    lswap = lum0 > lum1
    lavg = (lum0 + lum1) * 0.5
    lum0s = jnp.where(lswap, lavg, lum0)
    lum1s = jnp.where(lswap, lavg, lum1)
    lb.req("lum0", [_rtn(lum0s)])
    lb.req("lum1", [_rtn(lum1s)])
    # luminance+alpha (delta first stage + non-delta)
    rtn_l0 = _rtn(lum0)
    rtn_l1 = _rtn(lum1)
    lb.req("lad_l0b", [(rtn_l0 << 1) & 0xFF])
    lb.req("lad_a0b", [(rtn_a0 << 1) & 0xFF])
    lb.req("la_l0", [rtn_l0])
    lb.req("la_l1", [rtn_l1])

    lb.resolve(lut)

    # ===================== phase 2: dependent queries ========================
    c0be_d = [lb.hi("d_c0b", i) for i in range(4)]
    c0b2_d = [c0be_d[i] | (c0a_d[i] & 0x100) for i in range(4)]
    c1d_d = [(rtn_c1[i] << 1) - c0b2_d[i] for i in range(4)]
    c1d_d[3] = jnp.zeros_like(c1d_d[3])
    ok_d = None
    for i in range(3):
        t = (c1d_d[i] <= 63) & (c1d_d[i] >= -64)
        ok_d = t if ok_d is None else ok_d & t
    c1d2_d = [(c1d_d[i] & 0x7F) | ((c0b2_d[i] & 0x100) >> 1)
              for i in range(4)]

    c0be_dbc = [lb.hi("dbc_c0b", i) for i in range(4)]
    c0b2_dbc = [c0be_dbc[i] | (c0a_dbc[i] & 0x100) for i in range(4)]
    c1d_dbc = [(rtn_cc1[i] << 1) - c0b2_dbc[i] for i in range(4)]
    c1d_dbc[3] = jnp.zeros_like(c1d_dbc[3])
    ok_dbc = ok_dbc0
    for i in range(3):
        ok_dbc = ok_dbc & (c1d_dbc[i] <= 63) & (c1d_dbc[i] >= -64)
    c1d2_dbc = [(c1d_dbc[i] & 0x7F) | ((c0b2_dbc[i] & 0x100) >> 1)
                for i in range(4)]

    ok_ad01, a0b2_01, a1d2_01 = _adelta_phase2_rows(
        lb.hi("ad01_a0b"), rtn_a0, rtn_a1)
    ok_ad10, a0b2_10, a1d2_10 = _adelta_phase2_rows(
        lb.hi("ad10_a0b"), rtn_a1, rtn_a0)
    ok_ladl, l0b2, l1d2 = _adelta_phase2_rows(
        lb.hi("lad_l0b"), rtn_l0, rtn_l1)
    ok_lada, laa0b2, laa1d2 = _adelta_phase2_rows(
        lb.hi("lad_a0b"), rtn_a0, rtn_a1)

    q_rgbs = [lb.pick("rgbs_rgb", i, rtn_rgbv[i], rgbv[i]) for i in range(3)]
    oldsum = _sum3(rgbs) * scale
    newsum = (q_rgbs[0] + q_rgbs[1] + q_rgbs[2]).astype(f32)
    scalea = jnp.clip(rgbs[3] * (oldsum + 1e-10) / (newsum + 1e-10),
                      0.0, 1.0)
    scale_idx = jnp.clip(_rtn(scalea * 256.0), 0, 255)

    lb2 = LutBatch()
    lb2.req("d_c1d", c1d2_d)
    lb2.req("dbc_c1d", c1d2_dbc)
    lb2.req("ad01_a1d", [a1d2_01])
    lb2.req("ad10_a1d", [a1d2_10])
    lb2.req("lad_l1d", [l1d2])
    lb2.req("lad_a1d", [laa1d2])
    lb2.req("rgbs_s", [scale_idx])
    lb2.resolve(lut)

    # ===================== phase 3: finalize every trial =====================
    delta_ok_quant = qidx <= (18 - ise.QUANT_6)

    c1de_d = [lb2.hi("d_c1d", i) for i in range(4)]
    ok_d = _rgbdelta_phase3_rows(ok_d, c0be_d, c1d2_d, c1de_d, False)
    c1de_dbc = [lb2.hi("dbc_c1d", i) for i in range(4)]
    ok_dbc = _rgbdelta_phase3_rows(ok_dbc, c0be_dbc, c1d2_dbc, c1de_dbc,
                                   True)
    a1de_01 = lb2.hi("ad01_a1d")
    ok_ad01 = _adelta_phase3_rows(ok_ad01, a0b2_01, a1d2_01, a1de_01)
    a0e_01 = lb.hi("ad01_a0b")
    a1de_10 = lb2.hi("ad10_a1d")
    ok_ad10 = _adelta_phase3_rows(ok_ad10, a0b2_10, a1d2_10, a1de_10)
    a0e_10 = lb.hi("ad10_a0b")

    c0i_bc = [lb.pick("bc_c0", i, rtn_b0[i], b0[i]) for i in range(4)]
    c1i_bc = [lb.pick("bc_c1", i, rtn_b1[i], b1[i]) for i in range(4)]
    ok_bc = ok_bc & (_sum3(c1i_bc) > _sum3(c0i_bc))
    e0_bc, e1_bc = c1i_bc, c0i_bc

    # quantize_rgb nudge: exact masked while-loop mirroring the reference
    # do-while with ACCUMULATED 0.2 nudges (astcenc_color_quantize.cpp:
    # 169-192) — bit-identical to color_pack._quantize_rgb. Each iteration
    # resolves 8 dynamic quantizer lookups against the in-VMEM LUT rows;
    # typical inputs are already ordered so the body runs at most once.
    def _nudge_quant(c0v, c1v):
        c0qi = [jnp.maximum(_rtn(c0v[i]), 0) for i in range(4)]
        c1qi = [jnp.minimum(_rtn(c1v[i]), 255) for i in range(4)]
        lo, hi = lut(c0qi + c1qi)
        c0i = [jnp.where((c0v[i] - c0qi[i].astype(f32)) >= -0.1,
                         hi[i], lo[i]) for i in range(4)]
        c1i = [jnp.where((c1v[i] - c1qi[i].astype(f32)) >= -0.1,
                         hi[4 + i], lo[4 + i]) for i in range(4)]
        return c0i, c1i

    c0i0, c1i0 = _nudge_quant(c0, c1)
    done0 = (_sum3(c0i0) <= _sum3(c1i0))

    # The done mask rides the loop carry as int32, not bool: Mosaic cannot
    # legalize scf.yield of an i1 vector whose layout diverges from the
    # loop's expected tiled layout ("failed to legalize operation
    # 'scf.yield'" on v5e), while i32 carries are fine.
    def nudge_cond(carry):
        return ~jnp.all(carry[0] != 0)

    def nudge_body(carry):
        done, it = carry[0] != 0, carry[1]
        c0v = list(carry[2:6])
        c1v = list(carry[6:10])
        o0 = list(carry[10:14])
        o1 = list(carry[14:18])
        c0n = [jnp.where(done, c0v[i], c0v[i] - f32(0.2)) for i in range(4)]
        c1n = [jnp.where(done, c1v[i], c1v[i] + f32(0.2)) for i in range(4)]
        c0i, c1i = _nudge_quant(c0n, c1n)
        ok = (_sum3(c0i) <= _sum3(c1i)) | (it >= 2048)
        newly = ok & ~done
        o0 = [jnp.where(newly, c0i[i], o0[i]) for i in range(4)]
        o1 = [jnp.where(newly, c1i[i], o1[i]) for i in range(4)]
        return tuple([(done | ok).astype(jnp.int32), it + 1]
                     + c0n + c1n + o0 + o1)

    init = tuple([done0.astype(jnp.int32), jnp.zeros_like(rtn_a0)]
                 + list(c0) + list(c1) + c0i0 + c1i0)
    fin = jax.lax.while_loop(nudge_cond, nudge_body, init)
    e0q = list(fin[10:14])
    e1q = list(fin[14:18])

    a0q = lb.pick("res_a0", 0, rtn_a0, a0f)
    a1q = lb.pick("res_a1", 0, rtn_a1, a1f)
    s_rgbs = lb2.hi("rgbs_s")
    rgbs_vals = [q_rgbs[0], q_rgbs[1], q_rgbs[2], s_rgbs]
    l0q = lb.pick("lum0", 0, _rtn(lum0s), lum0s)
    l1q = lb.pick("lum1", 0, _rtn(lum1s), lum1s)
    la_l0 = lb.pick("la_l0", 0, rtn_l0, lum0)
    la_l1 = lb.pick("la_l1", 0, rtn_l1, lum1)

    # --------------- FMT_RGB / FMT_RGBA trial-order selection ---------------
    def run_trials(with_alpha: bool):
        zero = jnp.zeros_like(rtn_a0)
        best_err = jnp.zeros_like(a0f) + _BIG
        best_fmt = zero
        out0 = [zero] * 4
        out1 = [zero] * 4

        def consider(ok, fmt_id, e0, e1, unpack_delta):
            nonlocal best_err, best_fmt, out0, out1
            if unpack_delta:
                u0, u1 = _rgba_delta_unpack_rows(e0, e1)
            else:
                u0, u1 = _rgba_unpack_rows(e0, e1)
            if not with_alpha:
                u0 = u0[:3] + [jnp.zeros_like(u0[3]) + 255]
                u1 = u1[:3] + [jnp.zeros_like(u1[3]) + 255]
            err = _encoding_error_rows(c0, c1, u0, u1)
            take = ok & (err < best_err)
            best_err = jnp.where(take, err, best_err)
            best_fmt = jnp.where(take, fmt_id, best_fmt)
            out0 = [jnp.where(take, e0[i], out0[i]) for i in range(4)]
            out1 = [jnp.where(take, e1[i], out1[i]) for i in range(4)]

        if with_alpha:
            e0d = c0be_dbc[:3] + [a0e_10]
            e1d = c1de_dbc[:3] + [a1de_10]
            consider(ok_dbc & ok_ad10 & delta_ok_quant,
                     cuq.FMT_RGBA_DELTA, e0d, e1d, True)
            e0d = c0be_d[:3] + [a0e_01]
            e1d = c1de_d[:3] + [a1de_01]
            consider(ok_d & ok_ad01 & delta_ok_quant,
                     cuq.FMT_RGBA_DELTA, e0d, e1d, True)
            e0b = e0_bc[:3] + [a1q]   # alpha swaps with blue contract
            e1b = e1_bc[:3] + [a0q]
            consider(ok_bc & (qidx < 16), cuq.FMT_RGBA, e0b, e1b, False)
            e0n = e0q[:3] + [a0q]
            e1n = e1q[:3] + [a1q]
            u0, u1 = _rgba_unpack_rows(e0n, e1n)
            err = _encoding_error_rows(c0, c1, u0, u1)
            take = (err < best_err) | (best_err >= _BIG)
            best_fmt = jnp.where(take, cuq.FMT_RGBA, best_fmt)
            out0 = [jnp.where(take, e0n[i], out0[i]) for i in range(4)]
            out1 = [jnp.where(take, e1n[i], out1[i]) for i in range(4)]
            vals = [out0[0], out1[0], out0[1], out1[1],
                    out0[2], out1[2], out0[3], out1[3]]
        else:
            consider(ok_dbc & delta_ok_quant, cuq.FMT_RGB_DELTA,
                     c0be_dbc, c1de_dbc, True)
            consider(ok_d & delta_ok_quant, cuq.FMT_RGB_DELTA,
                     c0be_d, c1de_d, True)
            consider(ok_bc & (qidx < 16), cuq.FMT_RGB, e0_bc, e1_bc, False)
            u0, u1 = _rgba_unpack_rows(e0q, e1q)
            u0 = u0[:3] + [jnp.zeros_like(u0[3]) + 255]
            u1 = u1[:3] + [jnp.zeros_like(u1[3]) + 255]
            err = _encoding_error_rows(c0, c1, u0, u1)
            take = (err < best_err) | (best_err >= _BIG)
            best_fmt = jnp.where(take, cuq.FMT_RGB, best_fmt)
            out0 = [jnp.where(take, e0q[i], out0[i]) for i in range(4)]
            out1 = [jnp.where(take, e1q[i], out1[i]) for i in range(4)]
            vals = [out0[0], out1[0], out0[1], out1[1],
                    out0[2], out1[2], zero, zero]
        return best_fmt, vals

    fmt_rgb, vals_rgb = run_trials(False)
    fmt_rgba, vals_rgba = run_trials(True)

    zero = jnp.zeros_like(rtn_a0)
    vals_rgbs = rgbs_vals + [zero] * 4
    vals_rgbsa = rgbs_vals + [a0q, a1q, zero, zero]

    # luminance+alpha: delta variant when every channel-delta check passes
    la_ok = ok_ladl & ok_lada
    l0e_la = lb.hi("lad_l0b")
    l1e_la = lb2.hi("lad_l1d")
    la_ok = _adelta_phase3_rows(la_ok, l0b2, l1d2, l1e_la)
    a0e_la = lb.hi("lad_a0b")
    a1e_la = lb2.hi("lad_a1d")
    la_ok = _adelta_phase3_rows(la_ok, laa0b2, laa1d2, a1e_la)
    la_ok &= qidx <= (18 - ise.QUANT_6)
    fmt_la = jnp.where(la_ok, cuq.FMT_LUMINANCE_ALPHA_DELTA,
                       cuq.FMT_LUMINANCE_ALPHA)
    vals_la = [jnp.where(la_ok, l0e_la, la_l0),
               jnp.where(la_ok, l1e_la, la_l1),
               jnp.where(la_ok, a0e_la, a0q),
               jnp.where(la_ok, a1e_la, a1q)] + [zero] * 4

    vals_lum = [l0q, l1q] + [zero] * 6

    cases = [
        (cuq.FMT_RGB, fmt_rgb, vals_rgb),
        (cuq.FMT_RGBA, fmt_rgba, vals_rgba),
        (cuq.FMT_RGB_SCALE, zero + cuq.FMT_RGB_SCALE, vals_rgbs),
        (cuq.FMT_RGB_SCALE_ALPHA, zero + cuq.FMT_RGB_SCALE_ALPHA,
         vals_rgbsa),
        (cuq.FMT_LUMINANCE, zero + cuq.FMT_LUMINANCE, vals_lum),
        (cuq.FMT_LUMINANCE_ALPHA, fmt_la, vals_la),
    ]
    out_fmt = zero + cuq.FMT_LUMINANCE
    out_vals = list(vals_lum)
    for req_id, fmt_v, vals_v in cases:
        m = req_fmt == req_id
        out_fmt = jnp.where(m, fmt_v, out_fmt)
        out_vals = [jnp.where(m, vals_v[i], out_vals[i]) for i in range(8)]
    return out_fmt, out_vals
