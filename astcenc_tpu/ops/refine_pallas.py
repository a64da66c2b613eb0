"""Fused candidate-refinement round (Pallas/Mosaic TPU).

One refinement round of the 1-plane search — trial error of the incoming
weight grid, the parity-class realign sweep, trial error of the realigned
grid, and the infill the next round's least-squares refit needs — runs as a
single kernel over a block tile, with the per-decimation stencils resident
in VMEM.

Why: in the XLA formulation each of these steps materializes
(N*C, texels, weights)-shaped stencil selections and (N*C, texels, 4)
per-texel endpoint tensors in HBM (0.5-1 GB per trial pass at production
batch sizes); the encoder is HBM-bound, and these tensors are pure
rematerializable functions of a handful of per-block scalars.

Layout: everything in the kernel is **feature-major with the block batch on
the 128-lane axis** — per-texel planes are (T, BT), per-weight planes are
(W, BT), stencil rows are (T, W, BT). This is the TPU analog of the
reference's SoA-over-SIMD-lanes design (astcenc_vecmathlib.h): small
feature dims land on sublanes (8-padded) instead of lanes (128-padded), so
VPU utilization is near-dense where a block-major layout wastes 3.5x+ on
lane padding. Per-block stencils are built by one MXU matmul against the
(T*W, D) master (bf16 exact: stencil payloads are 4-bit fractions / 5-bit
ints) and a free major-dim reshape, replacing a D-step select chain.

Numerics: trial errors are bit-identical to codec/trial.trial_error_1plane
(all-integer f32 arithmetic below 2^24); realign SA/SB/SC sums are f32 with
a different (but fixed) reduction order than the XLA einsums, matching the
reference's tolerance class (the reference's own SIMD reductions reorder
too — astcenc_compress_symbolic.cpp:260-339).

Interface: one (B, 384) int32 "meta" operand
  [0:64 weight grid | 64 dec-mode | 65 weight-quant | 66 alive |
   128:144 ep0 (p*4+c) | 144:160 ep1 | 256:256+T partition-of-texel]
and one (B, 512) f32 texel operand (channel planes at 128-lane strides);
the wrapper transposes to feature-major around the call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_pallas import _interpret, kernel_bt

from ..tables import ise

_BIG = 1e30                        # ERROR_CALC_DEFAULT


# ---------------------------------------------------------------------------
# Packed-operand row layout. Every kernel in this family reads texels from
# a feature-major operand with the four channel planes at a fixed row
# stride. T <= 125 keeps the historical 128-row stride / 512-row operand
# (alpha scale on spare row 511); bigger blocks (12x12 T=144, 3D) get an
# 8-aligned stride with an 8-row tail whose first row carries the alpha
# scale.
# ---------------------------------------------------------------------------

def tex_stride(T: int) -> int:
    """Per-channel row stride in the packed texel operand."""
    return 128 if T <= 125 else (T + 7) & ~7


def tex_rows(T: int) -> int:
    """Total rows of the packed texel operand."""
    return 512 if T <= 125 else 4 * tex_stride(T) + 8


def asr_row(T: int) -> int:
    """Row carrying the per-block alpha scale (USE_ALPHA_WEIGHT)."""
    return 511 if T <= 125 else 4 * tex_stride(T)


def meta_rows(T: int) -> int:
    """Rows of the int32 meta operand; partition-of-texel lives at row
    base 256, so the operand grows with the texel count."""
    return 384 if T <= 128 else 256 + ((T + 7) & ~7)


def _err_from_colors(colors, texp, cw, rgbm_scale: float):
    """Summed per-texel trial error from decoded channel planes.

    rgbm_scale > 0 selects the RGBM perceptual metric with M==0 candidate
    rejection (reference: astcenc_decompress_symbolic.cpp:366-400);
    multiply order matches codec/trial._rgbm_trial_error bit-for-bit."""
    if rgbm_scale:
        scale = jnp.float32(rgbm_scale)
        m = colors[3]
        m_zero = jnp.max(jnp.where(m == 0.0, 1.0, 0.0), axis=0,
                         keepdims=True)
        errt = None
        for ch in range(3):
            dec = colors[ch] * m * scale
            org = texp[ch] * texp[3] * scale
            dd = jnp.minimum(jnp.abs(org - dec), 1e15)
            term = dd * dd * cw[ch]
            errt = term if errt is None else errt + term
        errt = jnp.minimum(errt, _BIG)
        err = jnp.sum(errt, axis=0, keepdims=True)
        return jnp.where(m_zero > 0.0, jnp.float32(_BIG), err)
    errt = None
    for ch in range(4):
        dd = jnp.minimum(jnp.abs(texp[ch] - colors[ch]), 1e15)
        term = dd * dd * cw[ch]
        errt = term if errt is None else errt + term
    errt = jnp.minimum(errt, _BIG)
    return jnp.sum(errt, axis=0, keepdims=True)


def _cat(pieces):
    """Row-concatenate, dropping zero-row pads (T == stride cases)."""
    pieces = [p for p in pieces if p.shape[0]]
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, 0)


def _sublane_gather2(tab_a, tab_b, idx):
    """out_a[k, b] = tab_a[idx[k, b], b] (and same for tab_b), using the
    8-row sublane hardware gather: for each 8-row group of indices, gather
    from each 8-row chunk of the tables and keep the in-range chunk.
    tab_a/tab_b: (V, BT) f32 (same V); idx: (K, BT) int32 in [0, V)."""
    V, BT = tab_a.shape
    K = idx.shape[0]
    Kp = (K + 7) & ~7
    if Kp > K:
        idx = jnp.concatenate([idx, jnp.zeros((Kp - K, BT), jnp.int32)], 0)
    nchunk = (V + 7) // 8
    if V % 8:
        zpad = jnp.zeros((8 - V % 8, BT), tab_a.dtype)
        tab_a = jnp.concatenate([tab_a, zpad], 0)
        tab_b = None if tab_b is None else jnp.concatenate([tab_b, zpad], 0)
    outs_a = []
    outs_b = []
    for g in range(Kp // 8):
        i8 = idx[8 * g:8 * g + 8, :]
        acc_a = None
        acc_b = None
        for c in range(nchunk):
            rel = i8 - 8 * c
            relc = jnp.clip(rel, 0, 7)
            ga = jnp.take_along_axis(tab_a[8 * c:8 * c + 8, :], relc, axis=0)
            gb = (None if tab_b is None else jnp.take_along_axis(
                tab_b[8 * c:8 * c + 8, :], relc, axis=0))
            if acc_a is None:
                acc_a, acc_b = ga, gb
            else:
                inb = (rel >= 0) & (rel < 8)
                acc_a = jnp.where(inb, ga, acc_a)
                acc_b = None if gb is None else jnp.where(inb, gb, acc_b)
        outs_a.append(acc_a)
        outs_b.append(acc_b)
    out_a = outs_a[0] if len(outs_a) == 1 else jnp.concatenate(outs_a, 0)
    if tab_b is None:
        return out_a[:K], None
    out_b = outs_b[0] if len(outs_b) == 1 else jnp.concatenate(outs_b, 0)
    return out_a[:K], out_b[:K]


def _pn_gather(wg, dn_tab, up_tab):
    """Per-slot prev/next weight lookup: sublane gather instead of a
    65-step select chain (values are 0..64 by construction)."""
    dn, up = _sublane_gather2(dn_tab, up_tab, wg.astype(jnp.int32))
    return dn, up


def _texp(tex_ref, T: int):
    ts = tex_stride(T)
    return [tex_ref[ch * ts:ch * ts + T, :] for ch in range(4)]


def _asr_cw(tex_ref, T: int, cw):
    """Per-block alpha-scaled channel weights (USE_ALPHA_WEIGHT): the
    scale rides the spare row after the channel planes."""
    r = asr_row(T)
    asr = tex_ref[r:r + 1, :]
    return (cw[0] * asr, cw[1] * asr, cw[2] * asr,
            jnp.full_like(asr, jnp.float32(cw[3])))


def _refine_kernel(meta_ref, tex_ref, si_tdw_ref, sf_tdw_ref, sf_wdt_ref,
                   ssq_wdt_ref, sind_wdt_ref, dmc_ref, pn_ref,
                   oint_ref, of32_ref, *, T: int, W: int, D: int,
                   ncolors: int, u8_mask: bool, cw: tuple,
                   has_asr: bool = False, rgbm_scale: float = 0.0):
    meta = meta_ref[:]                             # (384, BT) int32
    BT = meta.shape[1]
    w64 = meta[0:W, :].astype(jnp.float32)         # (W, BT) weight grid
    d_row = meta[64:65, :]                         # (1, BT) decimation mode
    wq_row = meta[65:66, :]                        # (1, BT) weight quant
    pot = meta[256:256 + T, :]                     # (T, BT)

    f32 = jnp.float32

    # MXU stencil contractions (see _trial1_full_kernel): no (T, W, BT)
    # stencil tensor ever materializes, which is what admits T=216.
    oh_d = (jax.lax.broadcasted_iota(jnp.int32, (D, BT), 0)
            == d_row).astype(jnp.bfloat16)
    oh_f = oh_d.astype(f32)

    def dot_tdw_i(vec_w):
        x = (oh_d[:, None, :]
             * vec_w.astype(jnp.bfloat16)[None, :, :]).reshape(D * W, BT)
        return jnp.dot(si_tdw_ref[:], x, preferred_element_type=f32)

    def dot_tdw_f(vec_w):
        x = (oh_d[:, None, :]
             * vec_w.astype(jnp.bfloat16)[None, :, :]).reshape(D * W, BT)
        return jnp.dot(sf_tdw_ref[:], x, preferred_element_type=f32)

    def dot_wdt(master_ref, vec_t):
        hi = vec_t.astype(jnp.bfloat16)
        lo = (vec_t - hi.astype(f32)).astype(jnp.bfloat16)
        m = master_ref[:]

        def ex(v):
            return (oh_d[:, None, :] * v[None, :, :]).reshape(D * T, BT)

        return (jnp.dot(m, ex(hi), preferred_element_type=f32)
                + jnp.dot(m, ex(lo), preferred_element_type=f32))

    # Per-texel endpoints, one (T, BT) plane per channel.
    ep0t = []
    ep1t = []
    for ch in range(4):
        a0 = None
        a1 = None
        for p in range(4):
            m = pot == p                           # (T, BT)
            e0 = meta[128 + p * 4 + ch:129 + p * 4 + ch, :].astype(f32)
            e1 = meta[144 + p * 4 + ch:145 + p * 4 + ch, :].astype(f32)
            t0 = jnp.where(m, e0, 0.0)
            t1 = jnp.where(m, e1, 0.0)
            a0 = t0 if a0 is None else a0 + t0
            a1 = t1 if a1 is None else a1 + t1
        ep0t.append(a0)
        ep1t.append(a1)

    texp = _texp(tex_ref, T)
    if has_asr:
        cw = _asr_cw(tex_ref, T, cw)
    TS = tex_stride(T)

    def trial_err(wgrid_f):
        s = dot_tdw_i(wgrid_f)                                 # (T, BT)
        infill = jnp.floor((8.0 + s) * (1.0 / 16.0))           # exact ints
        colors = []
        for ch in range(4):
            color = jnp.floor((ep0t[ch] * (64.0 - infill)
                               + ep1t[ch] * infill + 32.0) * (1.0 / 64.0))
            if u8_mask:
                color = jnp.floor(color * (1.0 / 256.0)) * 257.0
            colors.append(color)
        return _err_from_colors(colors, texp, cw, rgbm_scale)  # (1, BT)

    err_pre = trial_err(w64)

    if ncolors == 0:
        # Bootstrap mode: no realign — just the infill of the incoming grid
        # (round 0's least-squares refit input) and its trial error.
        undec0 = dot_tdw_f(w64) * (1.0 / 64.0)
        oint_ref[:] = _cat(
            [w64.astype(jnp.int32), jnp.zeros((128 - W, BT), jnp.int32)])
        of32_ref[:] = _cat(
            [undec0, jnp.zeros((TS - T, BT), f32), err_pre, err_pre,
             jnp.zeros((6, BT), f32)])
        return

    # --- realign sweep -----------------------------------------------------
    # Per-block parity class / validity / prev-next rows via MXU one-hot
    # matmuls (payloads <= 64, bf16-exact).
    dmc = jnp.dot(dmc_ref[:], oh_d, preferred_element_type=f32)  # (128, BT)
    color_of = dmc[0:W, :]
    wvalid = dmc[64:64 + W, :] != 0.0

    oh_q = (jax.lax.broadcasted_iota(jnp.int32, (12, BT), 0)
            == wq_row).astype(jnp.bfloat16)
    pn_rows = jnp.dot(pn_ref[:], oh_q, preferred_element_type=f32)
    dn_tab = pn_rows[0:65, :]                      # (65, BT)
    up_tab = pn_rows[128:193, :]

    # Value-indexed lookup of prev/next for each weight slot (the grid is
    # 0..64 by construction): 8-row sublane gathers.
    downf, upf = _pn_gather(w64, dn_tab, up_tab)

    offs = [(ep1t[ch] - ep0t[ch]) * (1.0 / 64.0) for ch in range(4)]
    C_t = None
    for ch in range(4):
        term = offs[ch] * offs[ch] * cw[ch]
        C_t = term if C_t is None else C_t + term
    SC = dot_wdt(ssq_wdt_ref, C_t)                         # (W, BT)

    infilled = dot_tdw_f(w64)                                  # (T, BT)
    wgrid = w64
    adjusted = jnp.zeros((1, BT), f32)

    for k in range(ncolors):
        A_t = None
        B_t = None
        for ch in range(4):
            color = ep0t[ch] + offs[ch] * infilled
            diff = color - texp[ch]
            ta = diff * diff * cw[ch]
            tb = diff * offs[ch] * cw[ch]
            A_t = ta if A_t is None else A_t + ta
            B_t = tb if B_t is None else B_t + tb
        SA = dot_wdt(sind_wdt_ref, A_t)                        # (W, BT)
        SB = dot_wdt(sf_wdt_ref, B_t)

        d_dn = downf - wgrid
        d_up = upf - wgrid
        e_base = SA
        e_dn = SA + 2.0 * d_dn * SB + d_dn * d_dn * SC
        e_up = SA + 2.0 * d_up * SB + d_up * d_up * SC

        ok = wvalid & (color_of == float(k))
        go_up = (e_up < e_base) & (e_up < e_dn) & (wgrid < 64.0) & ok
        go_dn = (~go_up) & (e_dn < e_base) & (wgrid > 0.0) & ok

        new_w = jnp.where(go_up, upf, jnp.where(go_dn, downf, wgrid))
        delta = new_w - wgrid
        infilled = infilled + dot_tdw_f(delta)
        wgrid = new_w
        changed = jnp.max(jnp.where(go_up | go_dn, 1.0, 0.0),
                          axis=0, keepdims=True)
        adjusted = jnp.maximum(adjusted, changed)
        # No prev/next refresh: each weight slot is updated at most once
        # (at its own parity class), and its lookup is consumed before that
        # update — the initial-wgrid lookup is exact for every class step.

    err_post = trial_err(wgrid)
    undec = dot_tdw_f(wgrid) * (1.0 / 64.0)

    oint_ref[:] = _cat(
        [wgrid.astype(jnp.int32),
         jnp.zeros((64 - W, BT), jnp.int32),
         adjusted.astype(jnp.int32),
         jnp.zeros((63, BT), jnp.int32)])

    of32_ref[:] = _cat(
        [undec, jnp.zeros((TS - T, BT), f32), err_pre, err_post,
         jnp.zeros((6, BT), f32)])


def _trial1_full_kernel(meta_ref, fmeta_ref, tex_ref, si_tdw_ref,
                        sf_tdw_ref, sf_wdt_ref, ssq_wdt_ref, sind_wdt_ref,
                        dmc_ref, pn_ref, lo_ref, hi_ref,
                        oint_ref, of32_ref, *, T: int, W: int, D: int,
                        ncolors: int, u8_mask: bool, cw: tuple, R: int,
                        pc: int, profile: int, has_asr: bool = False,
                        rgbm_scale: float = 0.0):
    """All R refinement rounds of a 1-plane trial in one kernel: infill ->
    least-squares endpoint refit -> LDR color pack -> decode -> trial
    errors + parity-class realign, with every intermediate in VMEM.

    Every stencil reduction runs on the MXU: sum_w S_d[t,w]*v[w] and
    sum_t S_d[t,w]*v[t] become matmuls of the static (T, D*W) / (W, D*T)
    masters against a one-hot (d) expand of the per-block vector — the
    (T, W, BT) stencil tensors of the earlier formulation (the kernel's
    VMEM + VPU hot spot) never materialize. Integer-payload contractions
    (trial-error infill, weight undecimation) are exact: both sides are
    bf16-representable ints/4-bit fractions with f32 accumulation. The
    realign SA/SB/SC sums contract f32 error terms at Precision.HIGHEST;
    their reduction order differs from the VPU formulation but stays in
    the same tolerance class (see module docstring).

    meta rows: [0:W wgrid0 | 64 dec-mode | 65 weight-quant | 66 alive |
    67 cq | 68 cq_mod | 72:76 fmt_req per partition | 256:256+T pot];
    fmeta rows: [0:16 ideal ep0 (p*4+c) | 16:32 ideal ep1] f32.
    Outputs per round r at row base 128*r of oint:
    [0:4 fmt | 4:36 vals (p*8+i) | 36 use_q | 37 matched | 64:64+W wgrid];
    of32 rows: [0 err_pre(r0) | 1+r err_post(r)] (alive-masked).
    """
    from . import rowops

    meta = meta_ref[:]
    fmeta = fmeta_ref[:]
    BT = meta.shape[1]
    f32 = jnp.float32
    wgrid = meta[0:W, :].astype(f32)
    d_row = meta[64:65, :]
    wq_row = meta[65:66, :]
    alive = meta[66:67, :] != 0
    cq = meta[67:68, :]
    cqm = meta[68:69, :]
    fmt_req = [meta[72 + p:73 + p, :] for p in range(pc)]
    pot = meta[256:256 + T, :]

    oh_d = (jax.lax.broadcasted_iota(jnp.int32, (D, BT), 0)
            == d_row).astype(jnp.bfloat16)
    oh_f = oh_d.astype(f32)

    def dot_tdw_i(vec_w):
        """sum_w int-stencil_d[t,w] * vec[w] -> (T, BT); exact."""
        x = (oh_d[:, None, :]
             * vec_w.astype(jnp.bfloat16)[None, :, :]).reshape(D * W, BT)
        return jnp.dot(si_tdw_ref[:], x, preferred_element_type=f32)

    def dot_tdw_f(vec_w):
        """sum_w frac-stencil_d[t,w] * vec[w] -> (T, BT); exact."""
        x = (oh_d[:, None, :]
             * vec_w.astype(jnp.bfloat16)[None, :, :]).reshape(D * W, BT)
        return jnp.dot(sf_tdw_ref[:], x, preferred_element_type=f32)

    def dot_wdt(master_ref, vec_t):
        """sum_t stencil_d[t,w] * vec[t] -> (W, BT) for f32 error terms:
        two bf16 passes with a hi/lo split of the vector. The master side
        is bf16-exact (stencil payloads), so each product is exact and the
        result carries ~2^-16 relative error — realign decisions flip only
        on ties that are already noise-level (vs 6 passes for
        Precision.HIGHEST, measured 3x slower end-to-end)."""
        hi = vec_t.astype(jnp.bfloat16)
        lo = (vec_t - hi.astype(f32)).astype(jnp.bfloat16)
        m = master_ref[:]

        def ex(v):
            return (oh_d[:, None, :] * v[None, :, :]).reshape(D * T, BT)

        return (jnp.dot(m, ex(hi), preferred_element_type=f32)
                + jnp.dot(m, ex(lo), preferred_element_type=f32))

    texp = _texp(tex_ref, T)
    if has_asr:
        cw = _asr_cw(tex_ref, T, cw)

    qidx = jnp.clip(cq - ise.QUANT_6, 0, 16)
    if pc >= 2:
        qidxm = jnp.clip(cqm - ise.QUANT_6, 0, 16)
        lut = _make_lut(qidx, lo_ref, hi_ref, qidxm_row=qidxm, pc=pc)
    else:
        lut = _make_lut(qidx, lo_ref, hi_ref, pc=pc)

    # Realign invariants (d- and wq-dependent only).
    dmc = jnp.dot(dmc_ref[:], oh_d, preferred_element_type=f32)
    color_of = dmc[0:W, :]
    wvalid = dmc[64:64 + W, :] != 0.0
    oh_q = (jax.lax.broadcasted_iota(jnp.int32, (12, BT), 0)
            == wq_row).astype(jnp.bfloat16)
    pn_rows = jnp.dot(pn_ref[:], oh_q, preferred_element_type=f32)
    dn_tab = pn_rows[0:65, :]
    up_tab = pn_rows[128:193, :]

    # Partition-stacked prev endpoints: [ch] -> (pc, BT).
    ep0_c = [_cat([fmeta[p * 4 + ch:p * 4 + ch + 1, :] for p in range(pc)])
             for ch in range(4)]
    ep1_c = [_cat([fmeta[16 + p * 4 + ch:17 + p * 4 + ch, :]
                   for p in range(pc)]) for ch in range(4)]

    def part_sel(rows_s):
        """[ch] -> (pc, BT) stacked rows -> per-texel (T, BT) planes."""
        out = []
        for ch in range(4):
            acc = None
            for p in range(pc):
                t = jnp.where(pot == p, rows_s[ch][p:p + 1, :].astype(f32),
                              0.0)
                acc = t if acc is None else acc + t
            out.append(acc)
        return out

    def trial_err(wgrid_f, ep0t, ep1t):
        s = dot_tdw_i(wgrid_f)
        infill = jnp.floor((8.0 + s) * (1.0 / 16.0))
        colors = []
        for ch in range(4):
            color = jnp.floor((ep0t[ch] * (64.0 - infill)
                               + ep1t[ch] * infill + 32.0) * (1.0 / 64.0))
            if u8_mask:
                color = jnp.floor(color * (1.0 / 256.0)) * 257.0
            colors.append(color)
        return _err_from_colors(colors, texp, cw, rgbm_scale)

    def pn_lookup(wg):
        return _pn_gather(wg, dn_tab, up_tab)

    def realign(wg, ep0t, ep1t):
        offs = [(ep1t[ch] - ep0t[ch]) * (1.0 / 64.0) for ch in range(4)]
        C_t = None
        for ch in range(4):
            term = offs[ch] * offs[ch] * cw[ch]
            C_t = term if C_t is None else C_t + term
        SC = dot_wdt(ssq_wdt_ref, C_t)
        downf, upf = pn_lookup(wg)
        infilled = dot_tdw_f(wg)
        wcur = wg
        adjusted = jnp.zeros((1, BT), f32)
        for k in range(ncolors):
            A_t = None
            B_t = None
            for ch in range(4):
                color = ep0t[ch] + offs[ch] * infilled
                diff = color - texp[ch]
                ta = diff * diff * cw[ch]
                tb = diff * offs[ch] * cw[ch]
                A_t = ta if A_t is None else A_t + ta
                B_t = tb if B_t is None else B_t + tb
            SA = dot_wdt(sind_wdt_ref, A_t)
            SB = dot_wdt(sf_wdt_ref, B_t)
            d_dn = downf - wcur
            d_up = upf - wcur
            e_dn = SA + 2.0 * d_dn * SB + d_dn * d_dn * SC
            e_up = SA + 2.0 * d_up * SB + d_up * d_up * SC
            ok = wvalid & (color_of == float(k))
            go_up = (e_up < SA) & (e_up < e_dn) & (wcur < 64.0) & ok
            go_dn = (~go_up) & (e_dn < SA) & (wcur > 0.0) & ok
            new_w = jnp.where(go_up, upf, jnp.where(go_dn, downf, wcur))
            delta = new_w - wcur
            infilled = infilled + dot_tdw_f(delta)
            wcur = new_w
            changed = jnp.max(jnp.where(go_up | go_dn, 1.0, 0.0),
                              axis=0, keepdims=True)
            adjusted = jnp.maximum(adjusted, changed)
        return wcur, adjusted

    oint_rows = []
    of32_rows = [None] * (R + 1)
    zero_i = jnp.zeros((1, BT), jnp.int32)

    fmt_req_s = _cat(fmt_req)                      # (pc, BT)
    if pc >= 2:
        # Stacked pack operands: sublanes [0:pc] = base quant, [pc:2pc] =
        # mod quant (cqm). ONE pack_ldr_rows call covers every
        # (partition, quant-variant) — the pack's scalar-row arithmetic is
        # the kernel's dominant op count and sublane stacking is free.
        req_G = _cat([fmt_req_s, fmt_req_s])
        qidx_G = _cat([qidx] * pc + [qidxm] * pc)
    else:
        req_G = fmt_req_s
        qidx_G = qidx

    for r in range(R):
        undec = dot_tdw_f(wgrid) * (1.0 / 64.0)
        ep0_c, ep1_c, rgbs = _recompute_1plane_rows(
            texp, pot, undec, cw, ep0_c, ep1_c, pc)

        if pc >= 2:
            ep0_G = [_cat([c, c]) for c in ep0_c]
            ep1_G = [_cat([c, c]) for c in ep1_c]
            rgbs_G = [_cat([c, c]) for c in rgbs]
        else:
            ep0_G, ep1_G, rgbs_G = ep0_c, ep1_c, rgbs
        fmt_G, vals_G = rowops.pack_ldr_rows(ep0_G, ep1_G, rgbs_G, req_G,
                                             qidx_G, lut)

        matched = jnp.zeros((1, BT), bool)
        use_q = cq
        fmt_s = fmt_G[:pc]
        vals_s = [v[:pc] for v in vals_G]
        if pc >= 2:
            fmt_m = fmt_G[pc:]
            all_same = cq != cqm
            all_same &= (jnp.max(fmt_s, axis=0, keepdims=True)
                         == jnp.min(fmt_s, axis=0, keepdims=True))
            same_mod = (jnp.max(fmt_m, axis=0, keepdims=True)
                        == jnp.min(fmt_m, axis=0, keepdims=True))
            matched = all_same & same_mod & (cqm >= 4)
            fmt_s = jnp.where(matched, fmt_m, fmt_s)
            vals_s = [jnp.where(matched, v[pc:], v[:pc]) for v in vals_G]
            use_q = jnp.where(matched, cqm, cq)

        e0s, e1s = rowops.unpack_ldr_rows(profile, fmt_s, vals_s)
        ep0t = part_sel(e0s)
        ep1t = part_sel(e1s)

        if r == 0:
            err_pre = trial_err(wgrid, ep0t, ep1t)
            of32_rows[0] = jnp.where(alive, err_pre, _BIG)

        new_w, adjusted = realign(wgrid, ep0t, ep1t)
        wgrid = jnp.where(alive, new_w, wgrid)
        err_post = trial_err(wgrid, ep0t, ep1t)
        of32_rows[1 + r] = jnp.where(alive, err_post, _BIG)
        alive = alive & (adjusted != 0.0)

        rrows = [fmt_s]
        if pc < 4:
            rrows += [jnp.zeros((4 - pc, BT), jnp.int32)]
        for p in range(4):
            if p < pc:
                rrows += [v[p:p + 1] for v in vals_s]
            else:
                rrows += [zero_i] * 8
        rrows += [use_q, matched.astype(jnp.int32)]
        rrows += [zero_i] * (64 - 38)
        rrows.append(wgrid.astype(jnp.int32))      # (W, BT)
        pad_rows = 128 - 64 - W
        if pad_rows:
            rrows.append(jnp.zeros((pad_rows, BT), jnp.int32))
        oint_rows.append(jnp.concatenate(
            [x if x.ndim == 2 else x for x in rrows], axis=0))

    oint_ref[:] = jnp.concatenate(oint_rows, axis=0)
    of32_ref[:] = _cat(
        of32_rows + [jnp.zeros((8 - R - 1, BT), f32)])


@functools.partial(jax.jit,
                   static_argnums=(12, 13, 14, 15, 16, 17, 18, 19, 20, 21,
                                   22, 23))
def _trial1_full_call(metaT, fmetaT, texT, si_tdw, sf_tdw, sf_wdt,
                      ssq_wdt, sind_wdt, dmc, pn, lo, hi,
                      T: int, W: int, D: int, ncolors: int, u8_mask: bool,
                      cw: tuple, R: int, pc: int, profile: int, BT: int,
                      has_asr: bool = False, rgbm_scale: float = 0.0):
    B = metaT.shape[1]
    kern = functools.partial(_trial1_full_kernel, T=T, W=W, D=D,
                             ncolors=ncolors, u8_mask=u8_mask, cw=cw,
                             R=R, pc=pc, profile=profile, has_asr=has_asr,
                             rgbm_scale=rgbm_scale)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    consts = (si_tdw, sf_tdw, sf_wdt, ssq_wdt, sind_wdt, dmc, pn, lo, hi)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((128 * R, B), jnp.int32),
                   jax.ShapeDtypeStruct((8, B), jnp.float32)),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((metaT.shape[0], BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((texT.shape[0], BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [const_spec(c.shape) for c in consts],
        out_specs=(pl.BlockSpec((128 * R, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(metaT, fmetaT, texT, *consts)


def trial1_refine_full(tables: RefineTables, meta, fmeta, tex,
                       ncolors: int, u8_mask: bool, cw, R: int, pc: int,
                       profile: int, BT: int | None = None, cw_scale=None,
                       rgbm_scale: float = 0.0):
    """Run the full R-round 1-plane refinement in one fused kernel.

    Args:
      meta: (B, 384) int32 (pack_meta_full layout);
      fmeta: (B, 32) f32 ideal endpoints; tex: (B, 512) from pack_tex.

    Returns (fmt4 (R, B, 4), vals4 (R, B, 4, 8), use_q (R, B),
    matched (R, B) bool, wpost (R, B, W), err_pre (B,),
    err_post (R, B)) — already alive-masked errors.
    """
    B = meta.shape[0]
    if BT is None:
        BT = kernel_bt()
    if cw_scale is not None:
        tex = tex.at[:, asr_row(tables.T)].set(cw_scale.astype(jnp.float32))
    pad = (-B) % BT
    if pad:
        meta = jnp.pad(meta, ((0, pad), (0, 0)))
        fmeta = jnp.pad(fmeta, ((0, pad), (0, 0)))
        tex = jnp.pad(tex, ((0, pad), (0, 0)))
    oint, of32 = _trial1_full_call(
        meta.T, fmeta.T, tex.T, tables.si_tdw, tables.sf_tdw,
        tables.sf_wdt, tables.ssq_wdt, tables.sind_wdt, tables.dmc,
        tables.pn, tables.lo, tables.hi, tables.T, tables.W, tables.D,
        ncolors, u8_mask, tuple(float(c) for c in cw), R, pc, profile, BT,
        cw_scale is not None, float(rgbm_scale))
    oint = oint[:, :B]
    of32 = of32[:, :B]
    W = tables.W
    fmt4 = []
    vals4 = []
    useq = []
    match = []
    wpost = []
    for r in range(R):
        base = 128 * r
        fmt4.append(oint[base:base + 4, :].T)
        vals4.append(oint[base + 4:base + 36, :].T.reshape(B, 4, 8))
        useq.append(oint[base + 36, :])
        match.append(oint[base + 37, :] != 0)
        wpost.append(oint[base + 64:base + 64 + W, :].T)
    return (jnp.stack(fmt4), jnp.stack(vals4), jnp.stack(useq),
            jnp.stack(match), jnp.stack(wpost), of32[0, :],
            of32[1:1 + R, :])


def _trial2_full_kernel(meta_ref, fmeta_ref, tex_ref, si_tdw_ref,
                        sf_tdw_ref, sf_wdt_ref, ssq_wdt_ref, sind_wdt_ref,
                        dmc_ref, pn_ref, lo_ref, hi_ref,
                        oint_ref, of32_ref, *, T: int, W: int, D: int,
                        ncolors: int, u8_mask: bool, cw: tuple, R: int,
                        profile: int, has_asr: bool = False,
                        rgbm_scale: float = 0.0):
    """All R refinement rounds of a 2-plane single-partition trial in one
    kernel (see _trial1_full_kernel). meta rows: [0:W wg1 | 64 dec-mode |
    65 weight-quant | 66 alive | 67 cq | 68 fmt_req | 69 p2c |
    256:256+W wg2]; fmeta rows: [0:4 ep0 | 4:8 ep1 | 8:11 data_mean].
    oint per round at 256*r: [0 fmt | 4:12 vals | 64:64+W wg1 |
    128:128+W wg2]; of32: [0 err_pre(r0) | 1+r err_post]."""
    from . import rowops

    meta = meta_ref[:]
    fmeta = fmeta_ref[:]
    BT = meta.shape[1]
    f32 = jnp.float32
    wg1 = meta[0:W, :].astype(f32)
    wg2 = meta[256:256 + W, :].astype(f32)
    d_row = meta[64:65, :]
    wq_row = meta[65:66, :]
    alive = meta[66:67, :] != 0
    cq = meta[67:68, :]
    fmt_req = meta[68:69, :]
    p2c = meta[69:70, :]

    oh_d = (jax.lax.broadcasted_iota(jnp.int32, (D, BT), 0)
            == d_row).astype(jnp.bfloat16)
    oh_f = oh_d.astype(f32)

    # MXU stencil contractions; see _trial1_full_kernel for the scheme
    # and exactness argument.
    def dot_tdw_i(vec_w):
        x = (oh_d[:, None, :]
             * vec_w.astype(jnp.bfloat16)[None, :, :]).reshape(D * W, BT)
        return jnp.dot(si_tdw_ref[:], x, preferred_element_type=f32)

    def dot_tdw_f(vec_w):
        x = (oh_d[:, None, :]
             * vec_w.astype(jnp.bfloat16)[None, :, :]).reshape(D * W, BT)
        return jnp.dot(sf_tdw_ref[:], x, preferred_element_type=f32)

    def dot_wdt(master_ref, vec_t):
        hi = vec_t.astype(jnp.bfloat16)
        lo = (vec_t - hi.astype(f32)).astype(jnp.bfloat16)
        m = master_ref[:]

        def ex(v):
            return (oh_d[:, None, :] * v[None, :, :]).reshape(D * T, BT)

        return (jnp.dot(m, ex(hi), preferred_element_type=f32)
                + jnp.dot(m, ex(lo), preferred_element_type=f32))

    texp = _texp(tex_ref, T)
    if has_asr:
        cw = _asr_cw(tex_ref, T, cw)
    is_p2 = [p2c == ch for ch in range(4)]

    qidx = jnp.clip(cq - ise.QUANT_6, 0, 16)
    lut = _make_lut(qidx, lo_ref, hi_ref)

    dmc = jnp.dot(dmc_ref[:], oh_d, preferred_element_type=f32)
    color_of = dmc[0:W, :]
    wvalid = dmc[64:64 + W, :] != 0.0
    oh_q = (jax.lax.broadcasted_iota(jnp.int32, (12, BT), 0)
            == wq_row).astype(jnp.bfloat16)
    pn_rows = jnp.dot(pn_ref[:], oh_q, preferred_element_type=f32)
    dn_tab = pn_rows[0:65, :]
    up_tab = pn_rows[128:193, :]

    ep0_c = [fmeta[ch:ch + 1, :] for ch in range(4)]
    ep1_c = [fmeta[4 + ch:5 + ch, :] for ch in range(4)]
    mean3 = [fmeta[8 + ch:9 + ch, :] for ch in range(3)]

    ls_weight = cw[0] + cw[1] + cw[2]
    norm = jnp.sqrt(mean3[0] ** 2 + mean3[1] ** 2 + mean3[2] ** 2)
    nsafe = jnp.where(norm > 0, norm, 1.0)
    sd = [mean3[ch] / nsafe for ch in range(3)]
    scal = sd[0] * texp[0] + sd[1] * texp[1] + sd[2] * texp[2]
    scale_min = jnp.min(scal, axis=0, keepdims=True)
    scale_max = jnp.max(scal, axis=0, keepdims=True)
    rws = ([jnp.maximum(c * f32(T), f32(1e-17)) for c in cw]
           if has_asr else [max(float(c) * T, 1e-17) for c in cw])

    def infill_of(wg):
        return jnp.floor((8.0 + dot_tdw_i(wg)) * (1.0 / 16.0))

    def trial_err(w1, w2, ep0s, ep1s):
        i1 = infill_of(w1)
        i2 = infill_of(w2)
        colors = []
        for ch in range(4):
            w_ch = jnp.where(is_p2[ch], i2, i1)
            color = jnp.floor((ep0s[ch] * (64.0 - w_ch)
                               + ep1s[ch] * w_ch + 32.0) * (1.0 / 64.0))
            if u8_mask:
                color = jnp.floor(color * (1.0 / 256.0)) * 257.0
            colors.append(color)
        return _err_from_colors(colors, texp, cw, rgbm_scale)

    def pn_lookup(wg):
        return _pn_gather(wg, dn_tab, up_tab)

    def realign(wg, ep0s, ep1s, other_plane: bool):
        offs = []
        for ch in range(4):
            o = (ep1s[ch] - ep0s[ch]) * (1.0 / 64.0)
            if other_plane:
                o = jnp.where(is_p2[ch], o, 0.0)
            else:
                o = jnp.where(is_p2[ch], 0.0, o)
            offs.append(o)
        C_t = None
        for ch in range(4):
            t_b = jnp.broadcast_to(offs[ch] * offs[ch] * cw[ch], (T, BT))
            C_t = t_b if C_t is None else C_t + t_b
        SC = dot_wdt(ssq_wdt_ref, C_t)
        downf, upf = pn_lookup(wg)
        infilled = dot_tdw_f(wg)
        wcur = wg
        adjusted = jnp.zeros((1, BT), f32)
        for k in range(ncolors):
            A_t = None
            B_t = None
            for ch in range(4):
                color = ep0s[ch] + offs[ch] * infilled
                diff = color - texp[ch]
                ta = diff * diff * cw[ch]
                tb = diff * offs[ch] * cw[ch]
                A_t = ta if A_t is None else A_t + ta
                B_t = tb if B_t is None else B_t + tb
            SA = dot_wdt(sind_wdt_ref, A_t)
            SB = dot_wdt(sf_wdt_ref, B_t)
            d_dn = downf - wcur
            d_up = upf - wcur
            e_dn = SA + 2.0 * d_dn * SB + d_dn * d_dn * SC
            e_up = SA + 2.0 * d_up * SB + d_up * d_up * SC
            ok = wvalid & (color_of == float(k))
            go_up = (e_up < SA) & (e_up < e_dn) & (wcur < 64.0) & ok
            go_dn = (~go_up) & (e_dn < SA) & (wcur > 0.0) & ok
            new_w = jnp.where(go_up, upf, jnp.where(go_dn, downf, wcur))
            delta = new_w - wcur
            infilled = infilled + dot_tdw_f(delta)
            wcur = new_w
            changed = jnp.max(jnp.where(go_up | go_dn, 1.0, 0.0),
                              axis=0, keepdims=True)
            adjusted = jnp.maximum(adjusted, changed)
        return wcur, adjusted

    def recompute2(u1, u2):
        """recompute_ideal_colors_2planes, single partition, LDR."""
        nonlocal ep0_c, ep1_c

        # ones_t anchors the reduce operands to a concrete (T, BT) layout —
        # Mosaic otherwise infers a sublane-replicated layout for om*om and
        # fails the relayout ("non-singleton dimension replicated").
        ones_t = texp[0] * 0.0 + 1.0

        def lmr(idx):
            om = 1.0 - idx
            return (jnp.sum(ones_t * om * om, axis=0, keepdims=True),
                    jnp.sum(ones_t * om * idx, axis=0, keepdims=True),
                    jnp.sum(ones_t * idx * idx, axis=0, keepdims=True),
                    jnp.min(idx, axis=0, keepdims=True),
                    jnp.max(idx, axis=0, keepdims=True))

        l1, m1, r1, wmin1, wmax1 = lmr(u1)
        l2, m2, r2, wmin2, wmax2 = lmr(u2)

        cvy = []
        cvx = []
        for ch in range(4):
            cidx = jnp.where(is_p2[ch], u2, u1)
            cvy.append(jnp.sum(texp[ch] * cidx, axis=0, keepdims=True)
                       * cw[ch])
            cvx.append(jnp.sum(texp[ch] * (1.0 - cidx), axis=0,
                               keepdims=True) * cw[ch])

        om1 = 1.0 - u1
        sv0 = jnp.sum(om1 * scal, axis=0, keepdims=True) * ls_weight
        sv1 = jnp.sum(u1 * scal, axis=0, keepdims=True) * ls_weight

        scalediv = jnp.clip(scale_min / jnp.maximum(scale_max, 1e-10),
                            0.0, 1.0)
        sds = [sd[ch] * scale_max for ch in range(3)]

        avg = [(cvx[ch] + cvy[ch]) / rws[ch] for ch in range(4)]
        notnan = [~jnp.isnan(a) for a in avg]

        def solve(lsum, msum, rsum, ch):
            wch = cw[ch]
            left = lsum * wch
            middle = msum * wch
            right = rsum * wch
            det = left * right - middle * middle
            rdet = 1.0 / det
            mss = left * left + 2.0 * middle * middle + right * right
            e0 = (right * cvx[ch] - middle * cvy[ch]) * rdet
            e1 = (left * cvy[ch] - middle * cvx[ch]) * rdet
            ok = ((jnp.abs(det) > mss * 1e-4)
                  & ~jnp.isnan(e0) & ~jnp.isnan(e1))
            return e0, e1, ok

        allsame1 = wmin1 >= wmax1 * 0.999
        allsame2 = wmin2 >= wmax2 * 0.999
        ep0n = []
        ep1n = []
        for ch in range(4):
            e0f, e1f, okf = solve(l1, m1, r1, ch)
            e0f2, e1f2, okf2 = solve(l2, m2, r2, ch)
            p1m = ~is_p2[ch]
            take_same = allsame1 & p1m & notnan[ch]
            take_fit = ~allsame1 & p1m & okf
            a0 = jnp.where(take_same, avg[ch],
                           jnp.where(take_fit, e0f, ep0_c[ch]))
            a1 = jnp.where(take_same, avg[ch],
                           jnp.where(take_fit, e1f, ep1_c[ch]))
            take_same2 = allsame2 & is_p2[ch] & notnan[ch]
            take_fit2 = ~allsame2 & is_p2[ch] & okf2
            a0 = jnp.where(take_same2, avg[ch],
                           jnp.where(take_fit2, e0f2, a0))
            a1 = jnp.where(take_same2, avg[ch],
                           jnp.where(take_fit2, e1f2, a1))
            ep0n.append(a0)
            ep1n.append(a1)

        lm0 = l1 * ls_weight
        lm1 = m1 * ls_weight
        lm2 = r1 * ls_weight
        ls_det = lm0 * lm2 - lm1 * lm1
        ls_mss = lm0 * lm0 + 2.0 * lm1 * lm1 + lm2 * lm2
        se0 = (lm2 * sv0 - lm1 * sv1) / ls_det
        se1 = (lm0 * sv1 - lm1 * sv0) / ls_det
        ls_ok = ((jnp.abs(ls_det) > ls_mss * 1e-4)
                 & ~jnp.isnan(se0) & ~jnp.isnan(se1) & (se0 < se1))
        div1 = jnp.where(se1 != 0, se1, 1.0)
        rgbs = []
        for ch in range(3):
            base = jnp.where(ls_ok, sd[ch] * se1, sds[ch])
            rgbs.append(jnp.where(allsame1, sds[ch], base))
        s3 = jnp.where(ls_ok, se0 / div1, scalediv)
        rgbs.append(jnp.where(allsame1, jnp.ones_like(s3), s3))
        ep0_c = ep0n
        ep1_c = ep1n
        return rgbs

    oint_rows = []
    of32_rows = [None] * (R + 1)
    zero_i = jnp.zeros((1, BT), jnp.int32)

    for r in range(R):
        u1 = dot_tdw_f(wg1) * (1.0 / 64.0)
        u2 = dot_tdw_f(wg2) * (1.0 / 64.0)
        rgbs = recompute2(u1, u2)

        fmt_p, vals_p = rowops.pack_ldr_rows(
            ep0_c, ep1_c, rgbs, fmt_req, qidx, lut)
        e0, e1 = rowops.unpack_ldr_rows(profile, fmt_p, vals_p)
        ep0s = [e.astype(f32) for e in e0]
        ep1s = [e.astype(f32) for e in e1]

        if r == 0:
            err_pre = trial_err(wg1, wg2, ep0s, ep1s)
            of32_rows[0] = jnp.where(alive, err_pre, _BIG)

        nw1, adj1 = realign(wg1, ep0s, ep1s, other_plane=False)
        nw2, adj2 = realign(wg2, ep0s, ep1s, other_plane=True)
        wg1 = jnp.where(alive, nw1, wg1)
        wg2 = jnp.where(alive, nw2, wg2)
        adjusted = jnp.maximum(adj1, adj2)
        err_post = trial_err(wg1, wg2, ep0s, ep1s)
        of32_rows[1 + r] = jnp.where(alive, err_post, _BIG)
        alive = alive & (adjusted != 0.0)

        rrows = [fmt_p, zero_i, zero_i, zero_i]
        rrows += vals_p                             # 8 rows
        rrows += [jnp.zeros((64 - 12, BT), jnp.int32)]
        rrows += [wg1.astype(jnp.int32)]
        rrows += [jnp.zeros((64 - W, BT), jnp.int32)]
        rrows += [wg2.astype(jnp.int32)]
        rrows += [jnp.zeros((128 - 64 - W, BT), jnp.int32)]
        oint_rows.append(_cat(rrows))

    oint_ref[:] = jnp.concatenate(oint_rows, axis=0)
    of32_ref[:] = _cat(
        of32_rows + [jnp.zeros((8 - R - 1, BT), jnp.float32)])


@functools.partial(jax.jit,
                   static_argnums=(12, 13, 14, 15, 16, 17, 18, 19, 20, 21,
                                   22))
def _trial2_full_call(metaT, fmetaT, texT, si_tdw, sf_tdw, sf_wdt,
                      ssq_wdt, sind_wdt, dmc, pn, lo, hi,
                      T: int, W: int, D: int, ncolors: int, u8_mask: bool,
                      cw: tuple, R: int, profile: int, BT: int,
                      has_asr: bool = False, rgbm_scale: float = 0.0):
    B = metaT.shape[1]
    kern = functools.partial(_trial2_full_kernel, T=T, W=W, D=D,
                             ncolors=ncolors, u8_mask=u8_mask, cw=cw,
                             R=R, profile=profile, has_asr=has_asr,
                             rgbm_scale=rgbm_scale)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    consts = (si_tdw, sf_tdw, sf_wdt, ssq_wdt, sind_wdt, dmc, pn, lo, hi)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((192 * R, B), jnp.int32),
                   jax.ShapeDtypeStruct((8, B), jnp.float32)),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((metaT.shape[0], BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((texT.shape[0], BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [const_spec(c.shape) for c in consts],
        out_specs=(pl.BlockSpec((192 * R, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(metaT, fmetaT, texT, *consts)


def trial2_refine_full(tables: RefineTables, meta, fmeta, tex,
                       ncolors: int, u8_mask: bool, cw, R: int,
                       profile: int, BT: int | None = None, cw_scale=None,
                       rgbm_scale: float = 0.0):
    """Full R-round 2-plane refinement in one fused kernel.

    Returns (fmt (R, B), vals (R, B, 8), wg1 (R, B, W), wg2 (R, B, W),
    err_pre (B,), err_post (R, B)) — errors alive-masked.
    """
    B = meta.shape[0]
    if BT is None:
        BT = kernel_bt()
    if cw_scale is not None:
        tex = tex.at[:, asr_row(tables.T)].set(cw_scale.astype(jnp.float32))
    pad = (-B) % BT
    if pad:
        meta = jnp.pad(meta, ((0, pad), (0, 0)))
        fmeta = jnp.pad(fmeta, ((0, pad), (0, 0)))
        tex = jnp.pad(tex, ((0, pad), (0, 0)))
    oint, of32 = _trial2_full_call(
        meta.T, fmeta.T, tex.T, tables.si_tdw, tables.sf_tdw,
        tables.sf_wdt, tables.ssq_wdt, tables.sind_wdt, tables.dmc,
        tables.pn, tables.lo, tables.hi, tables.T, tables.W, tables.D,
        ncolors, u8_mask, tuple(float(c) for c in cw), R, profile, BT,
        cw_scale is not None, float(rgbm_scale))
    oint = oint[:, :B]
    of32 = of32[:, :B]
    W = tables.W
    fmt = []
    vals = []
    w1 = []
    w2 = []
    for r in range(R):
        base = 192 * r
        fmt.append(oint[base, :])
        vals.append(oint[base + 4:base + 12, :].T)
        w1.append(oint[base + 64:base + 64 + W, :].T)
        w2.append(oint[base + 128:base + 128 + W, :].T)
    return (jnp.stack(fmt), jnp.stack(vals), jnp.stack(w1), jnp.stack(w2),
            of32[0, :], of32[1:1 + R, :])


def pack_meta_full2(wg1, wg2, d_idx, wq, alive, cq, fmt_req, p2c):
    """(B, 384) meta for the 2-plane full-trial kernel."""
    B, W = wg1.shape
    meta = jnp.zeros((B, 384), jnp.int32)
    meta = meta.at[:, 0:W].set(wg1)
    meta = meta.at[:, 64].set(d_idx)
    meta = meta.at[:, 65].set(wq)
    meta = meta.at[:, 66].set(alive.astype(jnp.int32))
    meta = meta.at[:, 67].set(cq)
    meta = meta.at[:, 68].set(fmt_req)
    meta = meta.at[:, 69].set(p2c)
    meta = meta.at[:, 256:256 + W].set(wg2)
    return meta


def pack_meta_full(wgrid, d_idx, wq, alive, cq, cqm, fmt_req, pot, T: int):
    """(B, meta_rows(T)) meta for the full-trial kernel (fmt_req: (B, pc))."""
    B, W = wgrid.shape
    meta = jnp.zeros((B, meta_rows(T)), jnp.int32)
    meta = meta.at[:, 0:W].set(wgrid)
    meta = meta.at[:, 64].set(d_idx)
    meta = meta.at[:, 65].set(wq)
    meta = meta.at[:, 66].set(alive.astype(jnp.int32))
    meta = meta.at[:, 67].set(cq)
    meta = meta.at[:, 68].set(cqm)
    meta = meta.at[:, 72:72 + fmt_req.shape[1]].set(fmt_req)
    meta = meta.at[:, 256:256 + T].set(pot)
    return meta


def _refine2_kernel(meta_ref, tex_ref, si_tdw_ref, sf_tdw_ref,
                    sf_wdt_ref, ssq_wdt_ref, sind_wdt_ref, dmc_ref,
                    pn_ref,
                    oint_ref, of32_ref, *, T: int, W: int, D: int,
                    ncolors: int, u8_mask: bool, cw: tuple,
                    has_asr: bool = False, rgbm_scale: float = 0.0):
    """Two-plane single-partition variant: meta rows 0:W = plane-1 grid,
    256:256+W = plane-2 grid, row 67 = plane-2 component; both planes
    realign against the same stencil (reference realign_weights_decimated
    plane loop, astcenc_compress_symbolic.cpp:237-337)."""
    meta = meta_ref[:]                             # (384, BT) int32
    BT = meta.shape[1]
    w1 = meta[0:W, :].astype(jnp.float32)
    w2 = meta[256:256 + W, :].astype(jnp.float32)
    d_row = meta[64:65, :]
    wq_row = meta[65:66, :]
    p2c = meta[67:68, :]                           # (1, BT)

    f32 = jnp.float32
    oh_d = (jax.lax.broadcasted_iota(jnp.int32, (D, BT), 0)
            == d_row).astype(jnp.bfloat16)

    # MXU stencil contractions (see _trial1_full_kernel).
    def dot_tdw_i(vec_w):
        x = (oh_d[:, None, :]
             * vec_w.astype(jnp.bfloat16)[None, :, :]).reshape(D * W, BT)
        return jnp.dot(si_tdw_ref[:], x, preferred_element_type=f32)

    def dot_tdw_f(vec_w):
        x = (oh_d[:, None, :]
             * vec_w.astype(jnp.bfloat16)[None, :, :]).reshape(D * W, BT)
        return jnp.dot(sf_tdw_ref[:], x, preferred_element_type=f32)

    def dot_wdt(master_ref, vec_t):
        hi = vec_t.astype(jnp.bfloat16)
        lo = (vec_t - hi.astype(f32)).astype(jnp.bfloat16)
        m = master_ref[:]

        def ex(v):
            return (oh_d[:, None, :] * v[None, :, :]).reshape(D * T, BT)

        return (jnp.dot(m, ex(hi), preferred_element_type=f32)
                + jnp.dot(m, ex(lo), preferred_element_type=f32))

    # Single partition: endpoints broadcast per channel.
    ep0s = [meta[128 + ch:129 + ch, :].astype(f32) for ch in range(4)]
    ep1s = [meta[144 + ch:145 + ch, :].astype(f32) for ch in range(4)]
    texp = _texp(tex_ref, T)
    if has_asr:
        cw = _asr_cw(tex_ref, T, cw)
    is_p2 = [p2c == ch for ch in range(4)]         # (1, BT) each

    def infill_of(wg):
        return jnp.floor((8.0 + dot_tdw_i(wg)) * (1.0 / 16.0))  # (T, BT) exact ints

    def trial_err(wg1, wg2):
        i1 = infill_of(wg1)
        i2 = infill_of(wg2)
        colors = []
        for ch in range(4):
            w_ch = jnp.where(is_p2[ch], i2, i1)
            color = jnp.floor((ep0s[ch] * (64.0 - w_ch)
                               + ep1s[ch] * w_ch + 32.0) * (1.0 / 64.0))
            if u8_mask:
                color = jnp.floor(color * (1.0 / 256.0)) * 257.0
            colors.append(color)
        return _err_from_colors(colors, texp, cw, rgbm_scale)

    err_pre = trial_err(w1, w2)

    dmc = jnp.dot(dmc_ref[:], oh_d, preferred_element_type=f32)
    color_of = dmc[0:W, :]
    wvalid = dmc[64:64 + W, :] != 0.0
    oh_q = (jax.lax.broadcasted_iota(jnp.int32, (12, BT), 0)
            == wq_row).astype(jnp.bfloat16)
    pn_rows = jnp.dot(pn_ref[:], oh_q, preferred_element_type=f32)
    dn_tab = pn_rows[0:65, :]
    up_tab = pn_rows[128:193, :]

    def pn_lookup(wg):
        return _pn_gather(wg, dn_tab, up_tab)

    def realign(wg, other_plane: bool):
        """One plane's sweep; other_plane=False masks the p2c channel."""
        offs = []
        for ch in range(4):
            o = (ep1s[ch] - ep0s[ch]) * (1.0 / 64.0)
            if other_plane:
                o = jnp.where(is_p2[ch], o, 0.0)
            else:
                o = jnp.where(is_p2[ch], 0.0, o)
            offs.append(o)
        C_t = None
        for ch in range(4):
            t_b = jnp.broadcast_to(offs[ch] * offs[ch] * cw[ch], (T, BT))
            C_t = t_b if C_t is None else C_t + t_b
        SC = dot_wdt(ssq_wdt_ref, C_t)

        downf, upf = pn_lookup(wg)
        infilled = dot_tdw_f(wg)
        wgrid = wg
        adjusted = jnp.zeros((1, BT), f32)
        for k in range(ncolors):
            A_t = None
            B_t = None
            for ch in range(4):
                color = ep0s[ch] + offs[ch] * infilled
                diff = color - texp[ch]
                ta = diff * diff * cw[ch]
                tb = diff * offs[ch] * cw[ch]
                A_t = ta if A_t is None else A_t + ta
                B_t = tb if B_t is None else B_t + tb
            SA = dot_wdt(sind_wdt_ref, A_t)
            SB = dot_wdt(sf_wdt_ref, B_t)

            d_dn = downf - wgrid
            d_up = upf - wgrid
            e_base = SA
            e_dn = SA + 2.0 * d_dn * SB + d_dn * d_dn * SC
            e_up = SA + 2.0 * d_up * SB + d_up * d_up * SC

            ok = wvalid & (color_of == float(k))
            go_up = (e_up < e_base) & (e_up < e_dn) & (wgrid < 64.0) & ok
            go_dn = (~go_up) & (e_dn < e_base) & (wgrid > 0.0) & ok

            new_w = jnp.where(go_up, upf, jnp.where(go_dn, downf, wgrid))
            delta = new_w - wgrid
            infilled = infilled + dot_tdw_f(delta)
            wgrid = new_w
            changed = jnp.max(jnp.where(go_up | go_dn, 1.0, 0.0),
                              axis=0, keepdims=True)
            adjusted = jnp.maximum(adjusted, changed)
        return wgrid, adjusted

    nw1, adj1 = realign(w1, other_plane=False)
    nw2, adj2 = realign(w2, other_plane=True)
    adjusted = jnp.maximum(adj1, adj2)

    err_post = trial_err(nw1, nw2)
    u1 = dot_tdw_f(nw1) * (1.0 / 64.0)
    u2 = dot_tdw_f(nw2) * (1.0 / 64.0)

    oint_ref[:] = _cat(
        [nw1.astype(jnp.int32), jnp.zeros((64 - W, BT), jnp.int32),
         nw2.astype(jnp.int32), jnp.zeros((63 - W, BT), jnp.int32),
         adjusted.astype(jnp.int32)])

    TS = tex_stride(T)
    of32_ref[:] = _cat(
        [u1, jnp.zeros((TS - T, BT), f32),
         u2, jnp.zeros((TS - T, BT), f32), err_pre, err_post,
         jnp.zeros((6, BT), f32)])


def _refine2_boot_kernel(meta_ref, tex_ref, si_tdw_ref, sf_tdw_ref,
                         sf_wdt_ref, ssq_wdt_ref, sind_wdt_ref, dmc_ref,
                         pn_ref, oint_ref, of32_ref, *, T: int, W: int,
                         D: int, ncolors: int, u8_mask: bool, cw: tuple,
                         has_asr: bool = False, rgbm_scale: float = 0.0):
    """Bootstrap: infills of both incoming grids only."""
    meta = meta_ref[:]
    BT = meta.shape[1]
    w1 = meta[0:W, :].astype(jnp.float32)
    w2 = meta[256:256 + W, :].astype(jnp.float32)
    d_row = meta[64:65, :]
    f32 = jnp.float32
    oh_d = (jax.lax.broadcasted_iota(jnp.int32, (D, BT), 0)
            == d_row).astype(jnp.bfloat16)

    def dot_tdw_f(vec_w):
        x = (oh_d[:, None, :]
             * vec_w.astype(jnp.bfloat16)[None, :, :]).reshape(D * W, BT)
        return jnp.dot(sf_tdw_ref[:], x, preferred_element_type=f32)

    u1 = dot_tdw_f(w1) * (1.0 / 64.0)
    u2 = dot_tdw_f(w2) * (1.0 / 64.0)
    TS = tex_stride(T)
    oint_ref[:] = jnp.zeros((128, BT), jnp.int32)
    of32_ref[:] = _cat(
        [u1, jnp.zeros((TS - T, BT), f32),
         u2, jnp.zeros((TS - T, BT), f32), jnp.zeros((8, BT), f32)])


@functools.partial(jax.jit,
                   static_argnums=(9, 10, 11, 12, 13, 14, 15, 16, 17, 18))
def _refine2_call(metaT, texT, si_tdw, sf_tdw, sf_wdt, ssq_wdt, sind_wdt,
                  dmc, pn,
                  T: int, W: int, D: int, ncolors: int, u8_mask: bool,
                  cw: tuple, BT: int, boot: bool, has_asr: bool = False,
                  rgbm_scale: float = 0.0):
    B = metaT.shape[1]
    MR, XR = metaT.shape[0], texT.shape[0]
    FR = 2 * tex_stride(T) + 8
    body = _refine2_boot_kernel if boot else _refine2_kernel
    kern = functools.partial(body, T=T, W=W, D=D, ncolors=ncolors,
                             u8_mask=u8_mask, cw=cw, has_asr=has_asr,
                             rgbm_scale=rgbm_scale)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((128, B), jnp.int32),
                   jax.ShapeDtypeStruct((FR, B), jnp.float32)),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((MR, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XR, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            const_spec(si_tdw.shape),
            const_spec(sf_tdw.shape),
            const_spec(sf_wdt.shape),
            const_spec(ssq_wdt.shape),
            const_spec(sind_wdt.shape),
            const_spec(dmc.shape),
            const_spec(pn.shape),
        ],
        out_specs=(pl.BlockSpec((128, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((FR, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(metaT, texT, si_tdw, sf_tdw, sf_wdt, ssq_wdt, sind_wdt, dmc, pn)


def pack_meta_2plane(wg1, wg2, d_idx, wq, alive, p2c, ep0, ep1):
    """(B, 384) meta for the 2-plane kernel; ep0/ep1 are (B, 4) channel
    endpoints of the single partition."""
    B, W = wg1.shape
    meta = jnp.zeros((B, 384), jnp.int32)
    meta = meta.at[:, 0:W].set(wg1)
    meta = meta.at[:, 64].set(d_idx)
    meta = meta.at[:, 65].set(wq)
    meta = meta.at[:, 66].set(alive.astype(jnp.int32))
    meta = meta.at[:, 67].set(p2c)
    meta = meta.at[:, 128:132].set(ep0[:, :4])
    meta = meta.at[:, 144:148].set(ep1[:, :4])
    meta = meta.at[:, 256:256 + W].set(wg2)
    return meta


def refine_round_2plane(tables: RefineTables, meta, tex, ncolors: int,
                        u8_mask: bool, cw, BT: int | None = None, cw_scale=None,
                        rgbm_scale: float = 0.0):
    """One fused 2-plane refine round (ncolors=0 -> bootstrap infill only).

    Returns (nw1 (B, W) i32, nw2 (B, W) i32, adjusted (B,) bool,
    u1 (B, T) f32, u2 (B, T) f32, err_pre (B,), err_post (B,)).
    """
    B = meta.shape[0]
    if BT is None:
        BT = kernel_bt()
    if cw_scale is not None:
        tex = tex.at[:, asr_row(tables.T)].set(cw_scale.astype(jnp.float32))
    pad = (-B) % BT
    if pad:
        meta = jnp.pad(meta, ((0, pad), (0, 0)))
        tex = jnp.pad(tex, ((0, pad), (0, 0)))
    oint, of32 = _refine2_call(meta.T, tex.T, tables.si_tdw,
                               tables.sf_tdw, tables.sf_wdt,
                               tables.ssq_wdt, tables.sind_wdt,
                               tables.dmc, tables.pn, tables.T, tables.W,
                               tables.D, ncolors, u8_mask,
                               tuple(float(c) for c in cw), BT,
                               ncolors == 0, cw_scale is not None,
                               float(rgbm_scale))
    oint = oint[:, :B]
    of32 = of32[:, :B]
    W, T = tables.W, tables.T
    TS = tex_stride(T)
    return (oint[0:W, :].T, oint[64:64 + W, :].T, oint[127, :] != 0,
            of32[0:T, :].T, of32[TS:TS + T, :].T,
            of32[2 * TS, :], of32[2 * TS + 1, :])


@functools.partial(jax.jit,
                   static_argnums=(9, 10, 11, 12, 13, 14, 15, 16, 17))
def _refine_call(metaT, texT, si_tdw, sf_tdw, sf_wdt, ssq_wdt, sind_wdt,
                 dmc, pn,
                 T: int, W: int, D: int, ncolors: int, u8_mask: bool,
                 cw: tuple, BT: int, has_asr: bool = False,
                 rgbm_scale: float = 0.0):
    B = metaT.shape[1]
    MR, XR = metaT.shape[0], texT.shape[0]
    FR = tex_stride(T) + 8
    kern = functools.partial(_refine_kernel, T=T, W=W, D=D, ncolors=ncolors,
                             u8_mask=u8_mask, cw=cw, has_asr=has_asr,
                             rgbm_scale=rgbm_scale)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((128, B), jnp.int32),
                   jax.ShapeDtypeStruct((FR, B), jnp.float32)),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((MR, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((XR, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            const_spec(si_tdw.shape),
            const_spec(sf_tdw.shape),
            const_spec(sf_wdt.shape),
            const_spec(ssq_wdt.shape),
            const_spec(sind_wdt.shape),
            const_spec(dmc.shape),
            const_spec(pn.shape),
        ],
        out_specs=(pl.BlockSpec((128, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((FR, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(metaT, texT, si_tdw, sf_tdw, sf_wdt, ssq_wdt, sind_wdt, dmc, pn)


def _recompute_1plane_rows(texp, pot, undec, cw, ep0_prev, ep1_prev,
                           pc: int):
    """In-kernel recompute_ideal_colors_1plane (see ops/recompute.py; LDR
    paths only — no RGBO). texp: 4 x (T, BT); pot/undec: (T, BT);
    ep0_prev/ep1_prev: [ch] -> (pc, BT) with partitions stacked on the
    sublane axis. Only the masked (T, BT) reductions loop over partitions;
    all scalar-row arithmetic runs once on the stacked rows. Returns
    (ep0, ep1, rgbs) in the same stacked form."""
    f32 = jnp.float32
    ls_weight = cw[0] + cw[1] + cw[2]
    idx = undec
    om = 1.0 - idx
    big = 1e10

    # --- per-partition masked (T, BT) reductions, stacked to (pc, BT) -------
    tc_l, rsum_l, smin_l, smax_l, wmin_l, wmax_l = [], [], [], [], [], []
    l_l, m_l, r_l, cvy_l, cvx_l, sv0_l, sv1_l, sd_l = ([], [], [], [], [],
                                                       [], [], [])
    for p in range(pc):
        inp = (pot == p).astype(f32)               # (T, BT)
        tc = jnp.sum(inp, axis=0, keepdims=True)
        rws_p = [jnp.maximum(cw[ch] * tc, 1e-17) for ch in range(4)]
        rsum_p = [jnp.sum(inp * texp[ch], axis=0, keepdims=True) * cw[ch]
                  for ch in range(4)]
        mean_rgb = [rsum_p[ch] / rws_p[ch] for ch in range(3)]
        norm = jnp.sqrt(mean_rgb[0] ** 2 + mean_rgb[1] ** 2
                        + mean_rgb[2] ** 2)
        nsafe = jnp.where(norm > 0, norm, 1.0)
        sd_p = [mean_rgb[ch] / nsafe for ch in range(3)]
        scal = sd_p[0] * texp[0] + sd_p[1] * texp[1] + sd_p[2] * texp[2]

        tc_l.append(tc)
        rsum_l.append(rsum_p)
        sd_l.append(sd_p)
        smin_l.append(jnp.min(jnp.where(inp > 0, scal, big), axis=0,
                              keepdims=True))
        smax_l.append(jnp.max(jnp.where(inp > 0, scal, -big), axis=0,
                              keepdims=True))
        wmin_l.append(jnp.min(jnp.where(inp > 0, idx, 1.0), axis=0,
                              keepdims=True))
        wmax_l.append(jnp.max(jnp.where(inp > 0, idx, 0.0), axis=0,
                              keepdims=True))
        l_l.append(jnp.sum(inp * om * om, axis=0, keepdims=True))
        m_l.append(jnp.sum(inp * om * idx, axis=0, keepdims=True))
        r_l.append(jnp.sum(inp * idx * idx, axis=0, keepdims=True))
        cvy_l.append([jnp.sum(inp * texp[ch] * idx, axis=0, keepdims=True)
                      * cw[ch] for ch in range(4)])
        cvx_l.append([jnp.sum(inp * texp[ch] * om, axis=0, keepdims=True)
                      * cw[ch] for ch in range(4)])
        sv0_l.append(jnp.sum(inp * om * scal, axis=0, keepdims=True)
                     * ls_weight)
        sv1_l.append(jnp.sum(inp * idx * scal, axis=0, keepdims=True)
                     * ls_weight)

    tc = _cat(tc_l)                                # (pc, BT)
    rws = [jnp.maximum(cw[ch] * tc, 1e-17) for ch in range(4)]
    sd = [_cat([sd_l[p][ch] for p in range(pc)]) for ch in range(3)]
    scale_min = _cat(smin_l)
    scale_max = _cat(smax_l)
    wmin = _cat(wmin_l)
    wmax = _cat(wmax_l)
    left_s = _cat(l_l)
    middle_s = _cat(m_l)
    right_s = _cat(r_l)
    cvy = [_cat([cvy_l[p][ch] for p in range(pc)]) for ch in range(4)]
    cvx = [_cat([cvx_l[p][ch] for p in range(pc)]) for ch in range(4)]
    sv0 = _cat(sv0_l)
    sv1 = _cat(sv1_l)

    # --- stacked (pc, BT) solve ---------------------------------------------
    scalediv = jnp.clip(scale_min / jnp.maximum(scale_max, 1e-10), 0.0, 1.0)
    sds = [sd[ch] * scale_max for ch in range(3)]
    all_same = wmin >= wmax * 0.999

    ep0_out = [None] * 4
    ep1_out = [None] * 4
    rgbs_out = [None] * 4
    for ch in range(4):
        wch = cw[ch]
        left = left_s * wch
        middle = middle_s * wch
        right = right_s * wch
        det = left * right - middle * middle
        rdet = 1.0 / det
        mss = left * left + 2.0 * middle * middle + right * right
        e0f = (right * cvx[ch] - middle * cvy[ch]) * rdet
        e1f = (left * cvy[ch] - middle * cvx[ch]) * rdet
        det_ok = jnp.abs(det) > mss * 1e-4
        full = det_ok & ~(jnp.isnan(e0f) | jnp.isnan(e1f))
        ep0_fit = jnp.where(full, e0f, ep0_prev[ch])
        ep1_fit = jnp.where(full, e1f, ep1_prev[ch])

        avg = (cvx[ch] + cvy[ch]) / rws[ch]
        notnan = ~jnp.isnan(avg)
        ep0_same = jnp.where(notnan, avg, ep0_prev[ch])
        ep1_same = jnp.where(notnan, avg, ep1_prev[ch])

        ep0_out[ch] = jnp.where(all_same, ep0_same, ep0_fit)
        ep1_out[ch] = jnp.where(all_same, ep1_same, ep1_fit)

    lm0 = left_s * ls_weight
    lm1 = middle_s * ls_weight
    lm2 = right_s * ls_weight
    ls_det = lm0 * lm2 - lm1 * lm1
    ls_rdet = 1.0 / ls_det
    ls_mss = lm0 * lm0 + 2.0 * lm1 * lm1 + lm2 * lm2
    se0 = (lm2 * sv0 - lm1 * sv1) * ls_rdet
    se1 = (lm0 * sv1 - lm1 * sv0) * ls_rdet
    ls_ok = ((jnp.abs(ls_det) > ls_mss * 1e-4)
             & ~jnp.isnan(se0) & ~jnp.isnan(se1) & (se0 < se1))
    div1 = jnp.where(se1 != 0, se1, 1.0)
    for ch in range(3):
        base = jnp.where(ls_ok, sd[ch] * se1, sds[ch])
        rgbs_out[ch] = jnp.where(all_same, sds[ch], base)
    s3 = jnp.where(ls_ok, se0 / div1, scalediv)
    rgbs_out[3] = jnp.where(all_same, jnp.ones_like(s3), s3)

    return ep0_out, ep1_out, rgbs_out


def _lut_tables(qidx_row, lo_ref, hi_ref):
    """Block tile's (256, BT) lo/hi quantizer tables from the (256, NQ)
    masters via MXU one-hot matmuls."""
    NQ = lo_ref.shape[1]
    BT = qidx_row.shape[1]
    ohq = (jax.lax.broadcasted_iota(jnp.int32, (NQ, BT), 0)
           == qidx_row).astype(jnp.bfloat16)
    lo_tab = jax.lax.dot_general(
        lo_ref[:], ohq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (256, BT)
    hi_tab = jax.lax.dot_general(
        hi_ref[:], ohq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return lo_tab, hi_tab


def _make_lut(qidx_row, lo_ref, hi_ref, qidxm_row=None, pc: int = 1):
    """In-kernel quantizer LUT over stacked request rows.

    Request rows may be (G, BT) with G == pc partition sublanes resolved
    against the base-quant tables, or G == 2*pc with sublanes [pc:2pc]
    resolved against the mod-quant (cqm) tables — the stacking that lets a
    refinement round run ONE pack over every (partition, quant-variant)
    instead of 2*pc scalar-row packs. Lookups use the 8-row sublane
    hardware gather (see _sublane_gather2)."""
    lo_tab, hi_tab = _lut_tables(qidx_row, lo_ref, hi_ref)
    if qidxm_row is not None:
        lo_m, hi_m = _lut_tables(qidxm_row, lo_ref, hi_ref)

    def lut(rows):
        K = len(rows)
        G = rows[0].shape[0]
        stacked_mod = qidxm_row is not None and G == 2 * pc
        if not stacked_mod:
            vals = jnp.concatenate([jnp.clip(r, 0, 255) for r in rows], 0)
            lo, hi = _sublane_gather2(lo_tab, hi_tab, vals)
            lo_rows = [lo[k * G:(k + 1) * G].astype(jnp.int32)
                       for k in range(K)]
            hi_rows = [hi[k * G:(k + 1) * G].astype(jnp.int32)
                       for k in range(K)]
            return lo_rows, hi_rows
        # Split base/mod sublanes so every gather group resolves against
        # one table (the mod rows' table differs per block).
        base = jnp.concatenate(
            [jnp.clip(r[:pc], 0, 255) for r in rows], 0)      # (K*pc, BT)
        mod = jnp.concatenate(
            [jnp.clip(r[pc:], 0, 255) for r in rows], 0)
        lob, hib = _sublane_gather2(lo_tab, hi_tab, base)
        lom, him = _sublane_gather2(lo_m, hi_m, mod)
        lo_rows = []
        hi_rows = []
        for k in range(K):
            s = slice(k * pc, (k + 1) * pc)
            lo_rows.append(jnp.concatenate(
                [lob[s], lom[s]], 0).astype(jnp.int32))
            hi_rows.append(jnp.concatenate(
                [hib[s], him[s]], 0).astype(jnp.int32))
        return lo_rows, hi_rows

    return lut


class RefineTables:
    """Device-resident kernel constants for one (BSD, mode-subset)."""

    def __init__(self, dec_int_np, dec_f32_np, dm_color_np, wvalid_np,
                 prev_next_np):
        from . import color_pack as _cp
        D, T, W = dec_int_np.shape
        assert W <= 64, "1-plane weight grids are <= 64 weights"
        self.D, self.T, self.W = D, T, W
        # Contraction masters: every dense (T, W, BT) stencil reduction in
        # the trial kernels is a matmul against these, fed by a one-hot
        # (d) expand of the per-block vector operand — the (T, W, BT)
        # stencil tensors never materialize (see _trial1_full_kernel).
        # TDW = [t, d*W+w] (contract over w), WDT = [w, d*T+t] (over t).
        # bf16 masters pair with bf16-exact integer vectors (exact, f32
        # accumulate); f32 masters contract against f32 error terms.
        self.si_tdw = jnp.asarray(
            dec_int_np.transpose(1, 0, 2).reshape(T, D * W), jnp.bfloat16)
        self.sf_tdw = jnp.asarray(
            dec_f32_np.transpose(1, 0, 2).reshape(T, D * W), jnp.bfloat16)
        f32m = dec_f32_np.astype(np.float32)
        self.sf_wdt = jnp.asarray(
            f32m.transpose(2, 0, 1).reshape(W, D * T), jnp.bfloat16)
        self.ssq_wdt = jnp.asarray(
            (f32m * f32m).transpose(2, 0, 1).reshape(W, D * T),
            jnp.bfloat16)
        self.sind_wdt = jnp.asarray(
            (dec_int_np != 0).transpose(2, 0, 1).reshape(W, D * T),
            jnp.bfloat16)
        dmc = np.zeros((128, D), np.float32)
        dmc[0:W, :] = dm_color_np.T
        dmc[64:64 + W, :] = wvalid_np.T.astype(np.float32)
        self.dmc = jnp.asarray(dmc, jnp.bfloat16)
        pn = np.zeros((256, 12), np.float32)
        pn[0:65, :] = prev_next_np[:, :, 0].T
        pn[128:193, :] = prev_next_np[:, :, 1].T
        self.pn = jnp.asarray(pn, jnp.bfloat16)
        lo_t, hi_t = _cp._quant_tables()            # (17, 256) each
        self.lo = jnp.asarray(lo_t.T.astype(np.float32), jnp.bfloat16)
        self.hi = jnp.asarray(hi_t.T.astype(np.float32), jnp.bfloat16)


def pack_meta(wgrid, d_idx, wq, alive, ep0i, ep1i, pot, T: int):
    """Assemble the (B, meta_rows(T)) int32 meta operand."""
    B = wgrid.shape[0]
    W = wgrid.shape[1]
    meta = jnp.zeros((B, meta_rows(T)), jnp.int32)
    meta = meta.at[:, 0:W].set(wgrid)
    meta = meta.at[:, 64].set(d_idx)
    meta = meta.at[:, 65].set(wq)
    meta = meta.at[:, 66].set(alive.astype(jnp.int32))
    meta = meta.at[:, 128:144].set(ep0i[:, :4, :4].reshape(B, 16))
    meta = meta.at[:, 144:160].set(ep1i[:, :4, :4].reshape(B, 16))
    meta = meta.at[:, 256:256 + T].set(pot)
    return meta


def pack_tex(texels):
    """(B, T, 4) -> (B, tex_rows(T)) channel planes at tex_stride(T)."""
    B, T, _ = texels.shape
    ts = tex_stride(T)
    tex = jnp.zeros((B, tex_rows(T)), jnp.float32)
    for ch in range(4):
        tex = tex.at[:, ch * ts:ch * ts + T].set(texels[..., ch])
    return tex


def refine_round_1plane(tables: RefineTables, meta, tex, ncolors: int,
                        u8_mask: bool, cw, BT: int | None = None, cw_scale=None,
                        rgbm_scale: float = 0.0):
    """Run one fused refine round.

    Args:
      meta/tex: block-major packed operands from pack_meta / pack_tex.

    Returns (new_wgrid (B, W) int32, adjusted (B,) bool, undec (B, T) f32,
    err_pre (B,), err_post (B,)).
    """
    B = meta.shape[0]
    if BT is None:
        BT = kernel_bt()
    if cw_scale is not None:
        tex = tex.at[:, asr_row(tables.T)].set(cw_scale.astype(jnp.float32))
    pad = (-B) % BT
    if pad:
        meta = jnp.pad(meta, ((0, pad), (0, 0)))
        tex = jnp.pad(tex, ((0, pad), (0, 0)))
    oint, of32 = _refine_call(meta.T, tex.T, tables.si_tdw,
                              tables.sf_tdw, tables.sf_wdt,
                              tables.ssq_wdt, tables.sind_wdt,
                              tables.dmc, tables.pn, tables.T, tables.W,
                              tables.D, ncolors, u8_mask,
                              tuple(float(c) for c in cw), BT,
                              cw_scale is not None, float(rgbm_scale))
    oint = oint[:, :B]
    of32 = of32[:, :B]
    TS = tex_stride(tables.T)
    return (oint[0:tables.W, :].T, oint[64, :] != 0, of32[0:tables.T, :].T,
            of32[TS, :], of32[TS + 1, :])
