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

_BIG = 1e30                        # ERROR_CALC_DEFAULT


def _refine_kernel(meta_ref, tex_ref, si_ref, sf_ref, dmc_ref, pn_ref,
                   oint_ref, of32_ref, *, T: int, W: int, D: int,
                   ncolors: int, u8_mask: bool, cw: tuple):
    meta = meta_ref[:]                             # (384, BT) int32
    BT = meta.shape[1]
    w64 = meta[0:W, :].astype(jnp.float32)         # (W, BT) weight grid
    d_row = meta[64:65, :]                         # (1, BT) decimation mode
    wq_row = meta[65:66, :]                        # (1, BT) weight quant
    pot = meta[256:256 + T, :]                     # (T, BT)

    f32 = jnp.float32

    # Per-block stencil rows: one MXU matmul + a free major-dim reshape.
    oh_d = (jax.lax.broadcasted_iota(jnp.int32, (D, BT), 0)
            == d_row).astype(jnp.bfloat16)
    srow_i = jnp.dot(si_ref[:], oh_d,
                     preferred_element_type=f32).reshape(T, W, BT)
    srow_f = jnp.dot(sf_ref[:], oh_d,
                     preferred_element_type=f32).reshape(T, W, BT)

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

    texp = [tex_ref[ch * 128:ch * 128 + T, :] for ch in range(4)]

    def trial_err(wgrid_f):
        s = jnp.sum(srow_i * wgrid_f[None, :, :], axis=1)      # (T, BT)
        infill = jnp.floor((8.0 + s) * (1.0 / 16.0))           # exact ints
        errt = None
        for ch in range(4):
            color = jnp.floor((ep0t[ch] * (64.0 - infill)
                               + ep1t[ch] * infill + 32.0) * (1.0 / 64.0))
            if u8_mask:
                color = jnp.floor(color * (1.0 / 256.0)) * 257.0
            dd = jnp.minimum(jnp.abs(texp[ch] - color), 1e15)
            term = dd * dd * cw[ch]
            errt = term if errt is None else errt + term
        errt = jnp.minimum(errt, _BIG)
        return jnp.sum(errt, axis=0, keepdims=True)            # (1, BT)

    err_pre = trial_err(w64)

    if ncolors == 0:
        # Bootstrap mode: no realign — just the infill of the incoming grid
        # (round 0's least-squares refit input) and its trial error.
        undec0 = jnp.sum(srow_f * w64[None, :, :], axis=1) * (1.0 / 64.0)
        oint_ref[:] = jnp.concatenate(
            [w64.astype(jnp.int32), jnp.zeros((128 - W, BT), jnp.int32)],
            axis=0)
        of32_ref[:] = jnp.concatenate(
            [undec0, jnp.zeros((128 - T, BT), f32), err_pre, err_pre,
             jnp.zeros((126, BT), f32)], axis=0)
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

    # Value-indexed lookup of prev/next for each weight slot: 65-step
    # select chain on (W, BT) planes (the grid is 0..64 by construction).
    down = None
    up = None
    for v in range(65):
        m = w64 == float(v)
        tdn = jnp.where(m, dn_tab[v:v + 1, :], 0.0)
        tup = jnp.where(m, up_tab[v:v + 1, :], 0.0)
        down = tdn if down is None else down + tdn
        up = tup if up is None else up + tup
    downf = down
    upf = up

    offs = [(ep1t[ch] - ep0t[ch]) * (1.0 / 64.0) for ch in range(4)]
    C_t = None
    for ch in range(4):
        term = offs[ch] * offs[ch] * cw[ch]
        C_t = term if C_t is None else C_t + term
    srow_inc = (srow_i != 0.0).astype(f32)
    SC = jnp.sum(srow_f * srow_f * C_t[:, None, :], axis=0)    # (W, BT)

    infilled = jnp.sum(srow_f * w64[None, :, :], axis=1)       # (T, BT)
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
        SA = jnp.sum(srow_inc * A_t[:, None, :], axis=0)       # (W, BT)
        SB = jnp.sum(srow_f * B_t[:, None, :], axis=0)

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
        infilled = infilled + jnp.sum(srow_f * delta[None, :, :], axis=1)
        wgrid = new_w
        changed = jnp.max(jnp.where(go_up | go_dn, 1.0, 0.0),
                          axis=0, keepdims=True)
        adjusted = jnp.maximum(adjusted, changed)
        # No prev/next refresh: each weight slot is updated at most once
        # (at its own parity class), and its lookup is consumed before that
        # update — the initial-wgrid lookup is exact for every class step.

    err_post = trial_err(wgrid)
    undec = jnp.sum(srow_f * wgrid[None, :, :], axis=1) * (1.0 / 64.0)

    oint_ref[:] = jnp.concatenate(
        [wgrid.astype(jnp.int32),
         jnp.zeros((64 - W, BT), jnp.int32),
         adjusted.astype(jnp.int32),
         jnp.zeros((63, BT), jnp.int32)], axis=0)

    of32_ref[:] = jnp.concatenate(
        [undec, jnp.zeros((128 - T, BT), f32), err_pre, err_post,
         jnp.zeros((126, BT), f32)], axis=0)


def _refine2_kernel(meta_ref, tex_ref, si_ref, sf_ref, dmc_ref, pn_ref,
                    oint_ref, of32_ref, *, T: int, W: int, D: int,
                    ncolors: int, u8_mask: bool, cw: tuple):
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
    srow_i = jnp.dot(si_ref[:], oh_d,
                     preferred_element_type=f32).reshape(T, W, BT)
    srow_f = jnp.dot(sf_ref[:], oh_d,
                     preferred_element_type=f32).reshape(T, W, BT)

    # Single partition: endpoints broadcast per channel.
    ep0s = [meta[128 + ch:129 + ch, :].astype(f32) for ch in range(4)]
    ep1s = [meta[144 + ch:145 + ch, :].astype(f32) for ch in range(4)]
    texp = [tex_ref[ch * 128:ch * 128 + T, :] for ch in range(4)]
    is_p2 = [p2c == ch for ch in range(4)]         # (1, BT) each

    def infill_of(wg):
        s = jnp.sum(srow_i * wg[None, :, :], axis=1)
        return jnp.floor((8.0 + s) * (1.0 / 16.0))  # (T, BT) exact ints

    def trial_err(wg1, wg2):
        i1 = infill_of(wg1)
        i2 = infill_of(wg2)
        errt = None
        for ch in range(4):
            w_ch = jnp.where(is_p2[ch], i2, i1)
            color = jnp.floor((ep0s[ch] * (64.0 - w_ch)
                               + ep1s[ch] * w_ch + 32.0) * (1.0 / 64.0))
            if u8_mask:
                color = jnp.floor(color * (1.0 / 256.0)) * 257.0
            dd = jnp.minimum(jnp.abs(texp[ch] - color), 1e15)
            term = dd * dd * cw[ch]
            errt = term if errt is None else errt + term
        errt = jnp.minimum(errt, _BIG)
        return jnp.sum(errt, axis=0, keepdims=True)

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
        down = None
        up = None
        for v in range(65):
            m = wg == float(v)
            tdn = jnp.where(m, dn_tab[v:v + 1, :], 0.0)
            tup = jnp.where(m, up_tab[v:v + 1, :], 0.0)
            down = tdn if down is None else down + tdn
            up = tup if up is None else up + tup
        return down, up

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
        srow_inc = (srow_i != 0.0).astype(f32)
        SC = jnp.sum(srow_f * srow_f * C_t[:, None, :], axis=0)

        downf, upf = pn_lookup(wg)
        infilled = jnp.sum(srow_f * wg[None, :, :], axis=1)
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
            SA = jnp.sum(srow_inc * A_t[:, None, :], axis=0)
            SB = jnp.sum(srow_f * B_t[:, None, :], axis=0)

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
            infilled = infilled + jnp.sum(srow_f * delta[None, :, :], axis=1)
            wgrid = new_w
            changed = jnp.max(jnp.where(go_up | go_dn, 1.0, 0.0),
                              axis=0, keepdims=True)
            adjusted = jnp.maximum(adjusted, changed)
        return wgrid, adjusted

    nw1, adj1 = realign(w1, other_plane=False)
    nw2, adj2 = realign(w2, other_plane=True)
    adjusted = jnp.maximum(adj1, adj2)

    err_post = trial_err(nw1, nw2)
    u1 = jnp.sum(srow_f * nw1[None, :, :], axis=1) * (1.0 / 64.0)
    u2 = jnp.sum(srow_f * nw2[None, :, :], axis=1) * (1.0 / 64.0)

    oint_ref[:] = jnp.concatenate(
        [nw1.astype(jnp.int32), jnp.zeros((64 - W, BT), jnp.int32),
         nw2.astype(jnp.int32), jnp.zeros((63 - W, BT), jnp.int32),
         adjusted.astype(jnp.int32)], axis=0)

    of32_ref[:] = jnp.concatenate(
        [u1, jnp.zeros((128 - T, BT), f32),
         u2, jnp.zeros((126 - T, BT), f32), err_pre, err_post], axis=0)


def _refine2_boot_kernel(meta_ref, tex_ref, si_ref, sf_ref, dmc_ref, pn_ref,
                         oint_ref, of32_ref, *, T: int, W: int, D: int,
                         ncolors: int, u8_mask: bool, cw: tuple):
    """Bootstrap: infills of both incoming grids only."""
    meta = meta_ref[:]
    BT = meta.shape[1]
    w1 = meta[0:W, :].astype(jnp.float32)
    w2 = meta[256:256 + W, :].astype(jnp.float32)
    d_row = meta[64:65, :]
    f32 = jnp.float32
    oh_d = (jax.lax.broadcasted_iota(jnp.int32, (D, BT), 0)
            == d_row).astype(jnp.bfloat16)
    srow_f = jnp.dot(sf_ref[:], oh_d,
                     preferred_element_type=f32).reshape(T, W, BT)
    u1 = jnp.sum(srow_f * w1[None, :, :], axis=1) * (1.0 / 64.0)
    u2 = jnp.sum(srow_f * w2[None, :, :], axis=1) * (1.0 / 64.0)
    oint_ref[:] = jnp.zeros((128, BT), jnp.int32)
    of32_ref[:] = jnp.concatenate(
        [u1, jnp.zeros((128 - T, BT), f32),
         u2, jnp.zeros((128 - T, BT), f32)], axis=0)


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11, 12, 13))
def _refine2_call(metaT, texT, si, sf, dmc, pn,
                  T: int, W: int, D: int, ncolors: int, u8_mask: bool,
                  cw: tuple, BT: int, boot: bool):
    B = metaT.shape[1]
    body = _refine2_boot_kernel if boot else _refine2_kernel
    kern = functools.partial(body, T=T, W=W, D=D, ncolors=ncolors,
                             u8_mask=u8_mask, cw=cw)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((128, B), jnp.int32),
                   jax.ShapeDtypeStruct((256, B), jnp.float32)),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((384, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            const_spec(si.shape),
            const_spec(sf.shape),
            const_spec(dmc.shape),
            const_spec(pn.shape),
        ],
        out_specs=(pl.BlockSpec((128, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((256, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
    )(metaT, texT, si, sf, dmc, pn)


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
                        u8_mask: bool, cw, BT: int = 128):
    """One fused 2-plane refine round (ncolors=0 -> bootstrap infill only).

    Returns (nw1 (B, W) i32, nw2 (B, W) i32, adjusted (B,) bool,
    u1 (B, T) f32, u2 (B, T) f32, err_pre (B,), err_post (B,)).
    """
    B = meta.shape[0]
    pad = (-B) % BT
    if pad:
        meta = jnp.pad(meta, ((0, pad), (0, 0)))
        tex = jnp.pad(tex, ((0, pad), (0, 0)))
    oint, of32 = _refine2_call(meta.T, tex.T, tables.si, tables.sf,
                               tables.dmc, tables.pn, tables.T, tables.W,
                               tables.D, ncolors, u8_mask,
                               tuple(float(c) for c in cw), BT,
                               ncolors == 0)
    oint = oint[:, :B]
    of32 = of32[:, :B]
    W, T = tables.W, tables.T
    return (oint[0:W, :].T, oint[64:64 + W, :].T, oint[127, :] != 0,
            of32[0:T, :].T, of32[128:128 + T, :].T,
            of32[254, :], of32[255, :])


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11, 12))
def _refine_call(metaT, texT, si, sf, dmc, pn,
                 T: int, W: int, D: int, ncolors: int, u8_mask: bool,
                 cw: tuple, BT: int):
    B = metaT.shape[1]
    kern = functools.partial(_refine_kernel, T=T, W=W, D=D, ncolors=ncolors,
                             u8_mask=u8_mask, cw=cw)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((128, B), jnp.int32),
                   jax.ShapeDtypeStruct((256, B), jnp.float32)),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((384, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512, BT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            const_spec(si.shape),
            const_spec(sf.shape),
            const_spec(dmc.shape),
            const_spec(pn.shape),
        ],
        out_specs=(pl.BlockSpec((128, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((256, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
    )(metaT, texT, si, sf, dmc, pn)


class RefineTables:
    """Device-resident kernel constants for one (BSD, mode-subset)."""

    def __init__(self, dec_int_np, dec_f32_np, dm_color_np, wvalid_np,
                 prev_next_np):
        D, T, W = dec_int_np.shape
        assert W <= 64, "1-plane weight grids are <= 64 weights"
        self.D, self.T, self.W = D, T, W
        # (T*W, D) bf16 masters for the in-kernel MXU one-hot selects;
        # stencil payloads are exact in bf16.
        self.si = jnp.asarray(
            dec_int_np.transpose(1, 2, 0).reshape(T * W, D), jnp.bfloat16)
        self.sf = jnp.asarray(
            dec_f32_np.transpose(1, 2, 0).reshape(T * W, D), jnp.bfloat16)
        dmc = np.zeros((128, D), np.float32)
        dmc[0:W, :] = dm_color_np.T
        dmc[64:64 + W, :] = wvalid_np.T.astype(np.float32)
        self.dmc = jnp.asarray(dmc, jnp.bfloat16)
        pn = np.zeros((256, 12), np.float32)
        pn[0:65, :] = prev_next_np[:, :, 0].T
        pn[128:193, :] = prev_next_np[:, :, 1].T
        self.pn = jnp.asarray(pn, jnp.bfloat16)


def pack_meta(wgrid, d_idx, wq, alive, ep0i, ep1i, pot, T: int):
    """Assemble the (B, 384) int32 meta operand (see module docstring)."""
    B = wgrid.shape[0]
    W = wgrid.shape[1]
    meta = jnp.zeros((B, 384), jnp.int32)
    meta = meta.at[:, 0:W].set(wgrid)
    meta = meta.at[:, 64].set(d_idx)
    meta = meta.at[:, 65].set(wq)
    meta = meta.at[:, 66].set(alive.astype(jnp.int32))
    meta = meta.at[:, 128:144].set(ep0i[:, :4, :4].reshape(B, 16))
    meta = meta.at[:, 144:160].set(ep1i[:, :4, :4].reshape(B, 16))
    meta = meta.at[:, 256:256 + T].set(pot)
    return meta


def pack_tex(texels):
    """(B, T, 4) -> (B, 512) channel planes at 128-lane strides."""
    B, T, _ = texels.shape
    tex = jnp.zeros((B, 512), jnp.float32)
    for ch in range(4):
        tex = tex.at[:, ch * 128:ch * 128 + T].set(texels[..., ch])
    return tex


def refine_round_1plane(tables: RefineTables, meta, tex, ncolors: int,
                        u8_mask: bool, cw, BT: int = 128):
    """Run one fused refine round.

    Args:
      meta/tex: block-major packed operands from pack_meta / pack_tex.

    Returns (new_wgrid (B, W) int32, adjusted (B,) bool, undec (B, T) f32,
    err_pre (B,), err_post (B,)).
    """
    B = meta.shape[0]
    pad = (-B) % BT
    if pad:
        meta = jnp.pad(meta, ((0, pad), (0, 0)))
        tex = jnp.pad(tex, ((0, pad), (0, 0)))
    oint, of32 = _refine_call(meta.T, tex.T, tables.si, tables.sf,
                              tables.dmc, tables.pn, tables.T, tables.W,
                              tables.D, ncolors, u8_mask,
                              tuple(float(c) for c in cw), BT)
    oint = oint[:, :B]
    of32 = of32[:, :B]
    return (oint[0:tables.W, :].T, oint[64, :] != 0, of32[0:tables.T, :].T,
            of32[128, :], of32[129, :])
