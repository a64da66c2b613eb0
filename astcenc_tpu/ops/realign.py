"""Weight realignment (+/-1 quantization step hill climb), batched.

TPU redesign of realign_weights_undecimated / _decimated
(reference: Source/astcenc_compress_symbolic.cpp:69-338). The undecimated
case is embarrassingly parallel per texel. The decimated case is a
sequential scan over the (<= 64) grid weights because each decision reads
the infilled values produced by earlier decisions; we run the scan once with
every block in the batch in parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import gather_pallas as gather_ops
from . import lut as lut_ops


def _pn_rows(prev_next, quant_of_block):
    """Per-block (65, 2) prev/next table via one-hot contraction.

    prev_next is (12, 65, 2); a per-element gather over it scalarizes on
    TPU, so select the block's row with a (N, 12) one-hot matmul once and
    do all per-weight lookups against the per-block row (lut.lookup_rows).
    """
    pn = jnp.asarray(prev_next).astype(jnp.float32)
    oh = lut_ops.onehot(quant_of_block, pn.shape[0])
    return jnp.einsum("nq,qvc->nvc", oh, pn)


def realign_undecimated(weights, texels, pmask, ep0i, ep1i, channel_weight,
                        prev_next, quant_of_block, plane_mask=None):
    """Realign an undecimated (1 weight per texel) grid, one plane.

    Args:
      weights: (N, T) int32 unquantized weights 0..64.
      texels: (N, T, 4) original colors (0..65535).
      pmask: (N, T, P) one-hot partitions.
      ep0i/ep1i: (N, P, 4) decoded integer endpoints.
      channel_weight: (4,) static.
      prev_next: (12, 65, 2) per-quant prev/next unquant value table.
      quant_of_block: (N,) weight quant level per block.
      plane_mask: optional (N, 4) bool; True lanes are *excluded* (they
        belong to the other plane).

    Returns: (new_weights (N, T) int32, adjusted (N,) bool).
    """
    cw = jnp.asarray(channel_weight, jnp.float32)
    if cw.ndim == 2:
        cw = cw[:, None, :]   # per-block (USE_ALPHA_WEIGHT)
    pn = jnp.asarray(prev_next)

    epd = (ep1i - ep0i).astype(jnp.float32)
    if plane_mask is not None:
        epd = jnp.where(plane_mask[:, None, :], 0.0, epd)
    offset = epd * (1.0 / 64.0)                       # (N, P, 4)
    base = ep0i.astype(jnp.float32)

    off_t = jnp.einsum("ntp,npc->ntc", pmask, offset)
    base_t = jnp.einsum("ntp,npc->ntc", pmask, base)

    uqw = weights
    rows = _pn_rows(pn, quant_of_block)                      # (N, 65, 2)
    pnq = gather_ops.row_lookup(rows, jnp.clip(uqw, 0, 64))  # (N, T, 2)
    down = pnq[..., 0].astype(jnp.int32)
    up = pnq[..., 1].astype(jnp.int32)

    wb = uqw.astype(jnp.float32)
    color = base_t + off_t * wb[..., None]
    diff = color - texels
    diff_dn = diff + off_t * (down - uqw).astype(jnp.float32)[..., None]
    diff_up = diff + off_t * (up - uqw).astype(jnp.float32)[..., None]

    e_base = jnp.sum(diff * diff * cw, axis=-1)
    e_down = jnp.sum(diff_dn * diff_dn * cw, axis=-1)
    e_up = jnp.sum(diff_up * diff_up * cw, axis=-1)

    go_up = (e_up < e_base) & (e_up < e_down) & (uqw < 64)
    go_dn = ~go_up & (e_down < e_base) & (uqw > 0)

    new_w = jnp.where(go_up, up, jnp.where(go_dn, down, uqw))
    adjusted = jnp.any(go_up | go_dn, axis=-1)
    return new_w, adjusted


def realign_decimated(dec_weights, texels, pmask, ep0i, ep1i, channel_weight,
                      prev_next, quant_of_block, dec_f32, incidence,
                      wvalid, plane_mask=None):
    """Realign a decimated weight grid, one plane; sequential over weights.

    Args:
      dec_weights: (N, W) int32 unquantized grid weights 0..64.
      texels/pmask/ep0i/ep1i/channel_weight/prev_next/quant_of_block: as above.
      dec_f32: (N, T, W) per-block infill stencil (rows sum to 1).
      incidence: (N, T, W) 0/1 indicator (stencil != 0).
      wvalid: (N, W) weight-slot validity.
      plane_mask: optional (N, 4) excluded lanes.

    Returns: (new_weights (N, W) int32, adjusted (N,) bool).
    """
    cw = jnp.asarray(channel_weight, jnp.float32)
    if cw.ndim == 2:
        cw = cw[:, None, :]   # per-block (USE_ALPHA_WEIGHT)
    pn = jnp.asarray(prev_next)

    epd = (ep1i - ep0i).astype(jnp.float32)
    if plane_mask is not None:
        epd = jnp.where(plane_mask[:, None, :], 0.0, epd)
    offset = epd * (1.0 / 64.0)
    base = ep0i.astype(jnp.float32)

    off_t = jnp.einsum("ntp,npc->ntc", pmask, offset)   # (N, T, 4)
    base_t = jnp.einsum("ntp,npc->ntc", pmask, base)

    # Per-texel error terms as a function of the infilled weight w_t:
    #   err(t) = |base + off*w_t - tex|^2_cw
    # For a +delta change of grid weight j, w_t changes by delta * M[t, j].
    # Expand: err = A + 2 B d M + C d^2 M^2 with
    #   A = |diff|^2_cw, B = (diff . off)_cw, C = |off|^2_cw.
    C_t = jnp.sum(off_t * off_t * cw, axis=-1)          # (N, T) constant

    W = dec_weights.shape[1]

    def body(carry, j):
        wgrid, infilled, adjusted = carry
        color = base_t + off_t * infilled[..., None]
        diff = color - texels
        A_t = jnp.sum(diff * diff * cw, axis=-1)
        B_t = jnp.sum(diff * off_t * cw, axis=-1)

        ind_j = incidence[:, :, j]                       # (N, T)
        Mf_j = dec_f32[:, :, j]

        SA = jnp.sum(ind_j * A_t, axis=1)
        SB = jnp.sum(ind_j * Mf_j * B_t, axis=1)
        SC = jnp.sum(ind_j * Mf_j * Mf_j * C_t, axis=1)

        uqw = wgrid[:, j]
        pnq = gather_ops.row_lookup(rows, jnp.clip(uqw, 0, 64)[:, None])[:, 0]
        down = pnq[:, 0].astype(jnp.int32)
        up = pnq[:, 1].astype(jnp.int32)
        d_dn = (down - uqw).astype(jnp.float32)
        d_up = (up - uqw).astype(jnp.float32)

        e_base = SA
        e_dn = SA + 2.0 * d_dn * SB + d_dn * d_dn * SC
        e_up = SA + 2.0 * d_up * SB + d_up * d_up * SC

        ok = wvalid[:, j]
        go_up = (e_up < e_base) & (e_up < e_dn) & (uqw < 64) & ok
        go_dn = ~go_up & (e_dn < e_base) & (uqw > 0) & ok

        new_wj = jnp.where(go_up, up, jnp.where(go_dn, down, uqw))
        wgrid = wgrid.at[:, j].set(new_wj)
        # Incrementally update the infilled grid for subsequent weights
        infilled = infilled + Mf_j * (new_wj - uqw).astype(jnp.float32)[:, None]
        adjusted = adjusted | go_up | go_dn
        return (wgrid, infilled, adjusted), None

    rows = _pn_rows(pn, quant_of_block)                      # (N, 65, 2)
    infill0 = jnp.einsum("ntw,nw->nt", dec_f32,
                         dec_weights.astype(jnp.float32))
    init = (dec_weights, infill0, jnp.zeros(dec_weights.shape[0], bool))
    (new_w, _, adjusted), _ = jax.lax.scan(body, init, jnp.arange(W))
    return new_w, adjusted


def realign_decimated_grouped(dec_weights, texels, pmask, ep0i, ep1i,
                              channel_weight, prev_next, quant_of_block,
                              dec_f32, incidence, wvalid, color_of,
                              ncolors: int, plane_mask=None, ep_t=None):
    """Grouped-parallel realign: weights partitioned into parity classes.

    A texel's interpolation stencil touches one weight of each (x, y[, z])
    parity class, so weights within a class share no texels and can update
    simultaneously with Gauss-Seidel semantics intact inside the class.
    This turns the reference's W-step sequential sweep into `ncolors`
    (4 for 2D, 8 for 3D) fully-vectorized steps — the TPU-shaped form of
    realign_weights_decimated (reference: astcenc_compress_symbolic.cpp:
    188-338; update order differs from the reference raster sweep).

    Args additional to realign_decimated:
      color_of: (N, W) parity class per weight slot.
      ncolors: static class count.

    Returns: (new_weights (N, W) int32, adjusted (N,) bool).
    """
    cw = jnp.asarray(channel_weight, jnp.float32)
    if cw.ndim == 2:
        cw = cw[:, None, :]   # per-block (USE_ALPHA_WEIGHT)
    pn = jnp.asarray(prev_next)

    if ep_t is not None:
        # Caller-hoisted per-texel endpoints (avoids re-running the pmask
        # einsums the trial-error evals already paid for).
        ep0_t, ep1_t = ep_t
        epd_t = ep1_t - ep0_t
        if plane_mask is not None:
            epd_t = jnp.where(plane_mask[:, None, :], 0.0, epd_t)
        off_t = epd_t * (1.0 / 64.0)
        base_t = ep0_t
    else:
        epd = (ep1i - ep0i).astype(jnp.float32)
        if plane_mask is not None:
            epd = jnp.where(plane_mask[:, None, :], 0.0, epd)
        offset = epd * (1.0 / 64.0)
        base = ep0i.astype(jnp.float32)
        off_t = jnp.einsum("ntp,npc->ntc", pmask, offset)   # (N, T, 4)
        base_t = jnp.einsum("ntp,npc->ntc", pmask, base)
    C_t = jnp.sum(off_t * off_t * cw, axis=-1)          # (N, T)

    rows = _pn_rows(pn, quant_of_block)                      # (N, 65, 2)
    wgrid = dec_weights
    infilled = jnp.einsum("ntw,nw->nt", dec_f32,
                          wgrid.astype(jnp.float32))
    adjusted = jnp.zeros(dec_weights.shape[0], bool)

    # Hoisted invariants: SC depends only on the (fixed) endpoints and the
    # stencil; the prev/next lookup for a slot is consumed before that
    # slot's own (single) update, so the initial-wgrid lookup is exact for
    # every class step.
    SC = jnp.einsum("ntw,nt->nw", dec_f32 * dec_f32, C_t)
    pnq = gather_ops.row_lookup(rows, jnp.clip(wgrid, 0, 64))  # (N, W, 2)
    down = pnq[..., 0].astype(jnp.int32)
    up = pnq[..., 1].astype(jnp.int32)

    for k in range(ncolors):
        color = base_t + off_t * infilled[..., None]
        diff = color - texels
        A_t = jnp.sum(diff * diff * cw, axis=-1)
        B_t = jnp.sum(diff * off_t * cw, axis=-1)

        SA = jnp.einsum("ntw,nt->nw", incidence, A_t)
        SB = jnp.einsum("ntw,nt->nw", dec_f32, B_t)

        d_dn = (down - wgrid).astype(jnp.float32)
        d_up = (up - wgrid).astype(jnp.float32)

        e_base = SA
        e_dn = SA + 2.0 * d_dn * SB + d_dn * d_dn * SC
        e_up = SA + 2.0 * d_up * SB + d_up * d_up * SC

        ok = wvalid & (color_of == k)
        go_up = (e_up < e_base) & (e_up < e_dn) & (wgrid < 64) & ok
        go_dn = ~go_up & (e_dn < e_base) & (wgrid > 0) & ok

        new_w = jnp.where(go_up, up, jnp.where(go_dn, down, wgrid))
        delta = (new_w - wgrid).astype(jnp.float32)
        infilled = infilled + jnp.einsum("ntw,nw->nt", dec_f32, delta)
        wgrid = new_w
        adjusted = adjusted | jnp.any(go_up | go_dn, axis=-1)

    return wgrid, adjusted
