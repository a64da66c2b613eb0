"""Batched 1-plane / 2-plane compression trials.

TPU redesign of compress_symbolic_block_for_partition_1plane / _2planes
(reference: Source/astcenc_compress_symbolic.cpp:353-1037): the per-block
candidate/refinement control flow becomes fixed-depth masked iteration, with
per-block "finished" lanes frozen rather than exited. Selection-order and
threshold semantics mirror the reference so the same encodings win.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import angular as ang
from ..ops import color_pack as cpack
from ..ops import color_pack_hdr as cph
from ..ops import color_unquant as cuq
from ..ops import formats as fmts
from ..ops import gather_pallas as gather_ops
from ..ops import ideal as ideal_ops
from ..ops import lut as lut_ops
from ..ops import msearch_pallas as msearch_ops
from ..ops import realign as realign_ops
from ..ops import recompute as recompute_ops
from ..ops import refine_pallas as refine_ops
from ..tables import ise, quant

ERROR_CALC_DEFAULT = 1e30
QUANT_32 = 11

# Largest texel count routed through the fused Pallas kernels: 216
# covers every legal footprint, 2D (up to 12x12) and 3D (up to 6x6x6).
# The 6x6x6 blocker fell when the kernels' stencil reductions moved to
# MXU contractions (ops/refine_pallas.py): the dense (T, W, BT) stencil
# working set (~21 MB at T=216) no longer materializes.
_KMAX_T = 216


def effective_cw(cfg, st):
    """Per-block channel weights.

    With USE_ALPHA_WEIGHT (-a), each block's r/g/b error weights scale by
    its max alpha (reference: astcenc_entry.cpp:1016-1035) — returns an
    (N, 4) tensor. Otherwise returns the static config tuple, keeping the
    common path compile-time constant.
    """
    s = st.get("cw_scale")
    cw = cfg.channel_weights
    if s is None:
        return cw
    return jnp.stack([s * cw[0], s * cw[1], s * cw[2],
                      jnp.full_like(s, jnp.float32(cw[3]))], axis=1)


def cw_bcast(cw, extra_axes: int):
    """Channel weights as an f32 array broadcastable over `extra_axes`
    middle axes: (4,) stays (4,); per-block (N, 4) becomes
    (N, 1*extra, 4)."""
    a = jnp.asarray(cw, jnp.float32)
    if a.ndim == 2 and extra_axes:
        return a.reshape((a.shape[0],) + (1,) * extra_axes + (4,))
    return a



_QUANT_LEVELS_M1 = np.array(
    [1, 2, 3, 4, 5, 7, 9, 11, 15, 19, 23, 31], dtype=np.float32)

_FREE_BITS_1PLANE = {1: 115 - 4, 2: 111 - 4 - 10, 3: 108 - 4 - 10,
                     4: 105 - 4 - 10}


@dataclasses.dataclass
class EncoderTables:
    """Static per-BSD tensors used by the trials (host numpy)."""

    texel_count: int
    # 1-plane selected modes
    m1_quant: np.ndarray      # (M1,)
    m1_dm: np.ndarray         # (M1,)
    m1_weight_bits: np.ndarray
    m1_mode_index: np.ndarray  # raw 11-bit mode
    m1_always_count: int
    # 2-plane selected modes (packed range [M1, M1+M2))
    m2_quant: np.ndarray
    m2_dm: np.ndarray
    m2_weight_bits: np.ndarray
    m2_mode_index: np.ndarray
    # decimation stencils
    dec_int: np.ndarray       # (D, T, W)
    dec_sq: np.ndarray
    dec_f32: np.ndarray
    dec_wcount: np.ndarray    # (D,)
    dm_maxprec1: np.ndarray
    dm_maxprec2: np.ndarray
    dm_refprec1: np.ndarray   # (D,) bitmask
    dm_refprec2: np.ndarray
    # weight parity classes for grouped realign (D, W) + static class count
    dm_color: np.ndarray
    ncolors: int
    # weight quant LUTs
    weight_quant_unquant: np.ndarray  # (12, 32)
    weight_prev_next: np.ndarray      # (12, 65, 2)
    quant_mode_table: np.ndarray      # (10, 128)


def build_encoder_tables(bsd) -> EncoderTables:
    m1_end = bsd.block_mode_count_1plane_selected
    m2_end = bsd.block_mode_count_1plane_2plane_selected
    pn = np.zeros((12, 65, 2), np.int32)
    wuq = np.zeros((12, 32), np.int32)
    for q in range(12):
        t = quant.weight_quant_tables(q)
        pn[q] = t["prev_next"]
        # Value-rank -> unquant (ascending), NOT symbol order: the quantizer
        # indexes this by floor(ix * (levels-1)), which assumes monotonic
        # values (reference quant_to_unquant,
        # astcenc_weight_quant_xfer_tables.cpp).
        wuq[q, :len(t["unquant"])] = t["unquant"]
    D, _, W = bsd.dec_dense.shape
    dm_color = np.zeros((D, W), np.int32)
    is_3d = bsd.dim[2] > 1
    for d in range(D):
        wx, wy, wz = bsd.dm_weight_dims[d]
        for w in range(int(bsd.dm_weight_count[d])):
            x = w % wx
            y = (w // wx) % wy
            z = w // (wx * wy)
            dm_color[d, w] = (x & 1) | ((y & 1) << 1) | ((z & 1) << 2)
    return EncoderTables(
        texel_count=bsd.texel_count,
        m1_quant=bsd.bm_quant_mode[:m1_end].copy(),
        m1_dm=bsd.bm_decimation_mode[:m1_end].copy(),
        m1_weight_bits=bsd.bm_weight_bits[:m1_end].copy(),
        m1_mode_index=bsd.bm_mode_index[:m1_end].copy(),
        m1_always_count=bsd.block_mode_count_1plane_always,
        m2_quant=bsd.bm_quant_mode[m1_end:m2_end].copy(),
        m2_dm=bsd.bm_decimation_mode[m1_end:m2_end].copy(),
        m2_weight_bits=bsd.bm_weight_bits[m1_end:m2_end].copy(),
        m2_mode_index=bsd.bm_mode_index[m1_end:m2_end].copy(),
        dec_int=bsd.dec_dense.astype(np.float32),
        dec_sq=(bsd.dec_dense.astype(np.float32)) ** 2,
        dec_f32=bsd.dec_dense_f32,
        dec_wcount=bsd.dm_weight_count.copy(),
        dm_maxprec1=bsd.dm_maxprec_1plane.copy(),
        dm_maxprec2=bsd.dm_maxprec_2planes.copy(),
        dm_refprec1=bsd.dm_refprec_1plane.copy(),
        dm_refprec2=bsd.dm_refprec_2planes.copy(),
        dm_color=dm_color,
        ncolors=8 if is_3d else 4,
        weight_quant_unquant=wuq,
        weight_prev_next=pn,
        quant_mode_table=quant.quant_mode_table(),
    )


def empty_scb(N: int, T: int):
    """Per-block symbolic state, carried across trials."""
    return {
        "errorval": jnp.full((N,), jnp.float32(ERROR_CALC_DEFAULT)),
        "block_type_error": jnp.ones((N,), bool),
        "block_mode": jnp.zeros((N,), jnp.int32),
        "quant_mode": jnp.zeros((N,), jnp.int32),
        "partition_count": jnp.ones((N,), jnp.int32),
        "partition_index": jnp.zeros((N,), jnp.int32),
        "color_formats": jnp.zeros((N, 4), jnp.int32),
        "color_formats_matched": jnp.zeros((N,), bool),
        "color_values": jnp.zeros((N, 4, 8), jnp.int32),
        "plane2_component": jnp.full((N,), -1, jnp.int32),
        "weights": jnp.zeros((N, 64), jnp.int32),
        "weights2": jnp.zeros((N, 64), jnp.int32),
        "finished": jnp.zeros((N,), bool),
    }


def _decode_endpoints(profile, fmt, values):
    ep0, ep1, _, _ = cuq.unpack_color_endpoints(profile, fmt, values)
    return ep0, ep1


def _rgbm_trial_error(texels, color, cw, rgbm_scale):
    """RGBM perceptual trial error + M==0 encoding rejection.

    Reference: astcenc_decompress_symbolic.cpp:366-400 — any texel whose
    decoded M weight is zero invalidates the whole candidate; otherwise the
    error compares M-demultiplied colors.
    """
    m_zero = jnp.any(color[..., 3] == 0.0, axis=-1)          # (N,)
    scale = jnp.float32(rgbm_scale)
    dec = color[..., :3] * color[..., 3:4] * scale
    org = texels[..., :3] * texels[..., 3:4] * scale
    d3 = jnp.minimum(jnp.abs(org - dec), 1e15)
    cw3 = cw_bcast(cw, 1)[..., :3]
    err_t = jnp.minimum(jnp.sum(d3 * d3 * cw3, -1),
                        jnp.float32(ERROR_CALC_DEFAULT))
    err = jnp.sum(err_t, axis=-1)
    # The reference returns -ERROR_CALC_DEFAULT and the caller flips it to
    # +ERROR_CALC_DEFAULT while tagging the candidate as an error block; the
    # selection-visible effect is simply a maximal error.
    return jnp.where(m_zero, jnp.float32(ERROR_CALC_DEFAULT), err)


def trial_error_1plane(texels, pmask, fmt, values, wgrid, Mint, cw, profile,
                       u8_mask, ep=None, rgbm_scale=0.0, ep_t=None):
    """compute_symbolic_block_difference_1plane, batched.

    Reference: astcenc_decompress_symbolic.cpp:407-618.
    """
    infill = (8 + jnp.einsum("ntw,nw->nt", Mint,
                             wgrid.astype(jnp.float32))).astype(jnp.int32) >> 4
    if ep_t is not None:
        # Caller-hoisted per-texel endpoints, shared across error evals.
        ep0_t, ep1_t = ep_t
    else:
        if ep is not None:
            ep0, ep1 = ep
        else:
            ep0, ep1 = _decode_endpoints(profile, fmt, values)  # (N, P, 4)
        ep0_t = jnp.einsum("ntp,npc->ntc", pmask, ep0.astype(jnp.float32))
        ep1_t = jnp.einsum("ntp,npc->ntc", pmask, ep1.astype(jnp.float32))
    w = infill.astype(jnp.float32)[..., None]
    color = jnp.floor((ep0_t * (64.0 - w) + ep1_t * w + 32.0) / 64.0)
    if u8_mask:
        color = jnp.floor(color / 256.0) * 257.0
    if rgbm_scale > 0.0:
        return _rgbm_trial_error(texels, color, cw, rgbm_scale)
    d = jnp.minimum(jnp.abs(texels - color), 1e15)
    err_t = jnp.minimum(jnp.sum(d * d * cw_bcast(cw, 1), -1),
                        jnp.float32(ERROR_CALC_DEFAULT))
    return jnp.sum(err_t, axis=-1)


def trial_error_2plane(texels, fmt0, values0, wgrid1, wgrid2, p2c, Mint, cw,
                       profile, u8_mask, rgbm_scale=0.0, ep=None):
    """compute_symbolic_block_difference_2plane, batched (1 partition)."""
    if ep is not None:
        ep0, ep1 = ep
        ep0 = ep0.astype(jnp.float32)
        ep1 = ep1.astype(jnp.float32)
    else:
        ep0, ep1 = _decode_endpoints(profile, fmt0[:, None], values0[:, None])
        ep0 = ep0[:, 0].astype(jnp.float32)
        ep1 = ep1[:, 0].astype(jnp.float32)

    def infill(g):
        return ((8 + jnp.einsum("ntw,nw->nt", Mint, g.astype(jnp.float32)))
                .astype(jnp.int32) >> 4)

    w1 = infill(wgrid1).astype(jnp.float32)
    w2 = infill(wgrid2).astype(jnp.float32)
    lane = jnp.arange(4)
    use2 = lane[None, None, :] == p2c[:, None, None]
    w = jnp.where(use2, w2[..., None], w1[..., None])
    color = jnp.floor((ep0[:, None, :] * (64.0 - w)
                       + ep1[:, None, :] * w + 32.0) / 64.0)
    if u8_mask:
        color = jnp.floor(color / 256.0) * 257.0
    if rgbm_scale > 0.0:
        return _rgbm_trial_error(texels, color, cw, rgbm_scale)
    d = jnp.minimum(jnp.abs(texels - color), 1e15)
    err_t = jnp.minimum(jnp.sum(d * d * cw_bcast(cw, 1), -1),
                        jnp.float32(ERROR_CALC_DEFAULT))
    return jnp.sum(err_t, axis=-1)


def compress_trial_1plane(st, et: EncoderTables, cfg, profile: int,
                          u8_mask: bool, pot, counts, partition_index,
                          pc: int, only_always: bool, threshold, quant_limit,
                          scb):
    """One full 1-plane trial over a candidate partitioning.

    Args:
      st: block state dict (texels, data_min, data_max, grayscale, ...).
      et: encoder tables.
      cfg: ASTCConfig (static fields read here).
      pot: (N, T) partition-of-texel; counts: (N, 4).
      partition_index: (N,) raw seed.
      pc: static partition count.
      only_always: static; restrict to "always" modes.
      threshold: (N,) tune_errorval_threshold.
      quant_limit: (N,) per-block max weight quant.
      scb: carried symbolic state (updated in place semantics).

    Returns (scb, best_errorval_in_mode (N,)).
    """
    recs = trial1_records(st, et, cfg, profile, u8_mask, pot, counts, pc,
                          only_always, quant_limit, ~scb["finished"])
    return apply_records_1plane(scb, recs, threshold, pc, partition_index)


def _cap_cr(C: int, R: int):
    """Diagnostic caps on the candidate/refinement depth (perf attribution
    only — quality gates must run uncapped): ASTC_C_CAP / ASTC_R_CAP."""
    import os
    return (min(C, int(os.environ.get("ASTC_C_CAP", "99"))),
            min(R, int(os.environ.get("ASTC_R_CAP", "99"))))


def trial1_records(st, et: EncoderTables, cfg, profile: int,
                   u8_mask: bool, pot, counts, pc: int, only_always: bool,
                   quant_limit, ext_valid):
    """Heavy compute of a 1-plane trial: per-mode search + candidate
    refinement, independent of the carried symbolic state. Returns the
    per-record tensors consumed by apply_records_1plane — this split lets
    drivers fold several sequential trials (e.g. partition-seed candidates)
    into one batched invocation and replay the reference's sequential
    selection afterwards on cheap (N, C*K) tensors.

    Args are as compress_trial_1plane, except ext_valid: (N,) lanes that
    may refine (callers pass seed-validity & not-finished).
    """
    texels = st["texels"]
    N, T, _ = texels.shape
    cw = effective_cw(cfg, st)
    cw_s = st.get("cw_scale")

    # Static mode/decimation-axis slicing. The only_always pass touches a
    # handful of modes (often one), so shrink every per-mode and
    # per-decimation tensor to the "always" subset at trace time instead of
    # masking 200+ modes worth of dead work (reference iterates
    # block_mode_count_1plane_always, astcenc_compress_symbolic.cpp:433).
    M1_full = et.m1_quant.shape[0]
    sel = np.arange(et.m1_always_count if only_always else M1_full)
    quant_m = et.m1_quant[sel]
    dm_m_global = et.m1_dm[sel]
    weight_bits_sel = et.m1_weight_bits[sel]
    mode_index_sel = et.m1_mode_index[sel]
    dms_used = np.unique(dm_m_global)
    dm_remap = np.zeros(et.dec_int.shape[0], np.int32)
    dm_remap[dms_used] = np.arange(len(dms_used), dtype=np.int32)
    dm_m = dm_remap[dm_m_global]
    dec_int_np = et.dec_int[dms_used]
    dec_sq_np = et.dec_sq[dms_used]
    dec_f32_np = et.dec_f32[dms_used]
    dec_wcount_np = et.dec_wcount[dms_used]
    dm_maxprec1_np = et.dm_maxprec1[dms_used]
    dm_color_np = et.dm_color[dms_used]

    # Slice the weight axis to this pass's real maximum (e.g. the
    # only-always pass at 6x6 peaks at 30 of 36 slots; 8x8 2-plane at 28
    # of 64) — every (.., W, ..) tensor and kernel shrinks with it.
    W_used = int(min(dec_int_np.shape[2],
                     ((int(dec_wcount_np.max()) + 7) // 8) * 8))
    if W_used < dec_int_np.shape[2]:
        dec_int_np = dec_int_np[:, :, :W_used]
        dec_sq_np = dec_sq_np[:, :, :W_used]
        dec_f32_np = dec_f32_np[:, :, :W_used]
        dm_color_np = dm_color_np[:, :W_used]

    pmask = ideal_ops.partition_onehot(pot)

    # --- Ideal endpoints and weights (3 vs 4 components per block) ----------
    ei4 = ideal_ops.ideal_colors_and_weights(
        texels, pmask, counts, st["data_min"], st["data_max"], cw,
        (1, 1, 1, 1))
    ei3 = ideal_ops.ideal_colors_and_weights(
        texels, pmask, counts, st["data_min"], st["data_max"], cw,
        (1, 1, 1, 0), omitted_component=3)
    ua = st["uses_alpha"]

    def sel(a, b, dims):
        m = ua.reshape((N,) + (1,) * dims)
        return jnp.where(m, a, b)

    ei = {
        "weights": sel(ei4["weights"], ei3["weights"], 1),
        "weight_error_scale": sel(ei4["weight_error_scale"],
                                  ei3["weight_error_scale"], 1),
        "ep0": sel(ei4["ep0"], ei3["ep0"], 2),
        "ep1": sel(ei4["ep1"], ei3["ep1"], 2),
    }

    # --- min weight cutoff ----------------------------------------------------
    ep = (1.0 - ei["ep0"]) / (ei["ep1"] - ei["ep0"])   # (N, P, 4)
    use_ep = (ep > 0.5) & (ep < 10.0)
    lanes_ok = jnp.arange(4)[None, :] < pc             # partitions in use
    use_ep = use_ep & lanes_ok[None, :, None].reshape(1, 4, 1)
    min_ep = jnp.min(jnp.where(use_ep, ep, 10.0), axis=(1, 2))
    min_wt_cutoff = min_ep                             # (N,)

    D = dec_int_np.shape[0]
    W = dec_int_np.shape[2]
    M1 = quant_m.shape[0]
    wslots = np.arange(W)
    wvalid_np = wslots[None, :] < dec_wcount_np[:, None]
    max_wq = jnp.minimum(QUANT_32, quant_limit)        # (N,)

    # --- Endpoint format selection (front tables) ----------------------------
    bitcount_np = _FREE_BITS_1PLANE[pc] - weight_bits_sel
    mode_active_np = bitcount_np > 0

    eci = fmts.encoding_choice_errors(
        texels, pmask, counts, ei["ep0"], ei["ep1"], cw,
        st["is_luminance"], st["default_alpha"])
    if profile >= 2:
        be, fm = fmts.color_error_tables_hdr(eci, ei["ep0"], ei["ep1"],
                                             counts, cw,
                                             encode_hdr_alpha=(profile == 3))
    else:
        be, fm = fmts.color_error_tables_ldr(eci, ei["ep0"], ei["ep1"],
                                             counts, cw)
    if pc == 1:
        comb_err, comb_fmt = be[:, 0], fm[:, 0]
        mod_bits = 0
    else:
        comb_err, comb_fmt = fmts.combine_partitions(be, fm, pc)
        mod_bits = {2: 2, 3: 5, 4: 8}[pc]

    # A pass over M modes can produce at most M distinct candidates (the
    # only-always pass often has a single mode; refining C lanes of it
    # would triple the kernel cost for nothing).
    C = max(1, min(cfg.tune_candidate_limit, int(quant_m.shape[0])))
    R = cfg.tune_refinement_limit
    C, R = _cap_cr(C, R)
    NC = N * C

    def rep(x):
        return jnp.repeat(x, C, axis=0)

    tex_f = rep(texels)
    pmask_f = rep(pmask)
    counts_f = rep(counts)
    cw_f = rep(cw) if isinstance(cw, jnp.ndarray) else cw
    cws_f = rep(cw_s) if cw_s is not None else None

    use_ms = (gather_ops._use_pallas()
              and gather_ops._kernel_enabled("msearch")
              and T <= _KMAX_T and W <= 64
              and gather_ops.ms_feasible(T, len(quant_m)))
    if use_ms:
        # --- Fused Pallas trial front-end (see ops/msearch_pallas.py) -----
        # Decimated ideal weights, angular ranges, per-mode quantize +
        # weight-set error, format chain and top-C all run in VMEM; none
        # of the (N, D, W)/(N, M, W)/(N, M, T) tensors exist.
        mmeta = msearch_ops.make_mode_meta(
            quant_m, dm_m, weight_bits_sel, mode_index_sel,
            _FREE_BITS_1PLANE[pc], et.weight_quant_unquant,
            et.quant_mode_table, mod_bits, pc, ang.TUNE_MAX_ANGULAR_QUANT)
        ms_tabs = msearch_ops.MsTables(dec_int_np, dec_f32_np,
                                       dec_wcount_np, dm_maxprec1_np)
        cfmt4 = comb_fmt if pc > 1 else comb_fmt[..., None]
        ms = msearch_ops.mode_search(
            ms_tabs, ei["weights"], ei["weight_error_scale"],
            min_wt_cutoff, max_wq, comb_err, cfmt4, mmeta, C, pc)
        cand_mode_idx = ms["mode"]                       # (N, C) raw 11-bit
        cand_valid = ms["valid"]
        valid_f = (cand_valid & ext_valid[:, None]).reshape(NC)
        dm_f = ms["dm"].reshape(NC)
        wq_f = ms["wq"].reshape(NC)
        fmt_req_f = ms["fmt"].reshape(NC, pc)
        cq_f = ms["cq"].reshape(NC)
        cqm_f = ms["cqm"].reshape(NC)
        wgrid0 = ms["uq"].reshape(NC, W)
    else:
        # --- Ideal decimated weights + angular endpoints (XLA) ------------
        dec_ideal = ideal_ops.ideal_weights_for_decimation(
            ei["weights"], ei["weight_error_scale"],
            jnp.asarray(dec_int_np), jnp.asarray(dec_sq_np),
            jnp.asarray(dec_f32_np))                  # (N, D, W)
        maxprec = jnp.asarray(dm_maxprec1_np)[None, :]   # (1, D)
        max_precision = jnp.minimum(
            jnp.minimum(maxprec, ang.TUNE_MAX_ANGULAR_QUANT),
            max_wq[:, None])
        low_v, high_v = ang.angular_endpoints_for_quant_levels(
            dec_ideal, jnp.asarray(wvalid_np), max_precision)  # (N, D, 8)

        # --- Per-mode weight quantization + error -------------------------
        # low/high per (n, m)
        ang_ok = quant_m <= ang.TUNE_MAX_ANGULAR_QUANT
        ql_idx = np.where(ang_ok, quant_m, 0)
        # Static (mode -> (dec, quant)) selections as constant one-hot
        # matmuls; XLA lowers fancy indexing to gather, which scalarizes
        # on TPU.
        oh_dq = np.zeros((M1, D * 8), np.float32)
        oh_dq[np.arange(M1), dm_m * 8 + ql_idx] = 1.0
        low_flat = low_v.reshape(N, D * 8)
        high_flat = high_v.reshape(N, D * 8)
        low_m = jnp.where(jnp.asarray(ang_ok),
                          jnp.einsum("md,nd->nm", jnp.asarray(oh_dq),
                                     low_flat),
                          0.0)                             # (N, M1)
        high_m = jnp.where(jnp.asarray(ang_ok),
                           jnp.einsum("md,nd->nm", jnp.asarray(oh_dq),
                                      high_flat),
                           1.0)
        high_m = jnp.where(high_m > 1.02 * min_wt_cutoff[:, None], 1.0,
                           high_m)

        oh_md = np.zeros((M1, D), np.float32)
        oh_md[np.arange(M1), dm_m] = 1.0
        dec_ideal_by_mode = jnp.einsum("md,ndw->nmw", jnp.asarray(oh_md),
                                       dec_ideal)          # (N, M1, W)
        uqf, uq = ideal_ops.quantize_weights_for_modes(
            dec_ideal_by_mode, low_m, high_m,
            jnp.asarray(et.weight_quant_unquant),
            jnp.asarray(_QUANT_LEVELS_M1), jnp.asarray(quant_m))

        decf32_by_mode = jnp.asarray(dec_f32_np[dm_m])     # (M1, T, W)
        qwt_err = ideal_ops.weight_set_error(
            uqf, ei["weights"], ei["weight_error_scale"], decf32_by_mode)

        mode_ok = (jnp.asarray(mode_active_np)[None, :]
                   & (jnp.asarray(quant_m)[None, :] <= max_wq[:, None]))
        qwt_err = jnp.where(mode_ok, qwt_err, jnp.float32(1e38))

        bb = fmts.best_for_bitcount(comb_err, comb_fmt, et.quant_mode_table,
                                    bitcount_np, pc, mod_bits)
        total_err = jnp.where(qwt_err >= 1e37,
                              jnp.float32(ERROR_CALC_DEFAULT),
                              bb["error"] + qwt_err)
        cand_modes, cand_valid = fmts.select_candidates(total_err, C)

        # --- Candidate payload: candidates folded into the batch axis -----
        # Each candidate's refinement trajectory is independent of the
        # others; only the reference's take/skip bookkeeping is sequential.
        # We therefore run all candidates at once on an (N*C) batch, record
        # every (candidate, round) error/state, and reproduce the
        # reference's sequential selection order post-hoc (first record
        # beating the quality threshold wins, else the first global minimum
        # in visit order). The reference's cross-candidate catch-up
        # early-outs are intentionally not modeled — they only skip work
        # whose results we compute anyway.
        mode_index_j = jnp.asarray(mode_index_sel)
        quant_m_j = jnp.asarray(quant_m)
        dm_m_j = jnp.asarray(dm_m)

        cand_c = jnp.clip(cand_modes, 0, M1 - 1)             # (N, C)
        valid_f = (cand_valid & ext_valid[:, None]).reshape(NC)

        # Candidate-axis selections as one-hot contractions (values are
        # small ints, exact in f32); per-element gathers scalarize on TPU.
        ohc = lut_ops.onehot(cand_c, M1)                     # (N, C, M1)
        cand_mode_idx = jnp.einsum(
            "ncm,m->nc", ohc, mode_index_j.astype(jnp.float32)
            ).astype(jnp.int32)                              # (N, C)
        dm_f = jnp.einsum("ncm,m->nc", ohc, dm_m_j.astype(jnp.float32)
                          ).astype(jnp.int32).reshape(NC)
        wq_f = jnp.einsum("ncm,m->nc", ohc, quant_m_j.astype(jnp.float32)
                          ).astype(jnp.int32).reshape(NC)
        fmt_req_f = jnp.einsum("ncm,nmp->ncp", ohc,
                               bb["formats"].astype(jnp.float32)
                               ).astype(jnp.int32).reshape(NC, pc)
        cq_f = jnp.clip(jnp.einsum("ncm,nm->nc", ohc,
                                   bb["quant"].astype(jnp.float32)
                                   ).astype(jnp.int32), 4, 20).reshape(NC)
        cqm_f = jnp.clip(jnp.einsum("ncm,nm->nc", ohc,
                                    bb["quant_mod"].astype(jnp.float32)
                                    ).astype(jnp.int32), 0, 20).reshape(NC)
        wgrid0 = jnp.einsum("ncm,nmw->ncw", ohc, uq.astype(jnp.float32)
                            ).astype(jnp.int32).reshape(NC, W)
    def fit_and_pack(undec, ep0_c, ep1_c):
        """LS endpoint refit + color pack + decode for the current grid."""
        rc = recompute_ops.recompute_ideal_colors_1plane(
            tex_f, pmask_f, counts_f, undec, cw_f, ep0_c, ep1_c,
            is_hdr=(profile >= 2))
        ep0_c, ep1_c = rc["ep0"], rc["ep1"]

        def flat(x):
            return x[:, :pc].reshape(NC * pc, -1)

        fmt_p, vals_p = cph.pack_color_endpoints(
            profile, flat(ep0_c)[:, :4], flat(ep1_c)[:, :4],
            flat(rc["rgbs"])[:, :4], flat(rc["rgbo"])[:, :4],
            fmt_req_f.reshape(NC * pc), jnp.repeat(cq_f, pc))
        fmt_p = fmt_p.reshape(NC, pc)
        vals_p = vals_p.reshape(NC, pc, 8)

        matched = jnp.zeros((NC,), bool)
        use_q = cq_f
        if pc >= 2:
            all_same = (cq_f != cqm_f)
            all_same &= jnp.all(fmt_p == fmt_p[:, :1], axis=1)
            fmt_m, vals_m = cph.pack_color_endpoints(
                profile, flat(ep0_c)[:, :4], flat(ep1_c)[:, :4],
                flat(rc["rgbs"])[:, :4], flat(rc["rgbo"])[:, :4],
                fmt_req_f.reshape(NC * pc),
                jnp.repeat(jnp.clip(cqm_f, 4, 20), pc))
            fmt_m = fmt_m.reshape(NC, pc)
            vals_m = vals_m.reshape(NC, pc, 8)
            same_mod = jnp.all(fmt_m == fmt_m[:, :1], axis=1)
            matched = all_same & same_mod & (cqm_f >= 4)
            fmt_p = jnp.where(matched[:, None], fmt_m, fmt_p)
            vals_p = jnp.where(matched[:, None, None], vals_m, vals_p)
            use_q = jnp.where(matched, cqm_f, cq_f)

        fmt4 = jnp.zeros((NC, 4), jnp.int32).at[:, :pc].set(fmt_p)
        vals4 = jnp.zeros((NC, 4, 8), jnp.int32).at[:, :pc].set(vals_p)
        ep0i, ep1i = _decode_endpoints(profile, fmt4, vals4)
        return ep0_c, ep1_c, fmt4, vals4, use_q, matched, ep0i, ep1i

    use_rk = (gather_ops._use_pallas()
              and gather_ops._kernel_enabled("refine")
              and T <= _KMAX_T and W <= 64)
    ys_rounds = []
    if use_rk and profile < 2:
        # Whole-trial fused kernel: all R rounds of LS refit + LDR color
        # pack + decode + realign + trial errors run in VMEM
        # (see ops/refine_pallas.py::_trial1_full_kernel).
        rtabs = refine_ops.RefineTables(dec_int_np, dec_f32_np, dm_color_np,
                                        wvalid_np, et.weight_prev_next)
        pot_f = rep(pot)
        texk = refine_ops.pack_tex(tex_f)
        meta = refine_ops.pack_meta_full(wgrid0, dm_f, wq_f, valid_f,
                                         cq_f, cqm_f, fmt_req_f, pot_f, T)
        fmeta = jnp.concatenate(
            [rep(ei["ep0"]).reshape(NC, 16),
             rep(ei["ep1"]).reshape(NC, 16)], axis=1)
        (fmt4_k, vals4_k, useq_k, match_k, wpost_k, errpre_k,
         errpost_k) = refine_ops.trial1_refine_full(
            rtabs, meta, fmeta, texk, et.ncolors, u8_mask,
            cfg.channel_weights, R, pc,
            profile, cw_scale=cws_f, rgbm_scale=cfg.rgbm_scale)
        for r in range(R):
            w_pre = wgrid0 if r == 0 else wpost_k[r - 1]
            err_pre = (errpre_k if r == 0
                       else jnp.full((NC,), jnp.float32(1e30)))
            ys_rounds.append((fmt4_k[r], vals4_k[r], useq_k[r], match_k[r],
                              w_pre, err_pre, wpost_k[r], errpost_k[r]))
    elif use_rk:
        # Fused Pallas refine rounds: the stencil selections and per-texel
        # endpoint tensors never touch HBM (see ops/refine_pallas.py).
        rtabs = refine_ops.RefineTables(dec_int_np, dec_f32_np, dm_color_np,
                                        wvalid_np, et.weight_prev_next)
        pot_f = rep(pot)
        texk = refine_ops.pack_tex(tex_f)
        zero_ep = jnp.zeros((NC, 4, 4), jnp.int32)
        meta0 = refine_ops.pack_meta(wgrid0, dm_f, wq_f, valid_f,
                                     zero_ep, zero_ep, pot_f, T)
        _, _, undec, _, _ = refine_ops.refine_round_1plane(
            rtabs, meta0, texk, 0, u8_mask, cfg.channel_weights,
            cw_scale=cws_f, rgbm_scale=cfg.rgbm_scale)
        wgrid = wgrid0
        alive = valid_f
        ep0_c, ep1_c = rep(ei["ep0"]), rep(ei["ep1"])
        for r in range(R):
            (ep0_c, ep1_c, fmt4, vals4, use_q, matched,
             ep0i, ep1i) = fit_and_pack(undec, ep0_c, ep1_c)
            meta = refine_ops.pack_meta(wgrid, dm_f, wq_f, alive,
                                        ep0i, ep1i, pot_f, T)
            (new_w, adjusted, undec, err_pre_k,
             err_post_k) = refine_ops.refine_round_1plane(
                rtabs, meta, texk, et.ncolors, u8_mask,
                cfg.channel_weights, cw_scale=cws_f,
                rgbm_scale=cfg.rgbm_scale)
            if r == 0:
                err_pre = jnp.where(alive, err_pre_k, jnp.float32(1e30))
            else:
                err_pre = jnp.full((NC,), jnp.float32(1e30))
            w_pre = wgrid
            wgrid = jnp.where(alive[:, None], new_w, wgrid)
            err_post = jnp.where(alive, err_post_k, jnp.float32(1e30))
            alive = alive & adjusted
            ys_rounds.append((fmt4, vals4, use_q, matched, w_pre, err_pre,
                              wgrid, err_post))
    else:
        dec_int_j = jnp.asarray(dec_int_np)
        dec_f32_j = jnp.asarray(dec_f32_np)
        wvalid_j = jnp.asarray(wvalid_np)
        pn = jnp.asarray(et.weight_prev_next)
        color_j = jnp.asarray(dm_color_np)
        oh_dmf = lut_ops.onehot(dm_f, D)                 # (NC, D)
        Mint_f = jnp.einsum("nd,dtw->ntw", oh_dmf, dec_int_j)
        Mf32_f = jnp.einsum("nd,dtw->ntw", oh_dmf, dec_f32_j)
        incid_f = (Mint_f != 0).astype(jnp.float32)
        wvalid_f = jnp.einsum("nd,dw->nw", oh_dmf,
                              wvalid_j.astype(jnp.float32)) > 0.5
        color_f = jnp.einsum("nd,dw->nw", oh_dmf,
                             color_j.astype(jnp.float32)).astype(jnp.int32)

        def refine_step(rcarry, r):
            wgrid, ep0_c, ep1_c, alive = rcarry

            undec = jnp.einsum("ntw,nw->nt", Mf32_f,
                               wgrid.astype(jnp.float32)) / 64.0
            (ep0_c, ep1_c, fmt4, vals4, use_q, matched,
             ep0i, ep1i) = fit_and_pack(undec, ep0_c, ep1_c)
            # Per-texel endpoints, shared by both error evals and realign.
            ep0_t = jnp.einsum("ntp,npc->ntc", pmask_f,
                               ep0i.astype(jnp.float32))
            ep1_t = jnp.einsum("ntp,npc->ntc", pmask_f,
                               ep1i.astype(jnp.float32))

            if r == 0:
                # err_pre is only recorded for round 0 (the record stream is
                # [r0-pre, r0-post, r1-post, ...]); skip the dead eval else.
                err_pre = trial_error_1plane(
                    tex_f, pmask_f, fmt4, vals4, wgrid, Mint_f, cw_f, profile,
                    u8_mask, rgbm_scale=cfg.rgbm_scale, ep_t=(ep0_t, ep1_t))
                err_pre = jnp.where(alive, err_pre, jnp.float32(1e30))
            else:
                err_pre = jnp.full(wgrid.shape[:1], jnp.float32(1e30))
            w_pre = wgrid

            new_wgrid, adjusted = realign_ops.realign_decimated_grouped(
                wgrid, tex_f, pmask_f, ep0i, ep1i,
                cw_f, pn, wq_f, Mf32_f, incid_f, wvalid_f, color_f,
                et.ncolors, ep_t=(ep0_t, ep1_t))
            wgrid = jnp.where(alive[:, None], new_wgrid, wgrid)

            err_post = trial_error_1plane(
                tex_f, pmask_f, fmt4, vals4, wgrid, Mint_f, cw_f, profile,
                u8_mask, rgbm_scale=cfg.rgbm_scale, ep_t=(ep0_t, ep1_t))
            err_post = jnp.where(alive, err_post, jnp.float32(1e30))
            alive = alive & adjusted

            ys = (fmt4, vals4, use_q, matched, w_pre, err_pre, wgrid,
                  err_post)
            return (wgrid, ep0_c, ep1_c, alive), ys

        # Unrolled refinement (R is a small static count): a lax.scan here
        # costs a full copy of every carry per iteration on TPU and blocks
        # fusion across rounds.
        rcarry = (wgrid0, rep(ei["ep0"]), rep(ei["ep1"]), valid_f)
        for r in range(R):
            rcarry, y = refine_step(rcarry, r)
            ys_rounds.append(y)
    ys = tuple(jnp.stack([yr[i] for yr in ys_rounds], axis=0)
               for i in range(len(ys_rounds[0])))
    (fmt4_r, vals4_r, useq_r, match_r, wpre_r, epre_r, wpost_r,
     epost_r) = ys

    # Assemble records in reference visit order per candidate:
    #   [r0-pre, r0-post, r1-post, ..., r(R-1)-post]   -> K = R + 1
    K = R + 1

    def to_rec(pre0, post):
        # pre0: (NC,) from r=0; post: (R, NC) -> (N, C*K)
        r = jnp.concatenate([pre0[None], post], axis=0)     # (K, NC)
        return r.reshape(K, N, C).transpose(1, 2, 0).reshape(N, C * K)

    rec_err = to_rec(epre_r[0], epost_r)

    def state_rec(arrs_pre0, arrs_post):
        # (NC, ...) + (R, NC, ...) -> (N, C*K, ...)
        rr = jnp.concatenate([arrs_pre0[None], arrs_post], axis=0)
        shp = rr.shape[2:]
        return rr.reshape((K, N, C) + shp).transpose(
            (1, 2, 0) + tuple(range(3, 3 + len(shp)))).reshape(
            (N, C * K) + shp)

    rec_fmt = state_rec(fmt4_r[0], fmt4_r)
    rec_vals = state_rec(vals4_r[0], vals4_r)
    rec_useq = state_rec(useq_r[0], useq_r)
    rec_match = state_rec(match_r[0], match_r)
    rec_w = state_rec(wpre_r[0], wpost_r)
    rec_mode = jnp.repeat(cand_mode_idx, K, axis=1)      # (N, C*K)

    wg64 = jnp.zeros((N, rec_w.shape[1], 64), jnp.int32
                     ).at[:, :, :W].set(rec_w)
    return {"err": rec_err, "fmt": rec_fmt, "vals": rec_vals,
            "useq": rec_useq, "match": rec_match, "w64": wg64,
            "mode": rec_mode}


def apply_records_1plane(scb, recs, threshold, pc, partition_index):
    """Reference-order sequential selection over a trial's records.

    Cheap (N, C*K)-shaped tail of a 1-plane trial, separated so folded
    drivers can replay several trials' records sequentially against the
    running symbolic state.
    """
    rec_err = recs["err"]
    rec_fmt, rec_vals = recs["fmt"], recs["vals"]
    rec_useq, rec_match = recs["useq"], recs["match"]
    rec_mode, rec_w64 = recs["mode"], recs["w64"]
    N, CK = rec_err.shape

    # Sequential-take reproduction: first record that both improves on the
    # running best and beats the quality threshold freezes the outcome.
    prev_best = scb["errorval"]
    shifted = jnp.concatenate(
        [prev_best[:, None], rec_err[:, :-1]], axis=1)
    run_min_before = jax.lax.associative_scan(jnp.minimum, shifted, axis=1)
    is_take = rec_err < run_min_before
    is_hit = is_take & (rec_err < threshold[:, None])
    any_hit = jnp.any(is_hit, axis=1)
    first_hit = jnp.argmax(is_hit, axis=1)
    argmin_idx = jnp.argmin(rec_err, axis=1)
    win_idx = jnp.where(any_hit, first_hit, argmin_idx)

    oh_win = lut_ops.onehot(win_idx, CK)                  # (N, CK)
    win_err = jnp.einsum("nk,nk->n", oh_win, rec_err)
    best_in_mode = jnp.min(
        jnp.concatenate([rec_err,
                         jnp.full((N, 1), jnp.float32(ERROR_CALC_DEFAULT))],
                        axis=1), axis=1)

    take = (win_err < scb["errorval"]) & ~scb["finished"]

    def gather1(rec):
        # One-hot contraction over the record axis; rec payloads are small
        # ints (modes, formats, quants, weights 0..64), exact in f32.
        ohw = oh_win.reshape((N, CK) + (1,) * (rec.ndim - 2))
        out = jnp.sum(ohw * rec.astype(jnp.float32), axis=1)
        return out.astype(rec.dtype) if rec.dtype != jnp.float32 else out

    wg64 = gather1(rec_w64)
    new_scb = dict(scb)
    new_scb["errorval"] = jnp.where(take, win_err, scb["errorval"])
    new_scb["block_type_error"] = scb["block_type_error"] & ~take
    new_scb["block_mode"] = jnp.where(take, gather1(rec_mode),
                                      scb["block_mode"])
    new_scb["quant_mode"] = jnp.where(take, gather1(rec_useq),
                                      scb["quant_mode"])
    new_scb["partition_count"] = jnp.where(take, pc, scb["partition_count"])
    new_scb["partition_index"] = jnp.where(take, partition_index,
                                           scb["partition_index"])
    new_scb["color_formats"] = jnp.where(take[:, None], gather1(rec_fmt),
                                         scb["color_formats"])
    new_scb["color_formats_matched"] = jnp.where(take, gather1(rec_match),
                                                 scb["color_formats_matched"])
    new_scb["color_values"] = jnp.where(take[:, None, None],
                                        gather1(rec_vals),
                                        scb["color_values"])
    new_scb["plane2_component"] = jnp.where(take, -1,
                                            scb["plane2_component"])
    new_scb["weights"] = jnp.where(take[:, None], wg64, scb["weights"])

    return new_scb, best_in_mode


_PLANE_COMPONENT_MASKS = {
    0: ((0, 1, 1, 0), (0, 1, 1, 1)),   # plane1 no-alpha / with-alpha masks
    1: ((1, 0, 1, 0), (1, 0, 1, 1)),
    2: ((1, 1, 0, 0), (1, 1, 0, 1)),
    3: (None, (1, 1, 1, 0)),
}


def compress_trial_2planes(st, et: EncoderTables, cfg, profile: int,
                           u8_mask: bool, p2c_vec, threshold,
                           quant_limit, scb, active_in):
    """One 2-plane trial over a per-block plane-2 component (1 partition).

    Reference: compress_symbolic_block_for_partition_2planes (:715-1037).
    The plane-2 component is traced so the same compiled trial serves all
    four component passes of the driver.

    Args:
      p2c_vec: (N,) int32 plane-2 component per block.
      active_in: (N,) mask of blocks participating in this trial.

    Returns (scb, best_errorval_in_mode (N,)).
    """
    ext_valid = ~scb["finished"] & active_in
    recs = trial2_records(st, et, cfg, profile, u8_mask, quant_limit,
                          ext_valid, p2c_vec=p2c_vec)
    return apply_records_2plane(scb, recs, threshold, p2c_vec, active_in)


def trial2_records(st, et: EncoderTables, cfg, profile: int,
                   u8_mask: bool, quant_limit, ext_valid, p2c_vec=None,
                   fold_all: bool = False):
    """Heavy compute of the 2-plane trial(s); see trial1_records.

    With fold_all=True the four plane-2 component passes are folded into a
    single (4N,) comp-major batch (comp order 3,2,1,0 — the reference's
    visit order): the per-component ideal endpoint/weight variants the
    single-call path computes and discards 3/4 of become the batch rows.
    Returns records shaped (4N, C*K); the driver reshapes and replays them
    sequentially. quant_limit/ext_valid are (N,) / (N, 4) in this mode.
    """
    texels = st["texels"]
    N, T, _ = texels.shape
    cw = effective_cw(cfg, st)
    cw_s = st.get("cw_scale")

    pot1 = jnp.zeros((N, T), jnp.int32)
    counts1 = jnp.zeros((N, 4), jnp.int32).at[:, 0].set(T)
    pmask = ideal_ops.partition_onehot(pot1)

    # --- Ideal endpoints/weights for both planes ------------------------------
    # Compute the per-component variants and select by the traced component.
    def sel_comp(variants):
        out = variants[0]
        for comp_i in range(1, len(variants)):
            v = variants[comp_i]
            for k in out:
                m = (p2c == comp_i).reshape((N,) + (1,) * (out[k].ndim - 1))
                out = dict(out)
                out[k] = jnp.where(m, v[k], out[k])
        return out

    ei1_variants = []
    ei2_variants = []
    keys = ("weights", "weight_error_scale", "ep0", "ep1")
    for comp_i in range(4):
        mask_noalpha, mask_alpha = _PLANE_COMPONENT_MASKS[comp_i]
        ei1a = ideal_ops.ideal_colors_and_weights(
            texels, pmask, counts1, st["data_min"], st["data_max"], cw,
            mask_alpha, omitted_component=comp_i)
        if mask_noalpha is not None:
            ei1n = ideal_ops.ideal_colors_and_weights(
                texels, pmask, counts1, st["data_min"], st["data_max"], cw,
                mask_noalpha)
            ua = st["uses_alpha"]

            def sel(a, b):
                m = ua.reshape((N,) + (1,) * (a.ndim - 1))
                return jnp.where(m, a, b)

            ei1_variants.append({k: sel(ei1a[k], ei1n[k]) for k in keys})
        else:
            ei1_variants.append({k: ei1a[k] for k in keys})

        comp_mask2 = tuple(1 if i == comp_i else 0 for i in range(4))
        e2 = ideal_ops.ideal_colors_and_weights(
            texels, pmask, counts1, st["data_min"], st["data_max"], cw,
            comp_mask2)
        ei2_variants.append({k: e2[k] for k in keys})

    if fold_all:
        order = (3, 2, 1, 0)
        ei1 = {k: jnp.concatenate([ei1_variants[c][k] for c in order], 0)
               for k in keys}
        ei2 = {k: jnp.concatenate([ei2_variants[c][k] for c in order], 0)
               for k in keys}
        p2c = jnp.concatenate(
            [jnp.full((N,), c, jnp.int32) for c in order], 0)
        texels = jnp.concatenate([texels] * 4, 0)
        st = {"texels": texels,
              "is_luminance": jnp.concatenate([st["is_luminance"]] * 4, 0),
              "default_alpha": st["default_alpha"],   # python scalar
              "data_mean": jnp.concatenate([st["data_mean"]] * 4, 0)}
        quant_limit = jnp.concatenate([quant_limit] * 4, 0)
        ext_valid = ext_valid.T.reshape(4 * N)
        if isinstance(cw, jnp.ndarray):
            cw = jnp.concatenate([cw] * 4, 0)
        if cw_s is not None:
            cw_s = jnp.concatenate([cw_s] * 4, 0)
        N = 4 * N
        pmask = ideal_ops.partition_onehot(jnp.zeros((N, T), jnp.int32))
        counts1 = jnp.zeros((N, 4), jnp.int32).at[:, 0].set(T)
    else:
        p2c = p2c_vec
        ei1 = sel_comp(ei1_variants)
        ei2 = sel_comp(ei2_variants)

    # --- Ideal decimated weights for both planes -------------------------------
    # --- min weight cutoffs (reference: :763-785) ------------------------------
    lane = jnp.arange(4)
    err_lane = lane[None, :] == p2c[:, None]
    ep1r = (1.0 - ei1["ep0"][:, 0]) / (ei1["ep1"][:, 0] - ei1["ep0"][:, 0])
    use1 = (ep1r > 0.5) & (ep1r < 10.0)
    min_ep1 = jnp.where(use1, ep1r, 10.0)
    min_ep1 = jnp.where(err_lane, jnp.float32(ERROR_CALC_DEFAULT), min_ep1)
    min_wt_cutoff1 = jnp.min(min_ep1, axis=1)

    ep2r = (1.0 - ei2["ep0"][:, 0]) / (ei2["ep1"][:, 0] - ei2["ep0"][:, 0])
    use2 = (ep2r > 0.5) & (ep2r < 10.0)
    min_ep2 = jnp.where(use2, ep2r, 10.0)
    min_wt_cutoff2 = jnp.min(
        jnp.where(err_lane, min_ep2, jnp.float32(ERROR_CALC_DEFAULT)), axis=1)

    # Decimation/weight-axis slicing to the 2-plane mode subset (2-plane
    # grids are small: e.g. 25 of 36 weight slots at 6x6, 28 of 64 at 8x8).
    quant_m = et.m2_quant
    M2 = quant_m.shape[0]
    assert M2 > 0, "caller must guard the no-2plane-modes case"
    dms_used = np.unique(et.m2_dm)
    dm_remap = np.zeros(et.dec_int.shape[0], np.int32)
    dm_remap[dms_used] = np.arange(len(dms_used), dtype=np.int32)
    dm_m = dm_remap[et.m2_dm]
    dec2_int = et.dec_int[dms_used]
    dec2_sq = et.dec_sq[dms_used]
    dec2_f32 = et.dec_f32[dms_used]
    dec2_wcount = et.dec_wcount[dms_used]
    dm2_maxprec = et.dm_maxprec2[dms_used]
    dm2_color = et.dm_color[dms_used]
    W_used = int(min(dec2_int.shape[2],
                     ((int(dec2_wcount.max()) + 7) // 8) * 8))
    if W_used < dec2_int.shape[2]:
        dec2_int = dec2_int[:, :, :W_used]
        dec2_sq = dec2_sq[:, :, :W_used]
        dec2_f32 = dec2_f32[:, :, :W_used]
        dm2_color = dm2_color[:, :W_used]

    W = dec2_int.shape[2]
    D2 = dec2_int.shape[0]
    wvalid_np = np.arange(W)[None, :] < dec2_wcount[:, None]
    max_wq = jnp.minimum(QUANT_32, quant_limit)

    # --- Merged endpoints + format tables --------------------------------------
    bitcount_np = 109 - et.m2_weight_bits

    sep = err_lane[:, None, :]  # (N, 1, 4)
    ep0m = jnp.where(sep, ei2["ep0"], ei1["ep0"])
    ep1m = jnp.where(sep, ei2["ep1"], ei1["ep1"])

    eci = fmts.encoding_choice_errors(
        texels, pmask, counts1, ep0m, ep1m, cw,
        st["is_luminance"], st["default_alpha"])
    if profile >= 2:
        be, fm = fmts.color_error_tables_hdr(eci, ep0m, ep1m, counts1, cw,
                                             encode_hdr_alpha=(profile == 3))
    else:
        be, fm = fmts.color_error_tables_ldr(eci, ep0m, ep1m, counts1, cw)

    C = max(1, min(cfg.tune_candidate_limit, int(M2)))
    R = cfg.tune_refinement_limit
    C, R = _cap_cr(C, R)
    NC = N * C

    pn = jnp.asarray(et.weight_prev_next)
    wvalid_j = jnp.asarray(wvalid_np)
    color_j = jnp.asarray(dm2_color)

    def rep(x):
        return jnp.repeat(x, C, axis=0)

    tex_f = rep(texels)
    pmask_f = rep(pmask)
    p2c_f = rep(p2c)
    mean_f = rep(st["data_mean"])
    p2lanes_f = rep(err_lane)
    cw_f = rep(cw) if isinstance(cw, jnp.ndarray) else cw
    cws_f = rep(cw_s) if cw_s is not None else None

    use_ms = (gather_ops._use_pallas()
              and gather_ops._kernel_enabled("msearch")
              and T <= _KMAX_T and W <= 64
              and gather_ops.ms_feasible(T, len(quant_m)))
    if use_ms:
        # --- Fused Pallas trial front-end, both planes in one kernel ------
        # (see ops/msearch_pallas.py; the two=True layout carries plane-2
        # ideal weights/scales in the upper input rows, and both planes'
        # decimated-ideal + angular stages run in VMEM).
        mmeta = msearch_ops.make_mode_meta(
            quant_m, dm_m, et.m2_weight_bits, et.m2_mode_index, 109,
            et.weight_quant_unquant, et.quant_mode_table, 0, 1,
            ang.TUNE_MAX_ANGULAR_QUANT)
        ms_tabs = msearch_ops.MsTables(dec2_int, dec2_f32,
                                       dec2_wcount, dm2_maxprec)
        ms = msearch_ops.mode_search(
            ms_tabs, ei1["weights"], ei1["weight_error_scale"],
            min_wt_cutoff1, max_wq, be[:, 0], fm[:, 0][..., None],
            mmeta, C, 1, wei2=ei2["weights"],
            wes2=ei2["weight_error_scale"], mcut2=min_wt_cutoff2)
        cand_mode_idx = ms["mode"]                       # (N, C) raw 11-bit
        cand_valid = ms["valid"]
        valid_f = (cand_valid & ext_valid[:, None]).reshape(NC)
        dm_f = ms["dm"].reshape(NC)
        wq_f = ms["wq"].reshape(NC)
        fmt_req_f = ms["fmt"][:, :, 0].reshape(NC)
        cq_c = ms["cq"]                                  # clipped 4..20
        cq_f = cq_c.reshape(NC)
        wg1_0 = ms["uq"].reshape(NC, W)
        wg2_0 = ms["uq2"].reshape(NC, W)
    else:
        # --- Ideal decimated weights + angular endpoints (XLA) ------------
        dec_int_j = jnp.asarray(dec2_int)
        dec_sq_j = jnp.asarray(dec2_sq)
        dec_f32_j = jnp.asarray(dec2_f32)
        di1 = ideal_ops.ideal_weights_for_decimation(
            ei1["weights"], ei1["weight_error_scale"], dec_int_j,
            dec_sq_j, dec_f32_j)
        di2 = ideal_ops.ideal_weights_for_decimation(
            ei2["weights"], ei2["weight_error_scale"], dec_int_j,
            dec_sq_j, dec_f32_j)
        maxprec = jnp.asarray(dm2_maxprec)[None, :]
        max_precision = jnp.minimum(
            jnp.minimum(maxprec, ang.TUNE_MAX_ANGULAR_QUANT),
            max_wq[:, None])
        low1, high1 = ang.angular_endpoints_for_quant_levels(
            di1, jnp.asarray(wvalid_np), max_precision)
        low2, high2 = ang.angular_endpoints_for_quant_levels(
            di2, jnp.asarray(wvalid_np), max_precision)

        # --- Per-mode quantized weights + error ---------------------------
        ang_ok = quant_m <= ang.TUNE_MAX_ANGULAR_QUANT
        ql_idx = np.where(ang_ok, quant_m, 0)
        oh_dq = np.zeros((M2, D2 * 8), np.float32)
        oh_dq[np.arange(M2), dm_m * 8 + ql_idx] = 1.0
        oh_dq_j = jnp.asarray(oh_dq)
        oh_md = np.zeros((M2, D2), np.float32)
        oh_md[np.arange(M2), dm_m] = 1.0
        oh_md_j = jnp.asarray(oh_md)

        def mode_range(low_v, high_v, cutoff):
            lo = jnp.where(jnp.asarray(ang_ok),
                           jnp.einsum("md,nd->nm", oh_dq_j,
                                      low_v.reshape(N, D2 * 8)), 0.0)
            hi = jnp.where(jnp.asarray(ang_ok),
                           jnp.einsum("md,nd->nm", oh_dq_j,
                                      high_v.reshape(N, D2 * 8)), 1.0)
            hi = jnp.where(hi > 1.02 * cutoff[:, None], 1.0, hi)
            return lo, hi

        lo1m, hi1m = mode_range(low1, high1, min_wt_cutoff1)
        lo2m, hi2m = mode_range(low2, high2, min_wt_cutoff2)

        di1_m = jnp.einsum("md,ndw->nmw", oh_md_j, di1)
        di2_m = jnp.einsum("md,ndw->nmw", oh_md_j, di2)
        uqf1, uq1 = ideal_ops.quantize_weights_for_modes(
            di1_m, lo1m, hi1m, jnp.asarray(et.weight_quant_unquant),
            jnp.asarray(_QUANT_LEVELS_M1), jnp.asarray(quant_m))
        uqf2, uq2 = ideal_ops.quantize_weights_for_modes(
            di2_m, lo2m, hi2m, jnp.asarray(et.weight_quant_unquant),
            jnp.asarray(_QUANT_LEVELS_M1), jnp.asarray(quant_m))

        decf32_by_mode = jnp.asarray(dec2_f32[dm_m])
        qwt_err = (ideal_ops.weight_set_error(
            uqf1, ei1["weights"], ei1["weight_error_scale"], decf32_by_mode)
            + ideal_ops.weight_set_error(
                uqf2, ei2["weights"], ei2["weight_error_scale"],
                decf32_by_mode))
        mode_ok = jnp.asarray(quant_m)[None, :] <= max_wq[:, None]
        qwt_err = jnp.where(mode_ok, qwt_err, jnp.float32(1e38))

        bb = fmts.best_for_bitcount(be[:, 0], fm[:, 0], et.quant_mode_table,
                                    bitcount_np, 1, 0)
        total_err = jnp.where(qwt_err >= 1e37,
                              jnp.float32(ERROR_CALC_DEFAULT),
                              bb["error"] + qwt_err)
        cand_modes, cand_valid = fmts.select_candidates(total_err, C)

        # Candidate payload selections (one-hot contractions; see the
        # 1-plane variant for rationale).
        mode_index_j = jnp.asarray(et.m2_mode_index)
        quant_m_j = jnp.asarray(quant_m)
        dm_m_j = jnp.asarray(dm_m)

        cand_c = jnp.clip(cand_modes, 0, M2 - 1)
        valid_f = (cand_valid & ext_valid[:, None]).reshape(NC)

        ohc = lut_ops.onehot(cand_c, M2)                 # (N, C, M2)
        cand_mode_idx = jnp.einsum(
            "ncm,m->nc", ohc, mode_index_j.astype(jnp.float32)
            ).astype(jnp.int32)                          # (N, C)
        dm_f = jnp.einsum("ncm,m->nc", ohc, dm_m_j.astype(jnp.float32)
                          ).astype(jnp.int32).reshape(NC)
        wq_f = jnp.einsum("ncm,m->nc", ohc, quant_m_j.astype(jnp.float32)
                          ).astype(jnp.int32).reshape(NC)
        fmt_req_f = jnp.einsum("ncm,nm->nc", ohc,
                               bb["formats"][:, :, 0].astype(jnp.float32)
                               ).astype(jnp.int32).reshape(NC)
        cq_raw = jnp.einsum("ncm,nm->nc", ohc,
                            bb["quant"].astype(jnp.float32)
                            ).astype(jnp.int32)
        cq_c = jnp.clip(cq_raw, 4, 20)
        cq_f = cq_c.reshape(NC)
        wg1_0 = jnp.einsum("ncm,nmw->ncw", ohc, uq1.astype(jnp.float32)
                           ).astype(jnp.int32).reshape(NC, W)
        wg2_0 = jnp.einsum("ncm,nmw->ncw", ohc, uq2.astype(jnp.float32)
                           ).astype(jnp.int32).reshape(NC, W)
    def fit_and_pack2(u1, u2, ep0_c, ep1_c):
        rc = recompute_ops.recompute_ideal_colors_2planes(
            tex_f, u1, u2, p2c_f, cw_f, mean_f, ep0_c, ep1_c,
            is_hdr=(profile >= 2))
        ep0_c, ep1_c = rc["ep0"], rc["ep1"]
        fmt_p, vals_p = cph.pack_color_endpoints(
            profile, ep0_c, ep1_c, rc["rgbs"], rc["rgbo"], fmt_req_f, cq_f)
        fmt4 = jnp.zeros((NC, 4), jnp.int32).at[:, 0].set(fmt_p)
        vals4 = jnp.zeros((NC, 4, 8), jnp.int32).at[:, 0].set(vals_p)
        ep0i, ep1i = _decode_endpoints(profile, fmt4, vals4)
        return ep0_c, ep1_c, fmt_p, vals_p, fmt4, vals4, ep0i, ep1i

    T2 = texels.shape[1]
    use_rk = (gather_ops._use_pallas()
              and gather_ops._kernel_enabled("refine")
              and T2 <= _KMAX_T and W <= 63)
    ys_rounds = []
    if use_rk and profile < 2:
        # Whole-trial fused kernel (see _trial2_full_kernel).
        rtabs = refine_ops.RefineTables(dec2_int, dec2_f32, dm2_color,
                                        wvalid_np, et.weight_prev_next)
        texk = refine_ops.pack_tex(tex_f)
        meta = refine_ops.pack_meta_full2(wg1_0, wg2_0, dm_f, wq_f, valid_f,
                                          cq_f, fmt_req_f, p2c_f)
        fmeta = jnp.pad(jnp.concatenate(
            [rep(ep0m[:, 0]), rep(ep1m[:, 0]), mean_f], axis=1),
            ((0, 0), (0, 4)))
        (fmt_k, vals_k, w1_k, w2_k, errpre_k,
         errpost_k) = refine_ops.trial2_refine_full(
            rtabs, meta, fmeta, texk, et.ncolors, u8_mask,
            cfg.channel_weights, R, profile, cw_scale=cws_f,
            rgbm_scale=cfg.rgbm_scale)
        for r in range(R):
            fmt4 = jnp.zeros((NC, 4), jnp.int32).at[:, 0].set(fmt_k[r])
            vals4 = jnp.zeros((NC, 4, 8), jnp.int32).at[:, 0].set(vals_k[r])
            w1_pre = wg1_0 if r == 0 else w1_k[r - 1]
            w2_pre = wg2_0 if r == 0 else w2_k[r - 1]
            err_pre = (errpre_k if r == 0
                       else jnp.full((NC,), jnp.float32(1e30)))
            ys_rounds.append((fmt4, vals4, w1_pre, w2_pre, err_pre,
                              w1_k[r], w2_k[r], errpost_k[r]))
    elif use_rk:
        rtabs = refine_ops.RefineTables(dec2_int, dec2_f32, dm2_color,
                                        wvalid_np, et.weight_prev_next)
        texk = refine_ops.pack_tex(tex_f)
        zero4 = jnp.zeros((NC, 4), jnp.int32)
        meta0 = refine_ops.pack_meta_2plane(wg1_0, wg2_0, dm_f, wq_f,
                                            valid_f, p2c_f, zero4, zero4)
        _, _, _, u1, u2, _, _ = refine_ops.refine_round_2plane(
            rtabs, meta0, texk, 0, u8_mask, cfg.channel_weights,
            cw_scale=cws_f, rgbm_scale=cfg.rgbm_scale)
        wg1, wg2 = wg1_0, wg2_0
        alive = valid_f
        ep0_c, ep1_c = rep(ep0m[:, 0]), rep(ep1m[:, 0])
        for r in range(R):
            (ep0_c, ep1_c, fmt_p, vals_p, fmt4, vals4,
             ep0i, ep1i) = fit_and_pack2(u1, u2, ep0_c, ep1_c)
            meta = refine_ops.pack_meta_2plane(
                wg1, wg2, dm_f, wq_f, alive, p2c_f,
                ep0i[:, 0], ep1i[:, 0])
            (nw1, nw2, adjusted, u1, u2, err_pre_k,
             err_post_k) = refine_ops.refine_round_2plane(
                rtabs, meta, texk, et.ncolors, u8_mask,
                cfg.channel_weights, cw_scale=cws_f,
                rgbm_scale=cfg.rgbm_scale)
            if r == 0:
                err_pre = jnp.where(alive, err_pre_k, jnp.float32(1e30))
            else:
                err_pre = jnp.full((NC,), jnp.float32(1e30))
            w1_pre, w2_pre = wg1, wg2
            wg1 = jnp.where(alive[:, None], nw1, wg1)
            wg2 = jnp.where(alive[:, None], nw2, wg2)
            err_post = jnp.where(alive, err_post_k, jnp.float32(1e30))
            alive = alive & adjusted
            ys_rounds.append((fmt4, vals4, w1_pre, w2_pre, err_pre,
                              wg1, wg2, err_post))
    else:
        oh_dmf = lut_ops.onehot(dm_f, D2)                # (NC, D2)
        Mint_f = jnp.einsum("nd,dtw->ntw", oh_dmf, jnp.asarray(dec2_int))
        Mf32_f = jnp.einsum("nd,dtw->ntw", oh_dmf, jnp.asarray(dec2_f32))
        incid_f = (Mint_f != 0).astype(jnp.float32)
        wvalid_f = jnp.einsum("nd,dw->nw", oh_dmf,
                              wvalid_j.astype(jnp.float32)) > 0.5
        color_f = jnp.einsum("nd,dw->nw", oh_dmf,
                             color_j.astype(jnp.float32)).astype(jnp.int32)

        def refine_step(rcarry, r):
            wg1, wg2, ep0_c, ep1_c, alive = rcarry

            u1 = jnp.einsum("ntw,nw->nt", Mf32_f,
                            wg1.astype(jnp.float32)) / 64.0
            u2 = jnp.einsum("ntw,nw->nt", Mf32_f,
                            wg2.astype(jnp.float32)) / 64.0
            (ep0_c, ep1_c, fmt_p, vals_p, fmt4, vals4,
             ep0i, ep1i) = fit_and_pack2(u1, u2, ep0_c, ep1_c)
            ep_pair = (ep0i[:, 0], ep1i[:, 0])
            # Single-partition trial: the per-texel endpoint "einsum" is a
            # plain broadcast, shared by error evals and realign passes.
            ep0_t = jnp.broadcast_to(ep0i[:, :1].astype(jnp.float32),
                                     tex_f.shape)
            ep1_t = jnp.broadcast_to(ep1i[:, :1].astype(jnp.float32),
                                     tex_f.shape)

            if r == 0:
                err_pre = trial_error_2plane(
                    tex_f, fmt_p, vals_p, wg1, wg2, p2c_f, Mint_f, cw_f,
                    profile, u8_mask, rgbm_scale=cfg.rgbm_scale, ep=ep_pair)
                err_pre = jnp.where(alive, err_pre, jnp.float32(1e30))
            else:
                err_pre = jnp.full(wg1.shape[:1], jnp.float32(1e30))
            w1_pre, w2_pre = wg1, wg2

            nw1, adj1 = realign_ops.realign_decimated_grouped(
                wg1, tex_f, pmask_f, ep0i, ep1i, cw_f, pn, wq_f, Mf32_f,
                incid_f, wvalid_f, color_f, et.ncolors,
                plane_mask=p2lanes_f, ep_t=(ep0_t, ep1_t))
            nw2, adj2 = realign_ops.realign_decimated_grouped(
                wg2, tex_f, pmask_f, ep0i, ep1i, cw_f, pn, wq_f, Mf32_f,
                incid_f, wvalid_f, color_f, et.ncolors,
                plane_mask=~p2lanes_f, ep_t=(ep0_t, ep1_t))
            wg1 = jnp.where(alive[:, None], nw1, wg1)
            wg2 = jnp.where(alive[:, None], nw2, wg2)
            adjusted = adj1 | adj2

            err_post = trial_error_2plane(
                tex_f, fmt_p, vals_p, wg1, wg2, p2c_f, Mint_f, cw_f, profile,
                u8_mask, rgbm_scale=cfg.rgbm_scale, ep=ep_pair)
            err_post = jnp.where(alive, err_post, jnp.float32(1e30))
            alive = alive & adjusted

            ys = (fmt4, vals4, w1_pre, w2_pre, err_pre, wg1, wg2, err_post)
            return (wg1, wg2, ep0_c, ep1_c, alive), ys

        # Unrolled refinement; see the 1-plane variant for rationale.
        rcarry = (wg1_0, wg2_0, rep(ep0m[:, 0]), rep(ep1m[:, 0]), valid_f)
        for r in range(R):
            rcarry, y = refine_step(rcarry, r)
            ys_rounds.append(y)
    ys = tuple(jnp.stack([yr[i] for yr in ys_rounds], axis=0)
               for i in range(len(ys_rounds[0])))
    (fmt4_r, vals4_r, w1pre_r, w2pre_r, epre_r, w1post_r, w2post_r,
     epost_r) = ys

    K = R + 1

    def state_rec(arrs_pre0, arrs_post):
        rr = jnp.concatenate([arrs_pre0[None], arrs_post], axis=0)
        shp = rr.shape[2:]
        return rr.reshape((K, N, C) + shp).transpose(
            (1, 2, 0) + tuple(range(3, 3 + len(shp)))).reshape(
            (N, C * K) + shp)

    rec_err = state_rec(epre_r[0], epost_r)
    rec_fmt = state_rec(fmt4_r[0], fmt4_r)
    rec_vals = state_rec(vals4_r[0], vals4_r)
    rec_w1 = state_rec(w1pre_r[0], w1post_r)
    rec_w2 = state_rec(w2pre_r[0], w2post_r)
    rec_mode = jnp.repeat(cand_mode_idx, K, axis=1)
    rec_q = jnp.repeat(cq_c, K, axis=1)

    CK2 = rec_err.shape[1]
    w1_64 = jnp.zeros((N, CK2, 64), jnp.int32).at[:, :, :W].set(rec_w1)
    w2_64 = jnp.zeros((N, CK2, 64), jnp.int32).at[:, :, :W].set(rec_w2)
    return {"err": rec_err, "fmt": rec_fmt, "vals": rec_vals,
            "q": rec_q, "mode": rec_mode, "w1_64": w1_64, "w2_64": w2_64}


def apply_records_2plane(scb, recs, threshold, p2c, active_in):
    """Reference-order sequential selection over a 2-plane trial's records
    (cheap tail; see apply_records_1plane)."""
    rec_err = recs["err"]
    rec_fmt, rec_vals = recs["fmt"], recs["vals"]
    rec_q, rec_mode = recs["q"], recs["mode"]
    rec_w1_64, rec_w2_64 = recs["w1_64"], recs["w2_64"]
    N, _ = rec_err.shape

    prev_best = scb["errorval"]
    shifted = jnp.concatenate([prev_best[:, None], rec_err[:, :-1]], axis=1)
    run_min_before = jax.lax.associative_scan(jnp.minimum, shifted, axis=1)
    is_take = rec_err < run_min_before
    is_hit = is_take & (rec_err < threshold[:, None])
    any_hit = jnp.any(is_hit, axis=1)
    first_hit = jnp.argmax(is_hit, axis=1)
    argmin_idx = jnp.argmin(rec_err, axis=1)
    win_idx = jnp.where(any_hit, first_hit, argmin_idx)

    CK = rec_err.shape[1]
    oh_win = lut_ops.onehot(win_idx, CK)                  # (N, CK)
    win_err = jnp.einsum("nk,nk->n", oh_win, rec_err)
    best_in_mode = jnp.min(
        jnp.concatenate([rec_err,
                         jnp.full((N, 1), jnp.float32(ERROR_CALC_DEFAULT))],
                        axis=1), axis=1)

    take = (win_err < scb["errorval"]) & ~scb["finished"] & active_in

    def gather1(rec):
        ohw = oh_win.reshape((N, CK) + (1,) * (rec.ndim - 2))
        out = jnp.sum(ohw * rec.astype(jnp.float32), axis=1)
        return out.astype(rec.dtype) if rec.dtype != jnp.float32 else out

    wa = gather1(rec_w1_64)
    wb = gather1(rec_w2_64)
    new_scb = dict(scb)
    new_scb["errorval"] = jnp.where(take, win_err, scb["errorval"])
    new_scb["block_type_error"] = scb["block_type_error"] & ~take
    new_scb["block_mode"] = jnp.where(take, gather1(rec_mode),
                                      scb["block_mode"])
    new_scb["quant_mode"] = jnp.where(take, gather1(rec_q),
                                      scb["quant_mode"])
    new_scb["partition_count"] = jnp.where(take, 1, scb["partition_count"])
    new_scb["partition_index"] = jnp.where(take, 0, scb["partition_index"])
    new_scb["color_formats"] = jnp.where(take[:, None], gather1(rec_fmt),
                                         scb["color_formats"])
    new_scb["color_formats_matched"] = jnp.where(
        take, False, scb["color_formats_matched"])
    new_scb["color_values"] = jnp.where(take[:, None, None],
                                        gather1(rec_vals),
                                        scb["color_values"])
    new_scb["plane2_component"] = jnp.where(take, p2c,
                                            scb["plane2_component"])
    new_scb["weights"] = jnp.where(take[:, None], wa, scb["weights"])
    new_scb["weights2"] = jnp.where(take[:, None], wb, scb["weights2"])

    return new_scb, best_in_mode
