"""Endpoint format selection, batched.

TPU redesign of the reference's format chooser
(reference: Source/astcenc_pick_best_endpoint_format.cpp): the per-partition
encoding-choice error estimates, the (quant level x integer count) error
tables, and the per-mode best-combination search all become dense tensor ops
over the (block, mode) axes, with the reference's loop-order tie-breaking
reproduced via first-minimum argmin / masked sequential updates.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import color_unquant as cuq
from . import ideal as ideal_ops
from . import lut as lut_ops

QUANT_6 = 4
ERROR_CALC_DEFAULT = 1e30

# baseline_quant_error[q - QUANT_6] (reference: :328-346)
_BASELINE_QUANT_ERROR = np.array([
    (65536.0 * 65536.0 / 18.0) / (d * d)
    for d in (5, 7, 9, 11, 15, 19, 23, 31, 39, 47, 63, 79, 95, 127, 159, 191, 255)
], dtype=np.float32)


def _cw_parts(channel_weight):
    """(cw3 vs (N,T/P,3), cw_a vs (N,P), rgbsum vs (N,P)) for a static
    tuple or per-block (N, 4) channel weights (USE_ALPHA_WEIGHT)."""
    cw = jnp.asarray(channel_weight, jnp.float32)
    if cw.ndim == 2:
        return cw[:, None, :3], cw[:, 3:4], jnp.sum(cw[:, :3], -1,
                                                    keepdims=True)
    return cw[:3], cw[3], jnp.sum(cw[:3])


def encoding_choice_errors(texels, pmask, counts, ep0, ep1, channel_weight,
                           is_luminance, default_alpha):
    """Estimate the error of cheaper endpoint encodings per partition.

    Reference: compute_encoding_choice_errors (:222-300).

    Args:
      texels: (N, T, 4); pmask: (N, T, P); counts: (N, P).
      ep0/ep1: (N, P, 4) ideal endpoints.
      channel_weight: (4,) static.
      is_luminance: (N,) block-wide grayscale+opaque flag.
      default_alpha: scalar (65535 for LDR).

    Returns dict of (N, P) arrays:
      rgb_scale_error, rgb_luma_error, luminance_error, alpha_drop_error,
      can_offset_encode, can_blue_contract.
    """
    cw3, cw_a, _ = _cw_parts(channel_weight)
    rgb_mask = (1, 1, 1, 0)
    avg, dirv = ideal_ops.avgs_and_dirs(texels, pmask, rgb_mask)

    uncor_b = ideal_ops._normalize_safe(dirv, rgb_mask)
    samec_b = ideal_ops._normalize_safe(avg * jnp.array([1, 1, 1, 0.0]),
                                        rgb_mask)
    unit3 = jnp.array([1, 1, 1, 0], jnp.float32) / np.sqrt(3.0)

    def line_err(b_t, amod_t):
        # b_t/amod_t: (N, T, 4) per-texel line params (RGB lanes)
        param = jnp.sum(texels[..., :3] * b_t[..., :3], axis=-1)
        dist = amod_t[..., :3] + param[..., None] * b_t[..., :3] - texels[..., :3]
        err = jnp.sum(dist * dist * cw3, axis=-1)  # (N, T)
        return jnp.einsum("ntp,nt->np", pmask, err)

    def proj(a, b):
        # amod = a - b * dot3(a, b), per partition -> per texel
        d = jnp.sum(a[..., :3] * b[..., :3], axis=-1, keepdims=True)
        return a - b * d

    uncor_amod = proj(avg, uncor_b)
    luma_amod = proj(avg, jnp.broadcast_to(unit3, avg.shape))

    def scatter(x):
        return jnp.einsum("ntp,npc->ntc", pmask, x)

    uncor_err = line_err(scatter(jnp.broadcast_to(uncor_b, avg.shape)),
                         scatter(uncor_amod))
    samec_err = line_err(scatter(jnp.broadcast_to(samec_b, avg.shape)),
                         jnp.zeros_like(texels))
    rgbl_err = line_err(jnp.broadcast_to(unit3, texels.shape),
                        scatter(luma_amod))
    l_err = line_err(jnp.broadcast_to(unit3, texels.shape),
                     jnp.zeros_like(texels))

    a_diff = texels[..., 3] - default_alpha
    a_drop = jnp.einsum("ntp,nt->np", pmask, a_diff * a_diff) * cw_a

    epd = jnp.abs(ep1 - ep0)
    can_offset = jnp.all(epd[..., :3] < 0.12 * 65535.0, axis=-1)

    return {
        "rgb_scale_error": (samec_err - uncor_err) * 0.7,
        "rgb_luma_error": (rgbl_err - uncor_err) * 1.5,
        "luminance_error": (l_err - uncor_err) * 3.0,
        "alpha_drop_error": a_drop * 3.0,
        "can_offset_encode": can_offset,
        "can_blue_contract": ~is_luminance[:, None] & jnp.ones_like(can_offset),
    }


def color_error_tables_ldr(eci, ep0, ep1, counts, channel_weight):
    """best_error/format tables per (n, p, quant 0..20, int count 1..4).

    LDR path of compute_color_error_for_every_integer_count_and_quant_level
    (reference: :315-665).

    Returns (best_error (N, P, 21, 4), format (N, P, 21, 4) int32).
    """
    cw3, cw_a, ew_rgbsum = _cw_parts(channel_weight)
    psize = counts.astype(jnp.float32)  # (N, P)

    offset = jnp.float32(65535.0)
    e0h = jnp.maximum(ep0 - offset, 0.0)
    e1h = jnp.maximum(ep1 - offset, 0.0)
    e0l = jnp.minimum(ep0, 0.0)
    e1l = jnp.minimum(ep1, 0.0)
    sum_range = e0l * e0l + e1l * e1l + e0h * e0h + e1h * e1h
    rgb_range_error = (jnp.sum(sum_range[..., :3] * cw3, axis=-1)
                       * 0.5 * psize)
    alpha_range_error = sum_range[..., 3] * cw_a * 0.5 * psize

    base_rgb = ew_rgbsum * psize       # (N, P)
    base_a = cw_a * psize
    base_rgba = base_rgb + base_a

    bc_rgba = jnp.where(eci["can_blue_contract"], 0.625, 1.0)
    bc_rgb = jnp.where(eci["can_blue_contract"], 0.5, 1.0)
    oe_rgba_base = jnp.where(eci["can_offset_encode"], 0.5, 1.0)
    oe_rgb_base = jnp.where(eci["can_offset_encode"], 0.25, 1.0)

    # Vectorized over the quant axis (QUANT_6..20): per-q .at[].set updates
    # each rewrote the whole (N, P, 21, 4) table as a dynamic-update-slice,
    # which multiplied HBM traffic ~15x on TPU.
    nq = 21
    NQ = 21 - QUANT_6                                      # quantized levels
    qv = np.arange(QUANT_6, 21)
    bq = jnp.asarray(np.array(_BASELINE_QUANT_ERROR, np.float32))  # (NQ,)
    hi_oe = jnp.asarray(qv >= 19)                          # QUANT_192 = 19
    oe_rgba = jnp.where(hi_oe, 1.0, oe_rgba_base[..., None])   # (N, P, NQ)
    oe_rgb = jnp.where(hi_oe, 1.0, oe_rgb_base[..., None])

    qe_rgb = base_rgb[..., None] * bq                      # (N, P, NQ)
    qe_rgba = base_rgba[..., None] * bq

    rre = rgb_range_error[..., None]
    are = alpha_range_error[..., None]
    adrop = eci["alpha_drop_error"][..., None]
    rgbserr = eci["rgb_scale_error"][..., None]
    lumerr = eci["luminance_error"][..., None]

    full_rgba = qe_rgba * bc_rgba[..., None] * oe_rgba + rre + are
    full_rgb = qe_rgb * bc_rgb[..., None] * oe_rgb + rre + adrop
    rgbs_alpha = qe_rgba + rgbserr + rre + are
    use_rgbs_a = rgbs_alpha < full_rgb
    col2 = jnp.where(use_rgbs_a, rgbs_alpha, full_rgb)
    fm2 = jnp.where(use_rgbs_a, cuq.FMT_RGB_SCALE_ALPHA, cuq.FMT_RGB)

    ldr_rgbs = qe_rgb + rre + adrop + rgbserr
    lum_alpha = qe_rgba + rre + are + lumerr
    use_rgbs = ldr_rgbs < lum_alpha
    col1 = jnp.where(use_rgbs, ldr_rgbs, lum_alpha)
    fm1 = jnp.where(use_rgbs, cuq.FMT_RGB_SCALE, cuq.FMT_LUMINANCE_ALPHA)

    col0 = qe_rgb + rre + adrop + lumerr

    be_hi = jnp.stack([col0, col1, col2, full_rgba], axis=-1)  # (N, P, NQ, 4)
    fm_hi = jnp.stack([jnp.full(col0.shape, cuq.FMT_LUMINANCE, jnp.int32),
                       fm1, fm2,
                       jnp.full(col0.shape, cuq.FMT_RGBA, jnp.int32)],
                      axis=-1)

    pad = counts.shape + (QUANT_6, 4)
    be = jnp.concatenate(
        [jnp.full(pad, jnp.float32(ERROR_CALC_DEFAULT)), be_hi], axis=-2)
    fm_lo = jnp.broadcast_to(
        jnp.array([cuq.FMT_LUMINANCE, cuq.FMT_RGB_SCALE, cuq.FMT_RGB,
                   cuq.FMT_RGBA], jnp.int32), pad)
    fm = jnp.concatenate([fm_lo, fm_hi], axis=-2)
    return be, fm


def color_error_tables_hdr(eci, ep0, ep1, counts, channel_weight,
                           encode_hdr_alpha: bool):
    """HDR arm of compute_color_error_for_every_integer_count_and_quant_level
    (reference: :379-559)."""
    cw3, cw_a, ew_rgbsum = _cw_parts(channel_weight)
    psize = counts.astype(jnp.float32)

    ul = jnp.float32(61440.0)
    ua = ul if encode_hdr_alpha else jnp.float32(65535.0)
    offset = jnp.stack([ul, ul, ul, ua])
    e0h = jnp.maximum(ep0 - offset, 0.0)
    e1h = jnp.maximum(ep1 - offset, 0.0)
    e0l = jnp.minimum(ep0, 0.0)
    e1l = jnp.minimum(ep1, 0.0)
    sum_range = e0l * e0l + e1l * e1l + e0h * e0h + e1h * e1h
    rgb_range_error = (jnp.sum(sum_range[..., :3] * cw3, axis=-1)
                       * 0.5 * psize)
    alpha_range_error = sum_range[..., 3] * cw_a * 0.5 * psize

    # Statistics driving the RGBO/RGB submode estimates (reference: :382-512)
    r1, g1, b1 = ep1[..., 0], ep1[..., 1], ep1[..., 2]
    use_r = (r1 > g1) & (r1 > b1)
    use_g = ~use_r & (g1 > b1)
    af = jnp.where(use_r, r1, jnp.where(use_g, g1, b1))
    cf = jnp.where(use_r, r1 - ep0[..., 0],
                   jnp.where(use_g, g1 - ep0[..., 1], b1 - ep0[..., 2]))
    ep1_min = jnp.maximum(jnp.min(ep1[..., :3], axis=-1), 0.0)
    bf = af - ep1_min
    prd = ep1[..., :3] - cf[..., None]
    pdif = prd - ep0[..., :3]
    df = jnp.max(jnp.abs(pdif), axis=-1)

    b_ = jnp.clip(bf, 0.0, 65536.0).astype(jnp.int32)
    c_ = jnp.clip(cf, 0.0, 65536.0).astype(jnp.int32)
    d_ = jnp.clip(df, 0.0, 65536.0).astype(jnp.int32)

    rgbo_mode = jnp.full(b_.shape, 5)
    rgbo_mode = jnp.where((b_ < 32768) & (c_ < 16384), 4, rgbo_mode)
    rgbo_mode = jnp.where((b_ < 8192) & (c_ < 16384), 3, rgbo_mode)
    rgbo_mode = jnp.where((b_ < 2048) & (c_ < 16384), 2, rgbo_mode)
    rgbo_mode = jnp.where((b_ < 2048) & (c_ < 1024), 1, rgbo_mode)
    rgbo_mode = jnp.where((b_ < 1024) & (c_ < 4096), 0, rgbo_mode)

    rgb_mode = jnp.full(b_.shape, 8)
    rgb_mode = jnp.where((b_ < 16384) & (c_ < 8192) & (d_ < 8192), 0, rgb_mode)
    rgb_mode = jnp.where((b_ < 32768) & (c_ < 8192) & (d_ < 4096), 1, rgb_mode)
    rgb_mode = jnp.where((b_ < 4096) & (c_ < 8192) & (d_ < 4096), 2, rgb_mode)
    rgb_mode = jnp.where((b_ < 8192) & (c_ < 8192) & (d_ < 2048), 3, rgb_mode)
    rgb_mode = jnp.where((b_ < 8192) & (c_ < 2048) & (d_ < 512), 4, rgb_mode)
    rgb_mode = jnp.where((b_ < 2048) & (c_ < 8192) & (d_ < 1024), 5, rgb_mode)
    rgb_mode = jnp.where((b_ < 2048) & (c_ < 2048) & (d_ < 256), 6, rgb_mode)
    rgb_mode = jnp.where((b_ < 1024) & (c_ < 2048) & (d_ < 512), 7, rgb_mode)

    rgbo_scales = jnp.array([4.0, 4.0, 16.0, 64.0, 256.0, 1024.0])
    rgb_scales = jnp.array([64.0, 64.0, 16.0, 16.0, 4.0, 4.0, 1.0, 1.0,
                            384.0])
    mode7mult = rgbo_scales[rgbo_mode] * 0.0015
    mode11mult = rgb_scales[rgb_mode] * 0.010

    lum_high = jnp.sum(ep1[..., :3], -1) / 3.0
    lum_low = jnp.sum(ep0[..., :3], -1) / 3.0
    lumdif = lum_high - lum_low
    mode23mult = jnp.where(lumdif < 960, 4.0,
                           jnp.where(lumdif < 3968, 16.0, 128.0)) * 0.0005

    nq = 21
    be = jnp.full(counts.shape + (nq, 4), jnp.float32(ERROR_CALC_DEFAULT))
    fm = jnp.zeros(counts.shape + (nq, 4), jnp.int32)
    fmt8 = (cuq.FMT_HDR_RGBA if encode_hdr_alpha
            else cuq.FMT_HDR_RGB_LDR_ALPHA)
    fm = fm.at[..., 3].set(fmt8)
    fm = fm.at[..., 2].set(cuq.FMT_HDR_RGB)
    fm = fm.at[..., 1].set(cuq.FMT_HDR_RGB_SCALE)
    fm = fm.at[..., 0].set(cuq.FMT_HDR_LUMINANCE_LARGE_RANGE)

    for q in range(8, 21):  # QUANT_16 ..= QUANT_256
        bq = float(_BASELINE_QUANT_ERROR[q - QUANT_6]) * 1.0
        base_quant_error = bq * psize
        rgb_q = ew_rgbsum * base_quant_error * 2.0
        a_q = cw_a * base_quant_error * 2.0
        rgba_q = rgb_q + a_q

        be = be.at[..., q, 3].set(rgba_q + rgb_range_error
                                  + alpha_range_error)
        be = be.at[..., q, 2].set(rgb_q * mode11mult + rgb_range_error
                                  + eci["alpha_drop_error"])
        be = be.at[..., q, 1].set(rgb_q * mode7mult + rgb_range_error
                                  + eci["alpha_drop_error"]
                                  + eci["rgb_luma_error"])
        be = be.at[..., q, 0].set(rgb_q * mode23mult + rgb_range_error
                                  + eci["alpha_drop_error"]
                                  + eci["luminance_error"])
    return be, fm


def combine_partitions(be, fm, partition_count: int):
    """Best combined (error, formats) per (quant, total integer-pair count).

    Reference: {two,three,four}_partitions_find_best_combination_for_every_
    quantization_and_integer_count (:728, :842, :967). Combos whose per-
    partition integer counts differ by more than 1 are invalid. Ties use <=
    (later enumeration order wins), matching the reference loops.

    Args:
      be: (N, P, 21, 4); fm: (N, P, 21, 4); partition_count: 2..4.

    Returns:
      (comb_err (N, 21, S), comb_fmt (N, 21, S, pc)) where
      S = 3 * pc - 2 + ... the intcnt axis size: pc=2 -> 7, 3 -> 10, 4 -> 13.
    """
    pc = partition_count
    S = {2: 7, 3: 10, 4: 13}[pc]
    N = be.shape[0]

    # Group the valid combos by total integer count, take the last-minimum
    # per group (the reference's <= updates in enumeration order), and stack
    # the S columns once. The previous per-combo .at[].set formulation
    # rewrote the whole (N, 21, S) table per combo as dynamic-update-slices.
    import itertools
    groups = [[] for _ in range(S)]
    for combo in itertools.product(range(4), repeat=pc):
        if max(combo) - min(combo) <= 1:
            groups[sum(combo)].append(combo)

    err_cols = []
    fmt_cols = []
    for intcnt in range(S):
        combos = groups[intcnt]
        if not combos:
            err_cols.append(jnp.full((N, 21), jnp.float32(ERROR_CALC_DEFAULT)))
            fmt_cols.append(jnp.zeros((N, 21, pc), jnp.int32))
            continue
        errs = jnp.stack(
            [jnp.minimum(sum(be[:, p, :, c[p]] for p in range(pc)), 1e10)
             for c in combos], axis=-1)                    # (N, 21, K)
        K = len(combos)
        # last-minimum: first-min over the reversed combo axis
        ridx = jnp.argmin(errs[..., ::-1], axis=-1)
        idx = K - 1 - ridx
        err_cols.append(jnp.min(errs, axis=-1))
        fmts = jnp.stack(
            [jnp.stack([fm[:, p, :, c[p]] for p in range(pc)], axis=-1)
             for c in combos], axis=-2)                    # (N, 21, K, pc)
        oh = (jnp.arange(K, dtype=jnp.int32) == idx[..., None])
        fmt_cols.append(jnp.sum(
            jnp.where(oh[..., None], fmts, 0), axis=-2))
    comb_err = jnp.stack(err_cols, axis=-1)                # (N, 21, S)
    comb_fmt = jnp.stack(fmt_cols, axis=-2)                # (N, 21, S, pc)
    return comb_err, comb_fmt


def best_for_bitcount(comb_err, comb_fmt, quant_mode_table_np, bitcounts_np,
                      partition_count: int, mod_bits: int):
    """Per-mode best (quant, quant_mod, formats, error) for its bit budget.

    Reference: {one,two,three,four}_partitions_find_best_combination_for_
    bitcount (:678, :780, :905, :1041). Bit budgets are static per mode, so
    all quant_mode_table lookups fold to constants.

    Args:
      comb_err: pc==1: (N, 21, 4) per-partition table; else (N, 21, S).
      comb_fmt: pc==1: (N, 21, 4) formats; else (N, 21, S, pc).
      quant_mode_table_np: (10, 128) numpy int.
      bitcounts_np: (M,) numpy int bits available per mode (may be <= 0 for
        skipped modes; callers mask those via qwt_errors).
      partition_count: 1..4.
      mod_bits: extra bits for the matched-format trick (0/2/5/8).

    Returns dict with per (N, M): error, quant, quant_mod, formats (N,M,pc).
    """
    qmt = quant_mode_table_np
    bits = np.clip(np.asarray(bitcounts_np, np.int64), 0, 127)
    pc = partition_count
    M = bits.shape[0]

    if pc == 1:
        ic_range = range(1, 5)
        S = 4
        ic_base = 1
    else:
        S = comb_err.shape[-1]
        ic_range = range(pc, min(4 * pc, 9) + 1)
        ic_base = pc

    cand_err = []
    ics = []
    for ic in ic_range:
        ql = qmt[ic, bits]                      # (M,) static
        valid = ql >= QUANT_6                   # (M,) static
        qlc = np.clip(ql, 0, 20)
        # comb_err[:, qlc[m], ic - ic_base] for each mode m; static one-hot
        # matmul instead of a (N, M) gather (gathers scalarize on TPU).
        oh_m = jnp.asarray(
            (qlc[:, None] == np.arange(21)).astype(np.float32))  # (M, 21)
        err_ic = jnp.einsum("mq,nq->nm", oh_m,
                            comb_err[:, :, ic - ic_base])        # (N, M)
        err_ic = jnp.where(jnp.asarray(valid), err_ic,
                           jnp.float32(ERROR_CALC_DEFAULT))
        cand_err.append(err_ic)
        ics.append(ic)

    cand = jnp.stack(cand_err, axis=-1)          # (N, M, n_ic)
    best_idx = jnp.argmin(cand, axis=-1)         # first-min = reference order
    best_err = jnp.min(cand, axis=-1)
    best_ic = jnp.asarray(ics, jnp.int32)[best_idx]  # (N, M)

    # Reference inits best_integer_count to 0 when nothing is valid:
    # pc==1 then looks up row best+1 = 1; pc>1 looks up row 0 (all -1).
    none_valid = best_err >= jnp.float32(ERROR_CALC_DEFAULT)
    best_ic = jnp.where(none_valid, 1 if pc == 1 else 0, best_ic)

    # qmt[ic, bits[m]] with static bits: fold the bit lookup at trace time
    # and select the ic row with a one-hot sum (gathers scalarize on TPU).
    qmt_at_bits = jnp.asarray(qmt[:, bits].astype(np.int32))       # (10, M)
    qmt_at_mod = jnp.asarray(
        qmt[:, np.clip(bits + mod_bits, 0, 127)].astype(np.int32))  # (10, M)
    oh_ic = (jnp.arange(10, dtype=jnp.int32)
             == best_ic[..., None])                                # (N, M, 10)
    ql = jnp.sum(jnp.where(oh_ic, qmt_at_bits.T[None], 0), axis=-1)
    ql_mod = jnp.sum(jnp.where(oh_ic, qmt_at_mod.T[None], 0), axis=-1)

    qlc = jnp.clip(ql, QUANT_6, 20)
    oh_q = lut_ops.onehot(qlc, 21)                         # (N, M, 21)
    if pc == 1:
        slot = jnp.clip(best_ic - 1, 0, 3)
        oh_s = lut_ops.onehot(slot, 4)                     # (N, M, 4)
        at_q = jnp.einsum("nmq,nqs->nms", oh_q,
                          comb_fmt.astype(jnp.float32))    # (N, M, 4)
        fmts = jnp.sum(oh_s * at_q, axis=-1)[..., None].astype(jnp.int32)
    else:
        slot = jnp.clip(best_ic - ic_base, 0, S - 1)
        oh_s = lut_ops.onehot(slot, S)                     # (N, M, S)
        at_q = jnp.einsum("nmq,nqsp->nmsp", oh_q,
                          comb_fmt.astype(jnp.float32))    # (N, M, S, pc)
        fmts = jnp.einsum("nms,nmsp->nmp", oh_s, at_q).astype(jnp.int32)
    fmts = jnp.where((ql >= QUANT_6)[..., None], fmts, cuq.FMT_LUMINANCE)

    return {"error": best_err, "quant": ql, "quant_mod": ql_mod,
            "formats": fmts}


def select_candidates(total_errors, tune_candidate_limit: int):
    """Pick the N best modes, reproducing the reference's selection order.

    Reference: compute_ideal_endpoint_formats tail (:1286-1356): repeated
    argmin with lowest-index tie-break, masking previous winners.

    Args:
      total_errors: (N, M) combined error per mode (ERROR_CALC_DEFAULT for
        invalid modes).
      tune_candidate_limit: static count <= 8.

    Returns:
      (cand_modes (N, C) int32 [-1 if none], cand_valid (N, C) bool)
    """
    errs = total_errors
    modes = []
    valids = []
    for _ in range(tune_candidate_limit):
        idx = jnp.argmin(errs, axis=-1)
        val = jnp.min(errs, axis=-1)
        ok = val < jnp.float32(ERROR_CALC_DEFAULT)
        modes.append(jnp.where(ok, idx, -1))
        valids.append(ok)
        errs = jnp.where(
            jnp.arange(errs.shape[-1])[None, :] == idx[:, None],
            jnp.float32(ERROR_CALC_DEFAULT), errs)
    return jnp.stack(modes, axis=-1), jnp.stack(valids, axis=-1)
