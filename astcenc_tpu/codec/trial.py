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
from ..ops import color_unquant as cuq
from ..ops import formats as fmts
from ..ops import ideal as ideal_ops
from ..ops import realign as realign_ops
from ..ops import recompute as recompute_ops
from ..tables import ise, quant

ERROR_CALC_DEFAULT = 1e30
QUANT_32 = 11

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
        wuq[q, :len(t["unscramble_unquant"])] = t["unscramble_unquant"]
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


def trial_error_1plane(texels, pmask, fmt, values, wgrid, Mint, cw, profile,
                       u8_mask):
    """compute_symbolic_block_difference_1plane, batched.

    Reference: astcenc_decompress_symbolic.cpp:407-618.
    """
    ep0, ep1 = _decode_endpoints(profile, fmt, values)     # (N, P, 4) ints
    infill = (8 + jnp.einsum("ntw,nw->nt", Mint,
                             wgrid.astype(jnp.float32))).astype(jnp.int32) >> 4
    ep0_t = jnp.einsum("ntp,npc->ntc", pmask, ep0.astype(jnp.float32))
    ep1_t = jnp.einsum("ntp,npc->ntc", pmask, ep1.astype(jnp.float32))
    w = infill.astype(jnp.float32)[..., None]
    color = jnp.floor((ep0_t * (64.0 - w) + ep1_t * w + 32.0) / 64.0)
    if u8_mask:
        color = jnp.floor(color / 256.0) * 257.0
    d = jnp.minimum(jnp.abs(texels - color), 1e15)
    err_t = jnp.minimum(jnp.sum(d * d * jnp.array(cw, jnp.float32), -1),
                        jnp.float32(ERROR_CALC_DEFAULT))
    return jnp.sum(err_t, axis=-1)


def trial_error_2plane(texels, fmt0, values0, wgrid1, wgrid2, p2c, Mint, cw,
                       profile, u8_mask):
    """compute_symbolic_block_difference_2plane, batched (1 partition)."""
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
    d = jnp.minimum(jnp.abs(texels - color), 1e15)
    err_t = jnp.minimum(jnp.sum(d * d * jnp.array(cw, jnp.float32), -1),
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
    texels = st["texels"]
    N, T, _ = texels.shape
    cw = cfg.channel_weights

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

    # --- Ideal decimated weights --------------------------------------------
    dec_ideal = ideal_ops.ideal_weights_for_decimation(
        ei["weights"], ei["weight_error_scale"],
        jnp.asarray(et.dec_int), jnp.asarray(et.dec_sq),
        jnp.asarray(et.dec_f32))                      # (N, D, W)

    # --- min weight cutoff ----------------------------------------------------
    ep = (1.0 - ei["ep0"]) / (ei["ep1"] - ei["ep0"])   # (N, P, 4)
    use_ep = (ep > 0.5) & (ep < 10.0)
    lanes_ok = jnp.arange(4)[None, :] < pc             # partitions in use
    use_ep = use_ep & lanes_ok[None, :, None].reshape(1, 4, 1)
    min_ep = jnp.min(jnp.where(use_ep, ep, 10.0), axis=(1, 2))
    min_wt_cutoff = min_ep                             # (N,)

    # --- Angular endpoints ----------------------------------------------------
    D = et.dec_int.shape[0]
    W = et.dec_int.shape[2]
    wslots = np.arange(W)
    wvalid_np = wslots[None, :] < et.dec_wcount[:, None]
    max_wq = jnp.minimum(QUANT_32, quant_limit)        # (N,)
    maxprec = jnp.asarray(et.dm_maxprec1)[None, :]     # (1, D)
    max_precision = jnp.minimum(jnp.minimum(maxprec, ang.TUNE_MAX_ANGULAR_QUANT),
                                max_wq[:, None])
    low_v, high_v = ang.angular_endpoints_for_quant_levels(
        dec_ideal, jnp.asarray(wvalid_np), max_precision)  # (N, D, 8)

    # --- Per-mode weight quantization + error --------------------------------
    quant_m = et.m1_quant
    dm_m = et.m1_dm
    M1 = quant_m.shape[0]
    if only_always:
        mode_active_np = np.arange(M1) < et.m1_always_count
    else:
        mode_active_np = np.ones(M1, bool)
    bitcount_np = _FREE_BITS_1PLANE[pc] - et.m1_weight_bits
    mode_active_np = mode_active_np & (bitcount_np > 0)

    # low/high per (n, m)
    ang_ok = quant_m <= ang.TUNE_MAX_ANGULAR_QUANT
    ql_idx = np.where(ang_ok, quant_m, 0)
    low_m = jnp.where(jnp.asarray(ang_ok),
                      low_v[:, dm_m, ql_idx], 0.0)     # (N, M1)
    high_m = jnp.where(jnp.asarray(ang_ok),
                       high_v[:, dm_m, ql_idx], 1.0)
    high_m = jnp.where(high_m > 1.02 * min_wt_cutoff[:, None], 1.0, high_m)

    dec_ideal_by_mode = dec_ideal[:, dm_m, :]          # (N, M1, W)
    uqf, uq = ideal_ops.quantize_weights_for_modes(
        dec_ideal_by_mode, low_m, high_m,
        jnp.asarray(et.weight_quant_unquant),
        jnp.asarray(_QUANT_LEVELS_M1), jnp.asarray(quant_m))

    decf32_by_mode = jnp.asarray(et.dec_f32[dm_m])     # (M1, T, W)
    qwt_err = ideal_ops.weight_set_error(
        uqf, ei["weights"], ei["weight_error_scale"], decf32_by_mode)

    mode_ok = (jnp.asarray(mode_active_np)[None, :]
               & (jnp.asarray(quant_m)[None, :] <= max_wq[:, None]))
    qwt_err = jnp.where(mode_ok, qwt_err, jnp.float32(1e38))

    # --- Endpoint format selection -------------------------------------------
    eci = fmts.encoding_choice_errors(
        texels, pmask, counts, ei["ep0"], ei["ep1"], cw,
        st["is_luminance"], st["default_alpha"])
    be, fm = fmts.color_error_tables_ldr(eci, ei["ep0"], ei["ep1"],
                                         counts, cw)
    if pc == 1:
        comb_err, comb_fmt = be[:, 0], fm[:, 0]
        mod_bits = 0
    else:
        comb_err, comb_fmt = fmts.combine_partitions(be, fm, pc)
        mod_bits = {2: 2, 3: 5, 4: 8}[pc]

    bb = fmts.best_for_bitcount(comb_err, comb_fmt, et.quant_mode_table,
                                bitcount_np, pc, mod_bits)
    total_err = jnp.where(qwt_err >= 1e37, jnp.float32(ERROR_CALC_DEFAULT),
                          bb["error"] + qwt_err)
    cand_modes, cand_valid = fmts.select_candidates(
        total_err, cfg.tune_candidate_limit)

    # --- Candidate refinement loop (lax.scan over candidates and over the
    # refinement iterations, to keep the compiled graph small) ---------------
    best_in_mode = jnp.full((N,), jnp.float32(ERROR_CALC_DEFAULT))
    dec_int_j = jnp.asarray(et.dec_int)
    dec_f32_j = jnp.asarray(et.dec_f32)
    wvalid_j = jnp.asarray(wvalid_np)
    pn = jnp.asarray(et.weight_prev_next)
    mode_index_j = jnp.asarray(et.m1_mode_index)
    quant_m_j = jnp.asarray(quant_m)
    dm_m_j = jnp.asarray(dm_m)

    def refine_step(rcarry, r):
        (wgrid, ep0_c, ep1_c, cand_active, scb, skip_rest, best_in_mode,
         consts) = rcarry
        (mode_c, fmt_req, cq, cq_mod, wq_c, Mint_c, Mf32_c, incid_c,
         wvalid_c, color_c) = consts

        undec = jnp.einsum("ntw,nw->nt", Mf32_c,
                           wgrid.astype(jnp.float32)) / 64.0
        rc = recompute_ops.recompute_ideal_colors_1plane(
            texels, pmask, counts, undec, cw, ep0_c, ep1_c,
            is_hdr=(profile >= 2))
        ep0_c, ep1_c = rc["ep0"], rc["ep1"]

        def flat(x):
            return x[:, :pc].reshape(N * pc, -1)

        fmt_p, vals_p = cpack.pack_color_endpoints_ldr(
            flat(ep0_c)[:, :4], flat(ep1_c)[:, :4], flat(rc["rgbs"])[:, :4],
            fmt_req.reshape(N * pc), jnp.repeat(cq, pc))
        fmt_p = fmt_p.reshape(N, pc)
        vals_p = vals_p.reshape(N, pc, 8)

        matched = jnp.zeros((N,), bool)
        use_q = cq
        if pc >= 2:
            all_same = (cq != cq_mod)
            all_same &= jnp.all(fmt_p == fmt_p[:, :1], axis=1)
            fmt_m, vals_m = cpack.pack_color_endpoints_ldr(
                flat(ep0_c)[:, :4], flat(ep1_c)[:, :4],
                flat(rc["rgbs"])[:, :4], fmt_req.reshape(N * pc),
                jnp.repeat(jnp.clip(cq_mod, 4, 20), pc))
            fmt_m = fmt_m.reshape(N, pc)
            vals_m = vals_m.reshape(N, pc, 8)
            same_mod = jnp.all(fmt_m == fmt_m[:, :1], axis=1)
            matched = all_same & same_mod & (cq_mod >= 4)
            fmt_p = jnp.where(matched[:, None], fmt_m, fmt_p)
            vals_p = jnp.where(matched[:, None, None], vals_m, vals_p)
            use_q = jnp.where(matched, cq_mod, cq)

        fmt4 = jnp.zeros((N, 4), jnp.int32).at[:, :pc].set(fmt_p)
        vals4 = jnp.zeros((N, 4, 8), jnp.int32).at[:, :pc].set(vals_p)

        def make_update(scb, errv, wg, active):
            take = active & (errv < scb["errorval"])
            wg64 = jnp.zeros((N, 64), jnp.int32).at[:, :W].set(wg)
            new_scb = dict(scb)
            new_scb["errorval"] = jnp.where(take, errv, scb["errorval"])
            new_scb["block_type_error"] = scb["block_type_error"] & ~take
            new_scb["block_mode"] = jnp.where(
                take, mode_index_j[mode_c], scb["block_mode"])
            new_scb["quant_mode"] = jnp.where(take, use_q, scb["quant_mode"])
            new_scb["partition_count"] = jnp.where(take, pc,
                                                   scb["partition_count"])
            new_scb["partition_index"] = jnp.where(
                take, partition_index, scb["partition_index"])
            new_scb["color_formats"] = jnp.where(take[:, None], fmt4,
                                                 scb["color_formats"])
            new_scb["color_formats_matched"] = jnp.where(
                take, matched, scb["color_formats_matched"])
            new_scb["color_values"] = jnp.where(take[:, None, None], vals4,
                                                scb["color_values"])
            new_scb["plane2_component"] = jnp.where(
                take, -1, scb["plane2_component"])
            new_scb["weights"] = jnp.where(take[:, None], wg64,
                                           scb["weights"])
            return new_scb, take

        # Pre-realign test (reference runs this only on iteration 0)
        first = r == 0
        errv = trial_error_1plane(texels, pmask, fmt4, vals4, wgrid, Mint_c,
                                  cw, profile, u8_mask)
        pre_active = cand_active & first
        best_in_mode = jnp.where(pre_active,
                                 jnp.minimum(errv, best_in_mode),
                                 best_in_mode)
        thr0 = 0.045 * cfg.tune_refinement_limit + 1.08
        catchup0 = errv > thr0 * scb["errorval"]
        scb, took = make_update(scb, errv, wgrid, pre_active)
        hit0 = pre_active & (errv < threshold) & took
        skip_rest = skip_rest | hit0
        cand_active = cand_active & ~(first & (catchup0 | hit0))

        # Realign + post test
        new_wgrid, adjusted = realign_ops.realign_decimated_grouped(
            wgrid, texels, pmask, *_decode_endpoints(profile, fmt4, vals4),
            cw, pn, wq_c, Mf32_c, incid_c, wvalid_c, color_c, et.ncolors)
        wgrid = jnp.where(cand_active[:, None], new_wgrid, wgrid)

        errv = trial_error_1plane(texels, pmask, fmt4, vals4, wgrid, Mint_c,
                                  cw, profile, u8_mask)
        best_in_mode = jnp.where(cand_active,
                                 jnp.minimum(errv, best_in_mode),
                                 best_in_mode)
        iters_remaining = cfg.tune_refinement_limit - 1 - r
        thr = 0.045 * iters_remaining.astype(jnp.float32) + 1.0
        catchup = errv > thr * scb["errorval"]
        scb, took = make_update(scb, errv, wgrid, cand_active)
        hit = cand_active & (errv < threshold) & took
        skip_rest = skip_rest | hit
        cand_active = cand_active & ~catchup & ~hit & adjusted

        return (wgrid, ep0_c, ep1_c, cand_active, scb, skip_rest,
                best_in_mode, consts), None

    def candidate_step(ccarry, xs):
        scb, skip_rest, best_in_mode = ccarry
        mode_raw, valid_c = xs
        mode_c = jnp.clip(mode_raw, 0, M1 - 1)
        cand_ok = valid_c & ~skip_rest & ~scb["finished"]

        dm_c = dm_m_j[mode_c]
        wq_c = quant_m_j[mode_c]
        fmt_req = bb["formats"][jnp.arange(N), mode_c]   # (N, pc)
        cq = jnp.clip(bb["quant"][jnp.arange(N), mode_c], 4, 20)
        cq_mod = jnp.clip(bb["quant_mod"][jnp.arange(N), mode_c], 0, 20)

        wgrid = jnp.take_along_axis(uq, mode_c[:, None, None], axis=1)[:, 0]
        Mint_c = dec_int_j[dm_c]
        Mf32_c = dec_f32_j[dm_c]
        incid_c = (Mint_c != 0).astype(jnp.float32)
        wvalid_c = wvalid_j[dm_c]

        color_c = jnp.asarray(et.dm_color)[dm_c]
        consts = (mode_c, fmt_req, cq, cq_mod, wq_c, Mint_c, Mf32_c,
                  incid_c, wvalid_c, color_c)
        rcarry = (wgrid, ei["ep0"], ei["ep1"], cand_ok, scb, skip_rest,
                  best_in_mode, consts)
        rcarry, _ = jax.lax.scan(refine_step, rcarry,
                                 jnp.arange(cfg.tune_refinement_limit))
        _, _, _, _, scb, skip_rest, best_in_mode, _ = rcarry
        return (scb, skip_rest, best_in_mode), None

    skip_rest = jnp.zeros((N,), bool)
    ccarry = (scb, skip_rest, best_in_mode)
    ccarry, _ = jax.lax.scan(candidate_step, ccarry,
                             (cand_modes.T, cand_valid.T))
    scb, _, best_in_mode = ccarry

    return scb, best_in_mode


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
    texels = st["texels"]
    N, T, _ = texels.shape
    cw = cfg.channel_weights
    p2c = p2c_vec

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

    ei1 = sel_comp(ei1_variants)
    ei2 = sel_comp(ei2_variants)

    # --- Ideal decimated weights for both planes -------------------------------
    dec_int_j = jnp.asarray(et.dec_int)
    dec_sq_j = jnp.asarray(et.dec_sq)
    dec_f32_j = jnp.asarray(et.dec_f32)
    di1 = ideal_ops.ideal_weights_for_decimation(
        ei1["weights"], ei1["weight_error_scale"], dec_int_j, dec_sq_j,
        dec_f32_j)
    di2 = ideal_ops.ideal_weights_for_decimation(
        ei2["weights"], ei2["weight_error_scale"], dec_int_j, dec_sq_j,
        dec_f32_j)

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

    # --- Angular endpoints ------------------------------------------------------
    W = et.dec_int.shape[2]
    wvalid_np = np.arange(W)[None, :] < et.dec_wcount[:, None]
    max_wq = jnp.minimum(QUANT_32, quant_limit)
    maxprec = jnp.asarray(et.dm_maxprec2)[None, :]
    max_precision = jnp.minimum(
        jnp.minimum(maxprec, ang.TUNE_MAX_ANGULAR_QUANT), max_wq[:, None])
    low1, high1 = ang.angular_endpoints_for_quant_levels(
        di1, jnp.asarray(wvalid_np), max_precision)
    low2, high2 = ang.angular_endpoints_for_quant_levels(
        di2, jnp.asarray(wvalid_np), max_precision)

    # --- Per-mode quantized weights + error ------------------------------------
    quant_m = et.m2_quant
    dm_m = et.m2_dm
    M2 = quant_m.shape[0]
    if M2 == 0:
        return scb, jnp.full((N,), jnp.float32(ERROR_CALC_DEFAULT))
    bitcount_np = 109 - et.m2_weight_bits

    ang_ok = quant_m <= ang.TUNE_MAX_ANGULAR_QUANT
    ql_idx = np.where(ang_ok, quant_m, 0)

    def mode_range(low_v, high_v, cutoff):
        lo = jnp.where(jnp.asarray(ang_ok), low_v[:, dm_m, ql_idx], 0.0)
        hi = jnp.where(jnp.asarray(ang_ok), high_v[:, dm_m, ql_idx], 1.0)
        hi = jnp.where(hi > 1.02 * cutoff[:, None], 1.0, hi)
        return lo, hi

    lo1m, hi1m = mode_range(low1, high1, min_wt_cutoff1)
    lo2m, hi2m = mode_range(low2, high2, min_wt_cutoff2)

    uqf1, uq1 = ideal_ops.quantize_weights_for_modes(
        di1[:, dm_m, :], lo1m, hi1m, jnp.asarray(et.weight_quant_unquant),
        jnp.asarray(_QUANT_LEVELS_M1), jnp.asarray(quant_m))
    uqf2, uq2 = ideal_ops.quantize_weights_for_modes(
        di2[:, dm_m, :], lo2m, hi2m, jnp.asarray(et.weight_quant_unquant),
        jnp.asarray(_QUANT_LEVELS_M1), jnp.asarray(quant_m))

    decf32_by_mode = jnp.asarray(et.dec_f32[dm_m])
    qwt_err = (ideal_ops.weight_set_error(
        uqf1, ei1["weights"], ei1["weight_error_scale"], decf32_by_mode)
        + ideal_ops.weight_set_error(
            uqf2, ei2["weights"], ei2["weight_error_scale"], decf32_by_mode))
    mode_ok = jnp.asarray(quant_m)[None, :] <= max_wq[:, None]
    qwt_err = jnp.where(mode_ok, qwt_err, jnp.float32(1e38))

    # --- Merged endpoints + formats --------------------------------------------
    sep = err_lane[:, None, :]  # (N, 1, 4)
    ep0m = jnp.where(sep, ei2["ep0"], ei1["ep0"])
    ep1m = jnp.where(sep, ei2["ep1"], ei1["ep1"])

    eci = fmts.encoding_choice_errors(
        texels, pmask, counts1, ep0m, ep1m, cw,
        st["is_luminance"], st["default_alpha"])
    be, fm = fmts.color_error_tables_ldr(eci, ep0m, ep1m, counts1, cw)
    bb = fmts.best_for_bitcount(be[:, 0], fm[:, 0], et.quant_mode_table,
                                bitcount_np, 1, 0)
    total_err = jnp.where(qwt_err >= 1e37, jnp.float32(ERROR_CALC_DEFAULT),
                          bb["error"] + qwt_err)
    cand_modes, cand_valid = fmts.select_candidates(
        total_err, cfg.tune_candidate_limit)

    # --- Candidate refinement (scan form, as in the 1-plane trial) ------------
    best_in_mode = jnp.full((N,), jnp.float32(ERROR_CALC_DEFAULT))
    pn = jnp.asarray(et.weight_prev_next)
    mode_index_j = jnp.asarray(et.m2_mode_index)
    quant_m_j = jnp.asarray(quant_m)
    dm_m_j = jnp.asarray(dm_m)
    wvalid_j = jnp.asarray(wvalid_np)
    plane2_lanes = err_lane  # (N, 4) bool

    def refine_step(rcarry, r):
        (wg1, wg2, ep0_c, ep1_c, cand_active, scb, skip_rest, best_in_mode,
         consts) = rcarry
        (mode_c, fmt_req, cq, wq_c, Mint_c, Mf32_c, incid_c,
         wvalid_c, color_c) = consts

        u1 = jnp.einsum("ntw,nw->nt", Mf32_c, wg1.astype(jnp.float32)) / 64.0
        u2 = jnp.einsum("ntw,nw->nt", Mf32_c, wg2.astype(jnp.float32)) / 64.0
        rc = recompute_ops.recompute_ideal_colors_2planes(
            texels, u1, u2, p2c_vec, cw, st["data_mean"], ep0_c, ep1_c,
            is_hdr=(profile >= 2))
        ep0_c, ep1_c = rc["ep0"], rc["ep1"]

        fmt_p, vals_p = cpack.pack_color_endpoints_ldr(
            ep0_c, ep1_c, rc["rgbs"], fmt_req, cq)
        fmt4 = jnp.zeros((N, 4), jnp.int32).at[:, 0].set(fmt_p)
        vals4 = jnp.zeros((N, 4, 8), jnp.int32).at[:, 0].set(vals_p)

        def make_update(scb, errv, w1, w2, active):
            take = active & (errv < scb["errorval"])
            W_ = w1.shape[1]
            wa = jnp.zeros((N, 64), jnp.int32).at[:, :W_].set(w1)
            wb = jnp.zeros((N, 64), jnp.int32).at[:, :W_].set(w2)
            new_scb = dict(scb)
            new_scb["errorval"] = jnp.where(take, errv, scb["errorval"])
            new_scb["block_type_error"] = scb["block_type_error"] & ~take
            new_scb["block_mode"] = jnp.where(
                take, mode_index_j[mode_c], scb["block_mode"])
            new_scb["quant_mode"] = jnp.where(take, cq, scb["quant_mode"])
            new_scb["partition_count"] = jnp.where(take, 1,
                                                   scb["partition_count"])
            new_scb["partition_index"] = jnp.where(take, 0,
                                                   scb["partition_index"])
            new_scb["color_formats"] = jnp.where(take[:, None], fmt4,
                                                 scb["color_formats"])
            new_scb["color_formats_matched"] = jnp.where(
                take, False, scb["color_formats_matched"])
            new_scb["color_values"] = jnp.where(take[:, None, None], vals4,
                                                scb["color_values"])
            new_scb["plane2_component"] = jnp.where(
                take, p2c, scb["plane2_component"])
            new_scb["weights"] = jnp.where(take[:, None], wa, scb["weights"])
            new_scb["weights2"] = jnp.where(take[:, None], wb,
                                            scb["weights2"])
            return new_scb, take

        first = r == 0
        errv = trial_error_2plane(texels, fmt_p, vals_p, wg1, wg2, p2c_vec,
                                  Mint_c, cw, profile, u8_mask)
        pre_active = cand_active & first
        best_in_mode = jnp.where(pre_active, jnp.minimum(errv, best_in_mode),
                                 best_in_mode)
        thr0 = 0.045 * cfg.tune_refinement_limit + 1.08
        catchup0 = errv > thr0 * scb["errorval"]
        scb, took = make_update(scb, errv, wg1, wg2, pre_active)
        hit0 = pre_active & (errv < threshold) & took
        skip_rest = skip_rest | hit0
        cand_active = cand_active & ~(first & (catchup0 | hit0))

        ep0i, ep1i = _decode_endpoints(profile, fmt4, vals4)
        nw1, adj1 = realign_ops.realign_decimated_grouped(
            wg1, texels, pmask, ep0i, ep1i, cw, pn, wq_c, Mf32_c,
            incid_c, wvalid_c, color_c, et.ncolors,
            plane_mask=plane2_lanes)
        nw2, adj2 = realign_ops.realign_decimated_grouped(
            wg2, texels, pmask, ep0i, ep1i, cw, pn, wq_c, Mf32_c,
            incid_c, wvalid_c, color_c, et.ncolors,
            plane_mask=~plane2_lanes)
        wg1 = jnp.where(cand_active[:, None], nw1, wg1)
        wg2 = jnp.where(cand_active[:, None], nw2, wg2)
        adjusted = adj1 | adj2

        errv = trial_error_2plane(texels, fmt_p, vals_p, wg1, wg2, p2c_vec,
                                  Mint_c, cw, profile, u8_mask)
        best_in_mode = jnp.where(cand_active, jnp.minimum(errv, best_in_mode),
                                 best_in_mode)
        iters_remaining = cfg.tune_refinement_limit - 1 - r
        thr = 0.045 * iters_remaining.astype(jnp.float32) + 1.0
        catchup = errv > thr * scb["errorval"]
        scb, took = make_update(scb, errv, wg1, wg2, cand_active)
        hit = cand_active & (errv < threshold) & took
        skip_rest = skip_rest | hit
        cand_active = cand_active & ~catchup & ~hit & adjusted

        return (wg1, wg2, ep0_c, ep1_c, cand_active, scb, skip_rest,
                best_in_mode, consts), None

    def candidate_step(ccarry, xs):
        scb, skip_rest, best_in_mode = ccarry
        mode_raw, valid_c = xs
        mode_c = jnp.clip(mode_raw, 0, M2 - 1)
        cand_ok = valid_c & ~skip_rest & ~scb["finished"] & active_in

        dm_c = dm_m_j[mode_c]
        wq_c = quant_m_j[mode_c]
        fmt_req = bb["formats"][jnp.arange(N), mode_c, 0]
        cq = jnp.clip(bb["quant"][jnp.arange(N), mode_c], 4, 20)

        wg1 = jnp.take_along_axis(uq1, mode_c[:, None, None], axis=1)[:, 0]
        wg2 = jnp.take_along_axis(uq2, mode_c[:, None, None], axis=1)[:, 0]
        Mint_c = dec_int_j[dm_c]
        Mf32_c = dec_f32_j[dm_c]
        incid_c = (Mint_c != 0).astype(jnp.float32)
        wvalid_c = wvalid_j[dm_c]

        color_c = jnp.asarray(et.dm_color)[dm_c]
        consts = (mode_c, fmt_req, cq, wq_c, Mint_c, Mf32_c, incid_c,
                  wvalid_c, color_c)
        rcarry = (wg1, wg2, ep0m[:, 0], ep1m[:, 0], cand_ok, scb, skip_rest,
                  best_in_mode, consts)
        rcarry, _ = jax.lax.scan(refine_step, rcarry,
                                 jnp.arange(cfg.tune_refinement_limit))
        scb, skip_rest, best_in_mode = rcarry[5], rcarry[6], rcarry[7]
        return (scb, skip_rest, best_in_mode), None

    skip_rest = jnp.zeros((N,), bool)
    ccarry = (scb, skip_rest, best_in_mode)
    ccarry, _ = jax.lax.scan(candidate_step, ccarry,
                             (cand_modes.T, cand_valid.T))
    scb, _, best_in_mode = ccarry

    return scb, best_in_mode
