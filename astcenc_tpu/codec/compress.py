"""Batched block compression driver.

TPU redesign of compress_block (reference: Source/astcenc_compress_symbolic.
cpp:1162-1456): the reference's per-block early-exit control flow becomes
masked batched trials — every block in the batch flows through the same
fixed trial sequence, with per-block "finished" lanes frozen once their
quality target is hit. Selection thresholds and trial ordering mirror the
reference so (modulo float associativity) the same encodings win.
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Flags, Profile
from ..ops import color_unquant as cuq
from ..utils import native_host
from . import partition_search, physical, trial

ERROR_CALC_DEFAULT = 1e30
TUNE_MIN_SEARCH_MODE0 = 0.85
QUANT_32 = 11


class _CfgStatic:
    """Hashable static snapshot of the tuning config for jit."""

    def __init__(self, cfg):
        self.profile = int(cfg.profile)
        self.flags = int(cfg.flags)
        self.channel_weights = (cfg.cw_r_weight, cfg.cw_g_weight,
                                cfg.cw_b_weight, cfg.cw_a_weight)
        self.tune_candidate_limit = int(cfg.tune_candidate_limit)
        self.tune_refinement_limit = int(cfg.tune_refinement_limit)
        self.tune_db_limit = float(cfg.tune_db_limit)
        self.tune_mse_overshoot = float(cfg.tune_mse_overshoot)
        self.tune_partition_count_limit = int(cfg.tune_partition_count_limit)
        self.tune_2partition_index_limit = int(cfg.tune_2partition_index_limit)
        self.tune_3partition_index_limit = int(cfg.tune_3partition_index_limit)
        self.tune_4partition_index_limit = int(cfg.tune_4partition_index_limit)
        self.tune_2partitioning_candidate_limit = int(
            cfg.tune_2partitioning_candidate_limit)
        self.tune_3partitioning_candidate_limit = int(
            cfg.tune_3partitioning_candidate_limit)
        self.tune_4partitioning_candidate_limit = int(
            cfg.tune_4partitioning_candidate_limit)
        self.tune_2partition_early_out_limit_factor = float(
            cfg.tune_2partition_early_out_limit_factor)
        self.tune_3partition_early_out_limit_factor = float(
            cfg.tune_3partition_early_out_limit_factor)
        self.tune_2plane_early_out_limit_correlation = float(
            cfg.tune_2plane_early_out_limit_correlation)
        self.tune_search_mode0_enable = float(cfg.tune_search_mode0_enable)
        self.rgbm_scale = (float(cfg.rgbm_m_scale)
                           if cfg.flags & Flags.MAP_RGBM else 0.0)

    def _key(self):
        return tuple(sorted(self.__dict__.items()))

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, _CfgStatic) and self._key() == other._key()


def make_block_state(texels, channel_weight, profile: int = 1,
                     alpha_weight: bool = False):
    """Build the per-block state dict from (N, T, 4) texels."""
    data_min = jnp.min(texels, axis=1)
    data_max = jnp.max(texels, axis=1)
    data_mean = jnp.mean(texels, axis=1)
    gray_t = ((texels[..., 0] == texels[..., 1])
              & (texels[..., 0] == texels[..., 2]))
    grayscale = jnp.all(gray_t, axis=1)
    # HDR profile alpha defaults to LNS-encoded 1.0 (reference:
    # image_block::get_default_alpha, astcenc_internal.h:838-841)
    default_alpha = 30720.0 if profile == 3 else 65535.0
    alpha1 = ((data_min[:, 3] == default_alpha)
              & (data_max[:, 3] == default_alpha))
    uses_alpha = data_min[:, 3] != data_max[:, 3]
    st = {
        "texels": texels,
        "data_min": data_min,
        "data_max": data_max,
        "data_mean": data_mean,
        "grayscale": grayscale,
        "uses_alpha": uses_alpha,
        "is_luminance": grayscale & alpha1,
        "is_luminancealpha": grayscale & ~alpha1,
        "default_alpha": default_alpha,
    }
    if alpha_weight:
        # USE_ALPHA_WEIGHT: rgb error weights scale by the block's max
        # alpha (reference: astcenc_entry.cpp:1016-1035).
        st["cw_scale"] = data_max[:, 3] * jnp.float32(1.0 / 65535.0)
    return st


def _lowest_correlation(texels, channel_weight):
    """prepare_block_statistics (reference: :1047-1159)."""
    cw = jnp.asarray(channel_weight, jnp.float32)
    per_block = cw.ndim == 2
    weight = jnp.sum(cw, axis=-1) / 4.0            # scalar or (N,)
    T = texels.shape[1]
    wsum = weight * T
    w1 = weight[:, None] if per_block else weight
    w2 = weight[:, None, None] if per_block else weight
    rpt = 1.0 / jnp.maximum(wsum, 1e-7)
    rpt2 = rpt[:, None, None] if per_block else rpt

    s = jnp.sum(texels, axis=1) * w1                        # (N, 4)
    var = jnp.einsum("ntc,ntd->ncd", texels, texels) * w2
    var = var - s[:, :, None] * s[:, None, :] * rpt2

    d = jnp.sqrt(jnp.clip(
        var[:, jnp.arange(4), jnp.arange(4)], 0.0, None))
    denom = d[:, :, None] * d[:, None, :]
    corr = var / jnp.where(denom > 0, denom, 1.0)
    corr = jnp.where(jnp.isnan(corr) | (denom == 0), 1.0, corr)

    iu = np.triu_indices(4, k=1)
    vals = jnp.abs(corr[:, iu[0], iu[1]])
    return jnp.min(vals, axis=1)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _trial1_jit(enc_key, cfgs, profile, u8_mask, pc, only_always,
                st, pot, counts, pindex, threshold, quant_limit, scb):
    return trial.compress_trial_1plane(
        st, enc_key.tables, cfgs, profile, u8_mask, pot, counts, pindex,
        pc, only_always, threshold, quant_limit, scb)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _trial2_recs_jit(enc_key, cfgs, profile, u8_mask,
                     st, ext_valid, quant_limit):
    return trial.trial2_records(st, enc_key.tables, cfgs, profile, u8_mask,
                                quant_limit, ext_valid, fold_all=True)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _trial1_recs_jit(enc_key, cfgs, profile, u8_mask, pc,
                     st_f, pot_f, counts_f, ql_f, ext_valid_f):
    return trial.trial1_records(st_f, enc_key.tables, cfgs, profile,
                                u8_mask, pot_f, counts_f, pc, False,
                                ql_f, ext_valid_f)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _trial2_jit(enc_key, cfgs, profile, u8_mask,
                st, p2c_vec, threshold, quant_limit, scb, active):
    return trial.compress_trial_2planes(
        st, enc_key.tables, cfgs, profile, u8_mask, p2c_vec, threshold,
        quant_limit, scb, active)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _psearch_jit(enc_key, cw, pc, limit, reqc, st):
    return partition_search.find_best_partition_candidates(
        st, enc_key.bsd, cw, pc, limit, reqc)


@functools.partial(jax.jit, static_argnums=(0,))
def _pack_jit(dtables_key, scb):
    return physical.symbolic_to_physical_batch(dtables_key.tables, scb)


# ---------------------------------------------------------------------------
# Diagnostic trace capture (-dtrace; reference: astcenc_diagnostic_trace.h)
# ---------------------------------------------------------------------------

def _trace_blocks(tracer, st, error_threshold, is_const, N):
    """Block-node attributes (reference: compress_block,
    astcenc_compress_symbolic.cpp:1173-1212)."""
    dmin = np.asarray(st["data_min"])
    dmax = np.asarray(st["data_max"])
    thr = np.broadcast_to(np.asarray(error_threshold), (N,))
    isc = np.asarray(is_const)
    positions = tracer.positions
    base = getattr(tracer, "base", 0)
    for n in range(min(N, getattr(tracer, "real_n", N))):
        b = tracer.block(base + n, positions.get(base + n, (0, 0, 0)))
        for i, c in enumerate("rgba"):
            b.add(f"min_{c}", float(dmin[n, i]))
            b.add(f"max_{c}", float(dmax[n, i]))
        b.add("tune_error_threshold", float(thr[n]))
        if isc[n]:
            p = b.child("pass")
            p.add("partition_count", 0)
            p.add("plane_count", 1)
            p.add("exit", "quality hit")


def _trace_pass(tracer, bsd, recs, partition_count, plane_count, active,
                only_always=False, plane_component=None,
                partition_index=None):
    """One pass node per active block, with one candidate node per
    recorded candidate (reference: astcenc_compress_symbolic.cpp:506-676,
    1295-1429)."""
    err = np.asarray(recs["err"])
    mode = np.asarray(recs["mode"])
    act = np.asarray(active)
    N, CK = err.shape
    # mode index -> (wx, wy, wz, quant) via the BSD block-mode tables
    bm_index = {int(m): i for i, m in enumerate(bsd.bm_mode_index)}
    wdims = bsd.dm_weight_dims
    bm_dm = bsd.bm_decimation_mode
    bm_q = bsd.bm_quant_mode
    # K = rounds+1 records per candidate (layout [r0-pre, r0-post,
    # r1-post, ...]); mode is jnp.repeat(cand_modes, K), so K is the run
    # length of identical mode values.
    K = 1
    while K < CK and np.all(mode[:, K - 1] == mode[:, K]):
        K += 1
    if CK % K:
        K = 1
    C = CK // K
    base = getattr(tracer, "base", 0)
    for n in range(min(N, getattr(tracer, "real_n", N))):
        if not act[n]:
            continue
        b = tracer.block(base + n)
        p = b.child("pass")
        p.add("partition_count", int(partition_count))
        p.add("plane_count", int(plane_count))
        if plane_component is not None:
            p.add("plane_component", int(plane_component))
        if partition_index is not None:
            p.add("partition_index", int(partition_index[n]))
        if only_always:
            p.add("search_mode", "only_always")
        for c in range(C):
            errs = err[n, c * K:(c + 1) * K]
            if not np.any(errs < 1e29):
                continue
            cn = p.child("candidate")
            m = int(mode[n, c * K])
            bi = bm_index.get(m)
            if bi is not None:
                wx, wy, wz = wdims[bm_dm[bi]]
                cn.add("weight_x", int(wx))
                cn.add("weight_y", int(wy))
                cn.add("weight_z", int(wz))
                cn.add("weight_quant", int(bm_q[bi]))
            cn.add("error_prerealign", float(errs[0]))
            for e in errs[1:]:
                cn.add("error_postrealign", float(e))


def compress_stage_stats(dtables_key, enc_key, cfgs, texels):
    """Run the split-stage pipeline recording the unfinished fraction
    after each pass (diagnostic for wavefront-compaction sizing)."""
    stats = []
    compress_symbolic_batch(dtables_key, enc_key, cfgs, texels,
                            stage_stats=stats)
    N = texels.shape[0]
    return [(name, float(np.sum(~np.asarray(m))) / N) for name, m in stats]


def compress_symbolic_batch(dtables_key, enc_key, cfgs: _CfgStatic, texels,
                            tracer=None, stage_stats=None):
    """Compress a batch of blocks to physical form. texels: (N, T, 4).

    Orchestrates separately-jitted stages so structurally identical trials
    (e.g. the two pc=2 partition trials, or the four 2-plane component
    passes) share a single compilation.

    tracer: optional codec.trace.Tracer — captures the reference's
    block/pass/candidate diagnostic tree (-dtrace); debug path only.
    """
    scb, aux = _stage1_1plane(dtables_key, enc_key, cfgs, texels,
                              tracer=tracer, stage_stats=stage_stats)
    scb = _stage2a_2plane(enc_key, cfgs, texels, scb,
                          aux["quant_limit"], aux["best0"],
                          tracer=tracer, stage_stats=stage_stats)
    scb = _stage2b_multipart(enc_key, cfgs, texels, scb,
                             aux["quant_limit"], aux["best0"],
                             tracer=tracer, stage_stats=stage_stats)
    return _finalize_pack(dtables_key, enc_key, cfgs, scb, aux)


def _stage1_1plane(dtables_key, enc_key, cfgs: _CfgStatic, texels,
                   tracer=None, stage_stats=None):
    """Block state + constant detection + the 1-partition 1-plane trials.

    Runs at full batch width; everything after it (2-plane, multi-
    partition) can be wavefront-compacted to the unfinished lanes
    (reference analog: the per-block early exits of compress_block,
    astcenc_compress_symbolic.cpp:1283-1318).

    Returns (scb, aux) where aux carries the (N,)-shaped state the later
    stages and the finalize step need: is_const/const_color (finalize),
    quant_limit/best0 (trial gating), skip2p (2-plane eligibility).
    """
    et: trial.EncoderTables = enc_key.tables
    dt = dtables_key.tables
    cfg = cfgs
    profile = cfg.profile
    u8_mask = (profile == int(Profile.LDR_SRGB)
               or bool(cfg.flags & Flags.USE_DECODE_UNORM8))
    cw = cfg.channel_weights
    bsd = enc_key.bsd

    N, T, _ = texels.shape
    st = make_block_state(
        texels, cw, profile,
        alpha_weight=bool(cfg.flags & Flags.USE_ALPHA_WEIGHT))

    # --- Constant color detection --------------------------------------------
    is_const = jnp.all(st["data_min"] == st["data_max"], axis=1)
    tex0 = texels[:, 0, :]
    if profile >= 2:
        # HDR: encode the constant color as FP16 (reference: :1224-1231)
        from ..ops import softfloat as sf
        lns_mask = np.array([True, True, True, profile == 3])
        f16_lns = sf.lns_to_sf16(tex0.astype(jnp.int32))
        unorm = tex0 / 65535.0
        f16_un = sf.float_to_float16(unorm)
        const_color = jnp.where(jnp.asarray(lns_mask), f16_lns, f16_un)
    else:
        const_color = jnp.floor(jnp.clip(tex0 / 65535.0, 0.0, 1.0) * 65535.0
                                + 0.5).astype(jnp.int32)

    # --- Error thresholds ------------------------------------------------------
    # error_weight_sum (reference: :1204); per-block under USE_ALPHA_WEIGHT
    cwe = trial.effective_cw(cfg, st)
    ews = (jnp.sum(cwe, axis=-1) * T if isinstance(cwe, jnp.ndarray)
           else float(sum(cw)) * T)
    l_scale = jnp.where(st["is_luminance"], 1.0 / 1.5, 1.0)
    la_scale = jnp.where(st["is_luminancealpha"], 1.0 / 1.05, 1.0)
    error_threshold = cfg.tune_db_limit * ews * l_scale * la_scale
    overshoot = 1.0 / cfg.tune_mse_overshoot

    if tracer is not None:
        _trace_blocks(tracer, st, error_threshold, is_const, N)

    scb = trial.empty_scb(N, T)
    scb["finished"] = is_const
    quant_limit = jnp.full((N,), QUANT_32, jnp.int32)
    best_err_pcount = [jnp.full((N,), jnp.float32(ERROR_CALC_DEFAULT))
                       for _ in range(4)]

    pot1 = jnp.zeros((N, T), jnp.int32)
    counts1 = jnp.zeros((N, 4), jnp.int32).at[:, 0].set(T)
    pindex1 = jnp.zeros((N,), jnp.int32)

    # --- 1 partition, 1 plane trials ------------------------------------------
    start_trial = 1
    if (cfg.tune_search_mode0_enable >= TUNE_MIN_SEARCH_MODE0
            and bsd.dim[2] == 1):
        start_trial = 0

    errorval_mult = (overshoot, 1.0)
    full_limit = jnp.full((N,), QUANT_32, jnp.int32)
    for i in range(start_trial, 2):
        # Both 1-plane passes search the full weight-quant range; the
        # recorded winner quant only filters the LATER 2-plane and
        # multi-partition passes (reference: astcenc_compress_symbolic.cpp
        # :1292-1318 passes QUANT_32 here, quant_limit below).
        thr1 = error_threshold * errorval_mult[i] * overshoot
        if tracer is None:
            scb, errv = _trial1_jit(
                enc_key, cfg, profile, u8_mask, 1, i == 0,
                st, pot1, counts1, pindex1, thr1, full_limit, scb)
        else:
            recs = trial.trial1_records(
                st, enc_key.tables, cfg, profile, u8_mask, pot1, counts1,
                1, i == 0, full_limit, ~scb["finished"])
            _trace_pass(tracer, enc_key.bsd, recs, partition_count=1,
                        plane_count=1, active=~scb["finished"],
                        only_always=(i == 0))
            scb, errv = trial.apply_records_1plane(scb, recs, thr1, 1,
                                                   pindex1)

        # Track winner's weight quant for later trials
        won = ~scb["block_type_error"]
        pk = jnp.asarray(dt.block_mode_packed_index)[
            jnp.clip(scb["block_mode"], 0, 2047)]
        wq = jnp.asarray(dt.bm_quant)[jnp.clip(pk, 0, dt.bm_quant.shape[0] - 1)]
        quant_limit = jnp.where(won, wq, quant_limit)

        best_err_pcount[0] = jnp.minimum(best_err_pcount[0], errv)
        hit = errv < error_threshold * errorval_mult[i]
        scb["finished"] = scb["finished"] | hit
        if stage_stats is not None:
            stage_stats.append((f"1plane pc=1 pass{i}", scb["finished"]))

    # 2-plane eligibility (fetched by the compaction driver alongside
    # "finished" so ineligible lanes never enter the 2-plane stage).
    if et.m2_quant.shape[0] > 0:
        lowest_correl = _lowest_correlation(texels, trial.effective_cw(cfg, st))
        skip2p = lowest_correl > cfg.tune_2plane_early_out_limit_correlation
    else:
        skip2p = jnp.ones((N,), bool)

    aux = {
        "is_const": is_const,
        "const_color": const_color,
        "quant_limit": quant_limit,
        "best0": best_err_pcount[0],
        "skip2p": skip2p,
    }
    return scb, aux


def _block_trial_env(enc_key, cfgs: _CfgStatic, texels):
    """Shared derivations the trial stages need: block state, the error
    threshold, and the overshoot factor."""
    cfg = cfgs
    T = texels.shape[1]
    st = make_block_state(
        texels, cfg.channel_weights, cfg.profile,
        alpha_weight=bool(cfg.flags & Flags.USE_ALPHA_WEIGHT))
    cwe = trial.effective_cw(cfg, st)
    ews = (jnp.sum(cwe, axis=-1) * T if isinstance(cwe, jnp.ndarray)
           else float(sum(cfg.channel_weights)) * T)
    l_scale = jnp.where(st["is_luminance"], 1.0 / 1.5, 1.0)
    la_scale = jnp.where(st["is_luminancealpha"], 1.0 / 1.05, 1.0)
    error_threshold = cfg.tune_db_limit * ews * l_scale * la_scale
    overshoot = 1.0 / cfg.tune_mse_overshoot
    return st, error_threshold, overshoot


def _stage2a_2plane(enc_key, cfgs: _CfgStatic, texels, scb, quant_limit,
                    best0, tracer=None, stage_stats=None):
    """1-partition 2-plane trials (compactable stage).

    All four component passes fold into one (4N,) comp-major batched
    records computation (the per-component ideal variants the reference
    computes are the batch rows); the reference's sequential early-out
    bookkeeping replays afterwards on cheap (N,)-wide masks.
    """
    et: trial.EncoderTables = enc_key.tables
    cfg = cfgs
    profile = cfg.profile
    u8_mask = (profile == int(Profile.LDR_SRGB)
               or bool(cfg.flags & Flags.USE_DECODE_UNORM8))
    N, T, _ = texels.shape
    st, error_threshold, overshoot = _block_trial_env(enc_key, cfg, texels)
    best_err_pcount = [best0, None, None, None]

    if et.m2_quant.shape[0] > 0:
        lowest_correl = _lowest_correlation(texels, trial.effective_cw(cfg, st))
        if tracer is not None:
            lc = np.asarray(lowest_correl)
            tb = getattr(tracer, "base", 0)
            for n in range(min(N, getattr(tracer, "real_n", N))):
                tracer.block(tb + n).add("lowest_correl", float(lc[n]))
        skip_two_plane = (lowest_correl
                          > cfg.tune_2plane_early_out_limit_correlation)
        comp_order = (3, 2, 1, 0)
        cand_act = []
        for comp in comp_order:
            a = ~skip_two_plane
            if comp != 3:
                a = a & ~st["grayscale"]
            a = a & ~(st["data_min"][:, comp] == st["data_max"][:, comp])
            cand_act.append(a)
        ext_valid2 = (jnp.stack(cand_act, axis=1)
                      & ~scb["finished"][:, None])          # (N, 4)
        recs2 = _trial2_recs_jit(enc_key, cfg, profile, u8_mask,
                                 st, ext_valid2, quant_limit)
        stopped2p = jnp.zeros((N,), bool)
        for i, comp in enumerate(comp_order):
            recs_i = {k: v.reshape((4, N) + v.shape[1:])[i]
                      for k, v in recs2.items()}
            active = cand_act[i] & ~stopped2p & ~scb["finished"]
            if tracer is not None:
                _trace_pass(tracer, enc_key.bsd, recs_i, partition_count=1,
                            plane_count=2, active=active,
                            plane_component=comp)
            p2c_vec = jnp.full((N,), comp, jnp.int32)
            scb, errv = trial.apply_records_2plane(
                scb, recs_i, error_threshold * overshoot, p2c_vec, active)

            errv = jnp.where(active, errv, jnp.float32(ERROR_CALC_DEFAULT))
            stopped2p = stopped2p | (active
                                     & (errv > best_err_pcount[0] * 1.85))
            hit = active & (errv < error_threshold)
            scb["finished"] = scb["finished"] | hit
        if stage_stats is not None:
            nskip = jnp.asarray(skip_two_plane)
            stage_stats.append(("2plane corr-eligible", scb["finished"]
                                | nskip))
            stage_stats.append(("after 2plane", scb["finished"]))
    return scb


def _stage2b_multipart(enc_key, cfgs: _CfgStatic, texels, scb, quant_limit,
                       best0, tracer=None, stage_stats=None):
    """Multi-partition trials, pc = 2..partition_count_limit."""
    N = texels.shape[0]
    pcs = _multipart_pcs(enc_key, cfgs)
    best_prev = best0
    for pc in range(2, cfgs.tune_partition_count_limit + 1):
        if pc not in pcs:
            # Level skipped: the next level's early-out baseline is the
            # (never-written) default, matching the unsplit formulation.
            best_prev = jnp.full((N,), jnp.float32(ERROR_CALC_DEFAULT))
            continue
        scb, best_prev = _stage2b_one_pc(
            enc_key, cfgs, texels, scb, quant_limit, best_prev, pc,
            tracer=tracer)
        if stage_stats is not None:
            stage_stats.append((f"after pc={pc}", scb["finished"]))
    return scb


def _multipart_pcs(enc_key, cfgs: _CfgStatic):
    """Partition counts with any selected partitionings and trial budget."""
    req_idx = (cfgs.tune_2partition_index_limit,
               cfgs.tune_3partition_index_limit,
               cfgs.tune_4partition_index_limit)
    req_trials = (cfgs.tune_2partitioning_candidate_limit,
                  cfgs.tune_3partitioning_candidate_limit,
                  cfgs.tune_4partitioning_candidate_limit)
    out = []
    for pc in range(2, cfgs.tune_partition_count_limit + 1):
        ntrials = min(req_trials[pc - 2], req_idx[pc - 2])
        if enc_key.bsd.partitionings[pc]["count_selected"] and ntrials:
            out.append(pc)
    return tuple(out)


def _stage2b_one_pc(enc_key, cfgs: _CfgStatic, texels, scb, quant_limit,
                    best_prev, pc: int, tracer=None):
    """One partition-count level of the multi-partition search (compactable:
    each level's survivor set shrinks ~5x, so levels sync separately).

    best_prev: (N,) best error of the previous pc level (chained across
    levels; reference: best_errorvals_for_pcount,
    astcenc_compress_symbolic.cpp:1329-1418).

    Returns (scb, best_this_pc).
    """
    et: trial.EncoderTables = enc_key.tables
    cfg = cfgs
    profile = cfg.profile
    u8_mask = (profile == int(Profile.LDR_SRGB)
               or bool(cfg.flags & Flags.USE_DECODE_UNORM8))
    cw = cfg.channel_weights
    bsd = enc_key.bsd
    N, T, _ = texels.shape
    st, error_threshold, overshoot = _block_trial_env(enc_key, cfg, texels)
    best_this = jnp.full((N,), jnp.float32(ERROR_CALC_DEFAULT))

    req_idx = (cfg.tune_2partition_index_limit,
               cfg.tune_3partition_index_limit,
               cfg.tune_4partition_index_limit)
    req_trials = (cfg.tune_2partitioning_candidate_limit,
                  cfg.tune_3partitioning_candidate_limit,
                  cfg.tune_4partitioning_candidate_limit)
    exit_factors = (0.0, cfg.tune_2partition_early_out_limit_factor,
                    cfg.tune_3partition_early_out_limit_factor, 0.0)

    ntrials = min(req_trials[pc - 2], req_idx[pc - 2])
    parts = bsd.partitionings[pc]
    seeds, valid = _psearch_jit(enc_key, cw, pc, req_idx[pc - 2],
                                ntrials, st)

    pot_all = jnp.asarray(parts["partition_of_texel"].astype(np.int32))
    ptc_all = jnp.asarray(parts["partition_texel_count"].astype(np.int32))
    pk_map = jnp.asarray(parts["packed_index"].astype(np.int32))

    ntr = min(ntrials, seeds.shape[1])
    # Fold the seed-candidate trials into one batched records pass
    # (ti-major), then replay the sequential take/early-out bookkeeping.
    pot_l, counts_l = [], []
    for ti in range(ntr):
        row = jnp.clip(pk_map[jnp.clip(seeds[:, ti], 0, 1023)], 0,
                       pot_all.shape[0] - 1)
        pot_l.append(pot_all[row])
        counts_l.append(ptc_all[row])
    st_f = {k: (jnp.concatenate([v] * ntr, 0)
                if getattr(v, "ndim", 0) else v)
            for k, v in st.items()}
    pot_f = jnp.concatenate(pot_l, 0)
    counts_f = jnp.concatenate(counts_l, 0)
    ql_f = jnp.concatenate([quant_limit] * ntr, 0)
    ext_f = (valid[:, :ntr] & ~scb["finished"][:, None]
             ).T.reshape(ntr * N)
    recs_p = _trial1_recs_jit(enc_key, cfg, profile, u8_mask, pc,
                              st_f, pot_f, counts_f, ql_f, ext_f)

    for ti in range(ntr):
        recs_i = {k: v.reshape((ntr, N) + v.shape[1:])[ti]
                  for k, v in recs_p.items()}
        ok = valid[:, ti]
        if tracer is not None:
            _trace_pass(tracer, enc_key.bsd, recs_i,
                        partition_count=pc, plane_count=1,
                        active=ok & ~scb["finished"],
                        partition_index=np.asarray(seeds[:, ti]))
        saved_fin = scb["finished"]
        scb = dict(scb)
        scb["finished"] = saved_fin | ~ok
        scb, errv = trial.apply_records_1plane(
            scb, recs_i, error_threshold * overshoot, pc, seeds[:, ti])
        scb["finished"] = saved_fin

        errv = jnp.where(ok, errv, jnp.float32(ERROR_CALC_DEFAULT))
        best_this = jnp.minimum(best_this, errv)
        # Inner early-outs (reference: :1400-1418)
        scale_in = exit_factors[pc - 1] * 1.85
        stop_in = best_this > (best_prev * scale_in)
        hit = errv < error_threshold
        scb["finished"] = scb["finished"] | (stop_in & ok) | (hit & ok)

    stop_out = best_this > (best_prev * exit_factors[pc - 1])
    scb["finished"] = scb["finished"] | stop_out
    return scb, best_this


def _finalize_pack(dtables_key, enc_key, cfgs: _CfgStatic, scb, aux):
    """Fallback/constant-block selection + physical pack (full width)."""
    et: trial.EncoderTables = enc_key.tables
    profile = cfgs.profile
    is_const = aux["is_const"]
    const_color = aux["const_color"]
    N = is_const.shape[0]
    scb = dict(scb)

    fallback = scb["block_type_error"] & ~is_const
    if profile >= 2:
        scb["const_u16"] = fallback
        scb["const_f16"] = is_const
    else:
        scb["const_u16"] = is_const | fallback
        scb["const_f16"] = jnp.zeros((N,), bool)
    scb["constant_color"] = const_color
    # Avoid packing garbage for const/fallback lanes
    safe_mode = jnp.asarray(int(et.m1_mode_index[0]))
    err_lane = scb["block_type_error"]
    scb["block_mode"] = jnp.where(err_lane, safe_mode, scb["block_mode"])
    scb["quant_mode"] = jnp.where(err_lane, 4, scb["quant_mode"])
    scb["partition_count"] = jnp.where(err_lane, 1, scb["partition_count"])

    return _pack_jit(dtables_key, scb)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def compress_symbolic_batch_mono(dtables_key, enc_key, cfgs, texels):
    """Whole-pipeline single jit: zero host round-trips per batch.

    The split-stage orchestrator pays one host->device dispatch per stage,
    which is fine on a local backend but dominates on high-latency device
    tunnels. Production / TPU paths use this monolithic compilation (the
    nested stage jits inline into one program).
    """
    return compress_symbolic_batch(dtables_key, enc_key, cfgs, texels)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def compress_symbolic_batch_mono_u8(dtables_key, enc_key, cfgs, texels_u8):
    """Mono pipeline taking (N, T, 4) uint8 texels: the UNORM8->UNORM16
    promotion runs on device, so the host->device transfer is 4x smaller
    (the tunnel transfer rides the critical path at production chunk
    sizes)."""
    texels = texels_u8.astype(jnp.float32) * jnp.float32(65535.0 / 255.0)
    return compress_symbolic_batch(dtables_key, enc_key, cfgs, texels)


# ---------------------------------------------------------------------------
# Wavefront-compacted execution (TPU production path).
#
# The reference encoder's throughput comes as much from its per-block early
# exits as from its SIMD kernels: most blocks of a natural image hit the
# quality threshold after the 1-partition trial and never pay for 2-plane or
# multi-partition searches (astcenc_compress_symbolic.cpp:1283-1456). A
# fully batched pipeline forfeits that — masked-off lanes still compute.
# This driver restores the early-exit economics TPU-style:
#
#   stage1 (full batch)  ->  lax.while_loop: gather the unfinished lanes
#   into ONE static-size slice per iteration  ->  stage2a (2-plane) and
#   stage2b (multi-partition) run only on survivors  ->  scatter back  ->
#   finalize + physical pack (full batch).
#
# The survivor-count-dependent trip count lives in the while_loop condition
# ON DEVICE, so the host dispatches every phase asynchronously back-to-back
# and blocks exactly once per chunk (the result fetch). This matters
# doubly: compute scales with the actual survivor count (early-exit
# economics), and per-image latency is compute + ONE tunnel round-trip —
# the earlier host-driven slicing paid three blocking mask fetches per
# image (~26 ms RTT each on the axon tunnel), which capped the public API
# at ~0.4 MT/s per 256x256 image regardless of device speed. There is also
# exactly one slice width per chunk shape, so the compile-cache footprint
# is one program per (phase, chunk shape) — no data-dependent ladder.
# ---------------------------------------------------------------------------


def _promote_texels(texels):
    if texels.dtype == jnp.uint8:
        return texels.astype(jnp.float32) * jnp.float32(65535.0 / 255.0)
    return texels


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _c_stage1_jit(dtables_key, enc_key, cfgs, texels_any):
    texels = _promote_texels(texels_any)
    return _stage1_1plane(dtables_key, enc_key, cfgs, texels)


def _gather_lanes(tree, idx):
    return {k: jnp.take(v, idx, axis=0, mode="clip")
            for k, v in tree.items()}


def _scatter_lanes(tree, idx, sub):
    # Out-of-bounds rows (slice padding) drop; real rows are unique.
    return {k: tree[k].at[idx].set(sub[k], mode="drop") for k in tree}


def _c_gather_common(texels_any, scb, quant_limit, idx):
    N = texels_any.shape[0]
    valid = idx < N
    tex_c = _promote_texels(jnp.take(texels_any, idx, axis=0, mode="clip"))
    scb_c = _gather_lanes(scb, idx)
    scb_c["finished"] = scb_c["finished"] | ~valid
    ql_c = jnp.take(quant_limit, idx, axis=0, mode="clip")
    return tex_c, scb_c, ql_c


def _loop_slice(N: int) -> int:
    """The single static slice width for the device-side survivor loop.

    One width per chunk shape keeps the compile cache at one program per
    phase. Iterations cost nothing on the host (the trip count lives in
    the while_loop condition), so the width tradeoff is last-slice padding
    waste vs per-iteration kernel fixed costs; a 256..8192 sweep on v5e at
    a 65536-block chunk put the optimum at 512 (3.33 MT/s vs 2.80 at
    8192 — padding waste dominates because survivor counts per phase are
    a few percent of the chunk by the later levels).
    """
    env = os.environ.get("ASTC_COMPACT_SLICE")
    if env:
        return min(N, int(env))
    return min(N, 512)


def _survivor_index(mask):
    """(idx_all, total): survivor lane indices packed to the front, padded
    with the out-of-bounds sentinel N (gather clamps, scatter drops)."""
    N = mask.shape[0]
    idx_all = jnp.where(mask, size=N, fill_value=N)[0].astype(jnp.int32)
    return idx_all, jnp.sum(mask.astype(jnp.int32))


def _phase_while(scb, best_acc, mask, stage_fn, S):
    """Run stage_fn over ceil(survivors/S) static-width slices inside a
    device-side while_loop: the data-dependent trip count never touches the
    host, so phases chain with zero blocking round-trips."""
    idx_all, total = _survivor_index(mask)

    def cond(carry):
        return carry[0] * S < total

    def body(carry):
        k, scb, best_acc = carry
        idx = jax.lax.dynamic_slice(idx_all, (k * S,), (S,))
        scb, best_acc = stage_fn(scb, best_acc, idx)
        return k + jnp.int32(1), scb, best_acc

    _, scb, best_acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), scb, best_acc))
    return scb, best_acc


@functools.partial(jax.jit, static_argnums=(0, 1, 6), donate_argnums=(3,))
def _c_tail_loop_jit(enc_key, cfgs, texels_any, scb, quant_limit, best0, pc):
    """Fused post-stage1 tail: 2-plane trials + the FIRST multi-partition
    level over the unfinished lanes, slice-looped on device.

    Lanes the correlation gate skips are masked inside _stage2a_2plane, so
    fusing is bit-identical to split dispatches. scb is DONATED: the
    (N,)-wide state aliases in place through the loop carry."""
    N = texels_any.shape[0]
    S = _loop_slice(N)

    def stage(scb, best_acc, idx):
        tex_c, scb_c, ql_c = _c_gather_common(texels_any, scb, quant_limit,
                                              idx)
        b0_c = jnp.take(best0, idx, axis=0, mode="clip")
        scb_c = _stage2a_2plane(enc_key, cfgs, tex_c, scb_c, ql_c, b0_c)
        scb_c, best_c = _stage2b_one_pc(enc_key, cfgs, tex_c, scb_c, ql_c,
                                        b0_c, pc)
        return (_scatter_lanes(scb, idx, scb_c),
                best_acc.at[idx].set(best_c, mode="drop"))

    best_acc = jnp.full((N,), jnp.float32(ERROR_CALC_DEFAULT))
    return _phase_while(scb, best_acc, ~scb["finished"], stage, S)


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(3,))
def _c_2a_loop_jit(enc_key, cfgs, texels_any, scb, quant_limit, best0,
                   skip2p):
    """2-plane-only phase (configs with no multi-partition levels)."""
    N = texels_any.shape[0]
    S = _loop_slice(N)

    def stage(scb, best_acc, idx):
        tex_c, scb_c, ql_c = _c_gather_common(texels_any, scb, quant_limit,
                                              idx)
        b0_c = jnp.take(best0, idx, axis=0, mode="clip")
        scb_c = _stage2a_2plane(enc_key, cfgs, tex_c, scb_c, ql_c, b0_c)
        return _scatter_lanes(scb, idx, scb_c), best_acc

    best_acc = jnp.zeros((0,), jnp.float32)
    mask = ~scb["finished"] & ~skip2p
    scb, _ = _phase_while(scb, best_acc, mask, stage, S)
    return scb


@functools.partial(jax.jit, static_argnums=(0, 1, 6),
                   donate_argnums=(3, 5))
def _c_pc_loop_jit(enc_key, cfgs, texels_any, scb, quant_limit, best_prev,
                   pc):
    """One multi-partition level over the unfinished lanes, slice-looped on
    device. best_prev is the previous level's (N,) best error (chained
    early-out baseline); returns (scb, best_this_level). scb and best_prev
    are DONATED."""
    N = texels_any.shape[0]
    S = _loop_slice(N)

    def stage(scb, best_acc, idx):
        tex_c, scb_c, ql_c = _c_gather_common(texels_any, scb, quant_limit,
                                              idx)
        bp_c = jnp.take(best_prev, idx, axis=0, mode="clip")
        scb_c, best_c = _stage2b_one_pc(enc_key, cfgs, tex_c, scb_c, ql_c,
                                        bp_c, pc)
        return (_scatter_lanes(scb, idx, scb_c),
                best_acc.at[idx].set(best_c, mode="drop"))

    best_acc = jnp.full((N,), jnp.float32(ERROR_CALC_DEFAULT))
    return _phase_while(scb, best_acc, ~scb["finished"], stage, S)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _c_finalize_jit(dtables_key, enc_key, cfgs, scb, aux):
    return _finalize_pack(dtables_key, enc_key, cfgs, scb, aux)


def _host_async(x):
    """Start an async device->host copy; np.asarray later is cheap."""
    try:
        x.copy_to_host_async()
    except AttributeError:
        pass
    return x


# Host-blocking trace (ASTC_PIPE_TRACE=1): (label, seconds) per potentially
# blocking host operation inside the compaction pipeline, so dispatch-vs-
# fetch stalls can be attributed (tools/pipe_trace.py aggregates).
PIPE_TRACE: list = []


def _traced(label, fn):
    if not os.environ.get("ASTC_PIPE_TRACE"):
        return fn()
    t0 = time.perf_counter()
    out = fn()
    PIPE_TRACE.append((label, time.perf_counter() - t0))
    return out


class CompactState:
    """In-flight per-chunk state for the compaction pipeline."""

    __slots__ = ("tex_dev", "pcb")

    def __init__(self, tex_dev, pcb):
        self.tex_dev = tex_dev
        self.pcb = pcb


class CompactRunner:
    """Compacted dispatch for one (context, config) pair.

    start(texels) enqueues the ENTIRE schedule asynchronously — stage1,
    the fused 2-plane + multi-partition survivor loops (device-side trip
    counts, see _phase_while), and the finalize pack — and returns
    immediately; finish(state) performs the single blocking result fetch.
    Per-chunk latency is therefore device compute + one tunnel round-trip.

    run(texels) executes one chunk serially (tests, small images);
    pipeline(chunks) keeps several chunks' device queues full.
    """

    def __init__(self, dtables_key, enc_key, cfgs: _CfgStatic):
        self.dtables_key = dtables_key
        self.enc_key = enc_key
        self.cfgs = cfgs
        self.has_2plane = enc_key.tables.m2_quant.shape[0] > 0
        self.pcs = _multipart_pcs(enc_key, cfgs)
        # Fused tail needs both a 2-plane family and a first partition
        # level to fuse; ASTC_FUSE_TAIL=0 forces split dispatches
        # (profiling / A-B comparison).
        self.fuse_tail = (self.has_2plane and bool(self.pcs)
                          and os.environ.get("ASTC_FUSE_TAIL", "1") != "0")

    def start(self, texels) -> CompactState:
        tex_dev = (texels if isinstance(texels, jax.Array)
                   else _traced("upload", lambda: jax.device_put(texels)))
        scb, aux = _traced("dispatch_stage1", lambda: _c_stage1_jit(
            self.dtables_key, self.enc_key, self.cfgs, tex_dev))
        best_prev = aux["best0"]
        rest = list(self.pcs)
        if self.fuse_tail:
            scb, best_prev = _traced("dispatch_tail", lambda: (
                _c_tail_loop_jit(self.enc_key, self.cfgs, tex_dev, scb,
                                 aux["quant_limit"], aux["best0"],
                                 rest.pop(0))))
        elif self.has_2plane:
            scb = _traced("dispatch_2a", lambda: _c_2a_loop_jit(
                self.enc_key, self.cfgs, tex_dev, scb,
                aux["quant_limit"], aux["best0"], aux["skip2p"]))
        for pc in rest:
            scb, best_prev = _traced("dispatch_pc%d" % pc, lambda
                                     s=scb, b=best_prev, p=pc: (
                _c_pc_loop_jit(self.enc_key, self.cfgs, tex_dev, s,
                               aux["quant_limit"], b, p)))
        pcb = _traced("dispatch_finalize", lambda: _host_async(
            _c_finalize_jit(self.dtables_key, self.enc_key, self.cfgs,
                            scb, aux)))
        return CompactState(tex_dev, pcb)

    def step(self, state: CompactState) -> bool:
        """Compatibility shim: the schedule is fully enqueued by start()."""
        return False

    def prewarm(self, texels) -> None:
        """Compile every program of the compacted schedule for this chunk
        shape (there is exactly one slice width per shape, so one start()
        covers the full set)."""
        self.finish(self.start(texels))

    def finish(self, state: CompactState) -> np.ndarray:
        return _traced("fetch_result", lambda: np.asarray(state.pcb))

    def run(self, texels) -> np.ndarray:
        return self.finish(self.start(texels))

    def pipeline(self, chunks, depth: int = 2):
        """Keep up to `depth` chunks' schedules enqueued ahead of the
        blocking result fetches; yields results in order."""
        inflight = []
        for ch in chunks:
            inflight.append(self.start(ch))
            if len(inflight) > depth:
                yield self.finish(inflight.pop(0))
        for s in inflight:
            yield self.finish(s)


def _use_mono_jit() -> bool:
    env = os.environ.get("ASTC_MONO_JIT")
    if env is not None:
        return env not in ("0", "false", "no")
    return jax.default_backend() != "cpu"


def _use_compact() -> bool:
    env = os.environ.get("ASTC_COMPACT")
    if env is not None:
        return env not in ("0", "false", "no")
    return jax.default_backend() != "cpu"


def _compress_jit(dtables_key, enc_key, cfgs, texels):
    if _use_mono_jit():
        return compress_symbolic_batch_mono(dtables_key, enc_key, cfgs,
                                            texels)
    return compress_symbolic_batch(dtables_key, enc_key, cfgs, texels)


class EncKey:
    """Hashable wrapper carrying (EncoderTables, bsd) as a static jit arg."""

    __slots__ = ("tables", "bsd", "_id")

    def __init__(self, tables, bsd):
        self.tables = tables
        self.bsd = bsd
        self._id = id(tables)

    def __hash__(self):
        return self._id

    def __eq__(self, other):
        return isinstance(other, EncKey) and other._id == self._id


def compress_image(ctx, image, swizzle=(0, 1, 2, 3),
                   progress_callback=None, tracer=None):
    """Compress an image array to (N, 16) blocks, raster order.

    Reference flow: astcenc_compress_image (astcenc_entry.cpp:1113) +
    load_image_block (astcenc_image.cpp:162-343).
    """
    from .. import api as api_mod

    if not hasattr(ctx, "_enc_key"):
        # Shared per-BSD encoder key: contexts with the same config reuse
        # one EncKey object, so the jit cache hits across contexts.
        ctx._enc_key = api_mod._enc_key(ctx.bsd)
    cfgs = _CfgStatic(ctx.config)

    bx, by, bz = ctx.block_dims
    image = np.asarray(image)
    if image.ndim == 3:
        image = image[None]  # (Z, H, W, C)
    Z, H, W, C = image.shape

    if C < 4:
        pad = np.zeros(image.shape[:-1] + (4 - C,), image.dtype)
        fill = 255 if image.dtype == np.uint8 else 1.0
        if C == 3:
            pad[...] = fill
        image = np.concatenate([image, pad], axis=-1)

    image = _apply_load_swizzle(image, swizzle)

    profile = int(ctx.config.profile)
    if image.dtype == np.uint8:
        data = image.astype(np.float32) * (65535.0 / 255.0)
    elif profile >= 2:
        # HDR profiles store RGB (and alpha for full HDR) in LNS space
        # (reference: load_image_block, astcenc_image.cpp:192-219)
        from ..ops import softfloat as sf
        f = image.astype(np.float32)
        lns = np.asarray(sf.float_to_lns(jnp.asarray(f)))
        unorm = _encode_unorm_sanitized(f)
        data = lns.copy()
        if profile == 2:  # HDR RGB + LDR alpha
            data[..., 3] = unorm[..., 3]
    else:
        data = _encode_unorm_sanitized(image.astype(np.float32))

    nx = (W + bx - 1) // bx
    ny = (H + by - 1) // by
    nz = (Z + bz - 1) // bz

    # Alpha-scale RDO: blocks whose expanded footprint holds ~zero alpha are
    # replaced with constant transparent black before compression
    # (reference: the SAT preprocess of astcenc_compute_variance.cpp:48-505
    # feeding the zero-block substitution in astcenc_entry.cpp:974-1035).
    zero_blocks = None
    radius = int(getattr(ctx.config, "a_scale_radius", 0))
    if radius != 0 and bz == 1 and Z == 1:
        zero_blocks = _alpha_zero_blocks(data[0, :, :, 3], bx, by, radius,
                                         nx, ny)

    # Edge-clamp pad then reorder into (N, T, 4); the native host library
    # (native/astc_host.cpp) covers the hot LDR-2D-u8 case in one pass.
    blocks = None
    if image.dtype == np.uint8 and profile <= 1 and bz == 1 and Z == 1:
        blocks = native_host.blockify_2d_u8(
            np.ascontiguousarray(image[0]), bx, by)
    if blocks is None:
        px, py, pz = nx * bx, ny * by, nz * bz
        idx_x = np.minimum(np.arange(px), W - 1)
        idx_y = np.minimum(np.arange(py), H - 1)
        idx_z = np.minimum(np.arange(pz), Z - 1)
        padded = data[np.ix_(idx_z, idx_y, idx_x)]
        blocks = padded.reshape(nz, bz, ny, by, nx, bx, 4)
        blocks = blocks.transpose(0, 2, 4, 1, 3, 5, 6).reshape(
            nz * ny * nx, bz * by * bx, 4)

    # Pad the batch to a power-of-two bucket so jit caches compilations
    # across image sizes, and chunk very large batches to bound the
    # device working set (the trial pipeline holds several
    # (chunk, modes/candidates, ...) intermediates).
    if zero_blocks is not None:
        blocks = np.where(zero_blocks[:, None, None], 0.0, blocks)

    n = blocks.shape[0]
    chunk = int(os.environ.get("ASTC_CHUNK", "16384"))
    ctx._cancel_requested = False

    if tracer is None and _use_compact():
        return _compress_chunks_compact(ctx, cfgs, blocks, chunk,
                                        progress_callback)

    outs = []
    for lo in range(0, n, chunk):
        if getattr(ctx, "_cancel_requested", False):
            # Cooperative cancellation: unprocessed blocks become zeros
            outs.append(np.zeros((n - lo, 16), np.uint8))
            break
        part = blocks[lo:lo + chunk]
        m = part.shape[0]
        bucket = max(64, 1 << (m - 1).bit_length())
        if bucket != m:
            pad = np.broadcast_to(part[:1], (bucket - m,) + part.shape[1:])
            part = np.concatenate([part, pad], axis=0)
        if tracer is not None:
            # Trace capture path: block coords + unjitted split stages.
            bx_, by_, bz_ = ctx.block_dims
            tracer.base = lo
            tracer.real_n = m
            for bi in range(m):
                gi = lo + bi
                tracer.positions[gi] = (
                    (gi % nx) * bx_, ((gi // nx) % ny) * by_,
                    (gi // (nx * ny)) * bz_)
            pcb = compress_symbolic_batch(
                ctx._dtables_key, ctx._enc_key, cfgs, jnp.asarray(part),
                tracer=tracer)
        else:
            pcb = _compress_jit(ctx._dtables_key, ctx._enc_key, cfgs,
                                jnp.asarray(part))
        outs.append(np.asarray(pcb)[:m])
        if progress_callback is not None:
            progress_callback(min(100.0, 100.0 * (lo + m) / n))
    return np.concatenate(outs, axis=0)


def _compress_chunks_compact(ctx, cfgs, blocks, chunk, progress_callback):
    """Chunked compaction pipeline: stage1 of chunk i+1 overlaps the mask
    fetches + compacted tails of chunk i."""
    runner = CompactRunner(ctx._dtables_key, ctx._enc_key, cfgs)
    n = blocks.shape[0]
    depth = max(1, int(os.environ.get("ASTC_PIPELINE", "2")))

    parts = []
    for lo in range(0, n, chunk):
        if getattr(ctx, "_cancel_requested", False):
            break
        part = blocks[lo:lo + chunk]
        m = part.shape[0]
        bucket = max(64, 1 << (m - 1).bit_length())
        if bucket != m:
            pad = np.broadcast_to(part[:1], (bucket - m,) + part.shape[1:])
            part = np.concatenate([part, pad], axis=0)
        parts.append((m, part))

    outs = []
    done = 0
    for (m, _), pcb in zip(parts,
                           runner.pipeline((p for _, p in parts), depth)):
        outs.append(pcb[:m])
        done += m
        if progress_callback is not None:
            progress_callback(min(100.0, 100.0 * done / n))
    if done < n:  # cancelled before all chunks were submitted
        outs.append(np.zeros((n - done, 16), np.uint8))
    return np.concatenate(outs, axis=0)


def _encode_unorm_sanitized(f: np.ndarray) -> np.ndarray:
    """Unorm-encode unconstrained float input to [0, 65535].

    NaN maps to 0 and +/-Inf clamp to the range ends, matching the
    reference's encode_texel_unorm (astcenc_image.cpp:129-147: "clamp
    because data can come from an unconstrained float. This will replace
    NaNs with zero").
    """
    scaled = f * 65535.0
    # max(NaN, 0) -> 0 under np.fmax ordered-compare semantics
    return np.fmin(np.fmax(scaled, 0.0), 65535.0)


def _apply_load_swizzle(image, swizzle):
    if tuple(swizzle) == (0, 1, 2, 3):
        return image
    one = 255 if image.dtype == np.uint8 else 1.0
    chans = {
        0: image[..., 0], 1: image[..., 1], 2: image[..., 2],
        3: image[..., 3],
        4: np.zeros_like(image[..., 0]),
        5: np.full_like(image[..., 0], one),
    }
    return np.stack([chans[s] for s in swizzle], axis=-1)


def _alpha_zero_blocks(alpha, bx, by, radius, nx, ny):
    """(nblocks,) mask of blocks with ~zero alpha in the expanded footprint.

    Uses a summed-area table over the edge-clamped alpha plane, mirroring
    the reference's Brent-Kung SAT formulation (which is itself a parallel
    prefix sum; here jnp.cumsum on both axes).
    """
    a01 = jnp.asarray(alpha, jnp.float32) / 65535.0
    r = radius
    ap = jnp.pad(a01, ((r, r + 1), (r, r + 1)), mode="edge")
    sat = jnp.cumsum(jnp.cumsum(ap, axis=0), axis=1)
    sat = jnp.pad(sat, ((1, 0), (1, 0)))
    H, W = a01.shape
    k = 2 * r + 1

    ys = jnp.arange(H)
    xs = jnp.arange(W)
    y0 = ys[:, None]
    x0 = xs[None, :]
    # Window sum of the (2r+1)^2 neighborhood centered at each texel
    win = (sat[y0 + k, x0 + k] - sat[y0 + k, x0] - sat[y0, x0 + k]
           + sat[y0, x0])
    avg = win / float(k * k)

    xf = bx + 2 * (r - 1)
    yf = by + 2 * (r - 1)
    threshold = 0.9 / (255.0 * float(xf * yf))

    has_alpha = avg > threshold
    hp = jnp.pad(has_alpha, ((0, ny * by - H), (0, nx * bx - W)))
    per_block = hp.reshape(ny, by, nx, bx).any(axis=(1, 3)).reshape(-1)
    return np.asarray(~per_block)
