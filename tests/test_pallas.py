"""Pallas kernel validation vs the XLA formulations.

Runs every kernel in interpreter mode (ASTC_PALLAS_INTERPRET=1 via
monkeypatch) on randomized inputs and asserts equivalence with the XLA
path: bit-exact where the arithmetic is exact, tight-tolerance/agreement
where the kernel's in-VMEM math legitimately deviates (HIGHEST-precision
dots vs XLA reductions, polynomial atan2 vs jnp.arctan2, sincos rotation
recurrence vs table lookups — see ops/msearch_pallas.py docstring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from astcenc_tpu import api
from astcenc_tpu.codec import compress as compress_mod
from astcenc_tpu.codec import trial
from astcenc_tpu.config import Profile, Quality
from astcenc_tpu.ops import angular as ang
from astcenc_tpu.ops import formats as fmts
from astcenc_tpu.ops import gather_pallas
from astcenc_tpu.ops import ideal as ideal_ops
from astcenc_tpu.ops import lut as lut_ops
from astcenc_tpu.ops import msearch_pallas as ms_ops


@pytest.fixture(autouse=True)
def _interp(monkeypatch):
    monkeypatch.setenv("ASTC_PALLAS_INTERPRET", "1")


def _ctx(bx=6, by=6, quality=Quality.MEDIUM):
    cfg = api.config_init(Profile.LDR, bx, by, 1, quality, 0)
    return api.context_alloc(cfg)


def _msearch_inputs(rng, N, T, pc=1):
    wei = jnp.asarray(rng.rand(N, T).astype(np.float32))
    wes = jnp.asarray(rng.rand(N, T).astype(np.float32) * 1e8)
    mcut = jnp.asarray(rng.rand(N).astype(np.float32) * 2.0)
    maxwq = jnp.asarray(rng.randint(5, 12, (N,)).astype(np.int32))
    S = ms_ops._IC_S[pc]
    comb_err = jnp.asarray(
        rng.rand(N, 21, S).astype(np.float32) * 1e9)
    comb_fmt = jnp.asarray(
        rng.randint(0, 16, (N, 21, S, pc)).astype(np.int32))
    return wei, wes, mcut, maxwq, comb_err, comb_fmt


def _xla_front(et, wei, wes, maxwq, maxprec_np):
    """XLA stages 1+2: decimated ideal weights + angular ranges."""
    N = wei.shape[0]
    D, T, W = et.dec_f32.shape
    dec_ideal = ideal_ops.ideal_weights_for_decimation(
        wei, wes, jnp.asarray(et.dec_int), jnp.asarray(et.dec_sq),
        jnp.asarray(et.dec_f32))
    wvalid_np = np.arange(W)[None, :] < et.dec_wcount[:, None]
    maxprec = jnp.asarray(maxprec_np)[None, :]
    max_precision = jnp.minimum(
        jnp.minimum(maxprec, ang.TUNE_MAX_ANGULAR_QUANT), maxwq[:, None])
    low_v, high_v = ang.angular_endpoints_for_quant_levels(
        dec_ideal, jnp.asarray(wvalid_np), max_precision)
    return dec_ideal, low_v, high_v


def _xla_msearch(et, pc, wei, wes, mcut, maxwq, comb_err, comb_fmt, C):
    """The XLA formulation of the full trial front-end (trial1_records
    else branch), with the kernel's exact infill factorization."""
    N = wei.shape[0]
    D, T, W = et.dec_f32.shape
    quant_m = et.m1_quant
    dm_m = et.m1_dm
    M1 = quant_m.shape[0]
    bitcount_np = trial._FREE_BITS_1PLANE[pc] - et.m1_weight_bits
    mode_active_np = bitcount_np > 0

    dec_ideal, low_v, high_v = _xla_front(et, wei, wes, maxwq,
                                          et.dm_maxprec1)

    ang_ok = quant_m <= ang.TUNE_MAX_ANGULAR_QUANT
    ql_idx = np.where(ang_ok, quant_m, 0)
    oh_dq = np.zeros((M1, D * 8), np.float32)
    oh_dq[np.arange(M1), dm_m * 8 + ql_idx] = 1.0
    low_m = jnp.where(jnp.asarray(ang_ok),
                      jnp.einsum("md,nd->nm", jnp.asarray(oh_dq),
                                 low_v.reshape(N, D * 8)), 0.0)
    high_m = jnp.where(jnp.asarray(ang_ok),
                       jnp.einsum("md,nd->nm", jnp.asarray(oh_dq),
                                  high_v.reshape(N, D * 8)), 1.0)
    high_m = jnp.where(high_m > 1.02 * mcut[:, None], 1.0, high_m)

    oh_md = np.zeros((M1, D), np.float32)
    oh_md[np.arange(M1), dm_m] = 1.0
    di_mode = jnp.einsum("md,ndw->nmw", jnp.asarray(oh_md), dec_ideal)
    uqf, uq = ideal_ops.quantize_weights_for_modes(
        di_mode, low_m, high_m, jnp.asarray(et.weight_quant_unquant),
        jnp.asarray(trial._QUANT_LEVELS_M1), jnp.asarray(quant_m))

    # Kernel-style exact infill: rs64 * (sf @ uq) + low
    degen = high_m <= low_m
    low_fix = jnp.where(degen, 0.0, low_m)
    high_fix = jnp.where(degen, 1.0, high_m)
    rs64 = (high_fix - low_fix) / 64.0
    sf_by_mode = jnp.asarray(et.dec_f32[dm_m])       # (M, T, W)
    g = jnp.einsum("mtw,nmw->nmt", sf_by_mode, uq.astype(jnp.float32))
    infill = g * rs64[..., None] + low_fix[..., None]
    d = infill - wei[:, None, :]
    qwt_err = jnp.sum(d * d * wes[:, None, :], axis=-1)

    mode_ok = (jnp.asarray(mode_active_np)[None, :]
               & (jnp.asarray(quant_m)[None, :] <= maxwq[:, None]))
    qwt_err = jnp.where(mode_ok, qwt_err, jnp.float32(1e38))

    mod_bits = 0 if pc == 1 else {2: 2, 3: 5, 4: 8}[pc]
    bb = fmts.best_for_bitcount(
        comb_err, comb_fmt if pc > 1 else comb_fmt[..., 0],
        et.quant_mode_table, bitcount_np, pc, mod_bits)
    total_err = jnp.where(qwt_err >= 1e37, jnp.float32(1e30),
                          bb["error"] + qwt_err)
    cand_modes, cand_valid = fmts.select_candidates(total_err, C)

    cand_c = jnp.clip(cand_modes, 0, M1 - 1)
    ohc = lut_ops.onehot(cand_c, M1)

    def sel(v):
        return jnp.einsum("ncm,m->nc", ohc,
                          jnp.asarray(v).astype(jnp.float32)
                          ).astype(jnp.int32)

    out = {
        "mode": sel(et.m1_mode_index),
        "dm": sel(dm_m),
        "wq": sel(quant_m),
        "valid": cand_valid,
        "cq": jnp.clip(jnp.einsum("ncm,nm->nc", ohc,
                                  bb["quant"].astype(jnp.float32)
                                  ).astype(jnp.int32), 4, 20),
        "cqm": jnp.clip(jnp.einsum("ncm,nm->nc", ohc,
                                   bb["quant_mod"].astype(jnp.float32)
                                   ).astype(jnp.int32), 0, 20),
        "fmt": jnp.einsum("ncm,nmp->ncp", ohc,
                          bb["formats"].astype(jnp.float32)
                          ).astype(jnp.int32),
        "uq": jnp.einsum("ncm,nmw->ncw", ohc, uq.astype(jnp.float32)
                         ).astype(jnp.int32),
        "err": jnp.einsum("ncm,nm->nc", ohc, total_err),
    }
    return out


def _check_agreement(got, want, N, C):
    """Candidate-set agreement with tolerance for the documented kernel
    deviations (atan2/sincos ulps flip angular rounding on rare ties)."""
    same = np.asarray(got["mode"]) == np.asarray(want["mode"])
    frac = same.mean()
    assert frac > 0.96, f"candidate agreement {frac}"
    ge = np.asarray(got["err"])
    we = np.asarray(want["err"])
    rel = np.abs(ge[same] - we[same]) / np.maximum(np.abs(we[same]), 1.0)
    assert np.median(rel) < 1e-5 and np.percentile(rel, 95) < 1e-3, (
        np.median(rel), np.percentile(rel, 95))
    for k in ("dm", "wq", "valid"):
        np.testing.assert_array_equal(np.asarray(got[k])[same],
                                      np.asarray(want[k])[same], err_msg=k)
    for k in ("cq", "cqm"):
        agree = (np.asarray(got[k])[same]
                 == np.asarray(want[k])[same]).mean()
        assert agree > 0.99, (k, agree)
    fa = (np.asarray(got["fmt"])[same]
          == np.asarray(want["fmt"])[same]).mean()
    assert fa > 0.99, fa
    ua = (np.asarray(got["uq"])[same]
          == np.asarray(want["uq"])[same]).mean()
    assert ua > 0.995, ua
    return same


@pytest.mark.parametrize("pc", [1, 2])
def test_msearch_kernel_matches_xla(pc):
    ctx = _ctx()
    et = trial.build_encoder_tables(ctx.bsd)
    D, T, W = et.dec_f32.shape
    N, C = 64, 3
    rng = np.random.RandomState(3 + pc)
    wei, wes, mcut, maxwq, comb_err, comb_fmt = _msearch_inputs(
        rng, N, T, pc)

    mmeta = ms_ops.make_mode_meta(
        et.m1_quant, et.m1_dm, et.m1_weight_bits, et.m1_mode_index,
        trial._FREE_BITS_1PLANE[pc], et.weight_quant_unquant,
        et.quant_mode_table, 0 if pc == 1 else {2: 2, 3: 5, 4: 8}[pc],
        pc, ang.TUNE_MAX_ANGULAR_QUANT)
    tabs = ms_ops.MsTables(et.dec_int, et.dec_f32, et.dec_wcount,
                           et.dm_maxprec1)
    got = ms_ops.mode_search(tabs, wei, wes, mcut, maxwq, comb_err,
                             comb_fmt, mmeta, C, pc)
    want = _xla_msearch(et, pc, wei, wes, mcut, maxwq, comb_err,
                        comb_fmt, C)
    _check_agreement(got, want, N, C)


def test_msearch_kernel_two_plane():
    """two=True layout: plane-2 weights ride the upper input rows."""
    ctx = _ctx()
    et = trial.build_encoder_tables(ctx.bsd)
    D, T, W = et.dec_f32.shape
    N, C = 64, 3
    rng = np.random.RandomState(7)
    we1, ws1, mc1, maxwq, comb_err, comb_fmt = _msearch_inputs(
        rng, N, T, 1)
    we2 = jnp.asarray(rng.rand(N, T).astype(np.float32))
    ws2 = jnp.asarray(rng.rand(N, T).astype(np.float32) * 1e8)
    mc2 = jnp.asarray(rng.rand(N).astype(np.float32) * 2.0)

    quant_m, dm_m = et.m2_quant, et.m2_dm
    mmeta = ms_ops.make_mode_meta(
        quant_m, dm_m, et.m2_weight_bits, et.m2_mode_index, 109,
        et.weight_quant_unquant, et.quant_mode_table, 0, 1,
        ang.TUNE_MAX_ANGULAR_QUANT)
    tabs = ms_ops.MsTables(et.dec_int, et.dec_f32, et.dec_wcount,
                           et.dm_maxprec2)
    got = ms_ops.mode_search(tabs, we1, ws1, mc1, maxwq, comb_err,
                             comb_fmt, mmeta, C, 1,
                             wei2=we2, wes2=ws2, mcut2=mc2)

    # XLA reference: per-plane front-end + quantize + summed error.
    M2 = quant_m.shape[0]
    bitcount_np = 109 - et.m2_weight_bits
    ang_ok = quant_m <= ang.TUNE_MAX_ANGULAR_QUANT
    ql_idx = np.where(ang_ok, quant_m, 0)
    oh_dq = np.zeros((M2, D * 8), np.float32)
    oh_dq[np.arange(M2), dm_m * 8 + ql_idx] = 1.0
    oh_md = np.zeros((M2, D), np.float32)
    oh_md[np.arange(M2), dm_m] = 1.0

    def plane_qwt(wei, wes, mcut):
        di, lo, hi = _xla_front(et, wei, wes, maxwq, et.dm_maxprec2)
        lom = jnp.where(jnp.asarray(ang_ok),
                        jnp.einsum("md,nd->nm", jnp.asarray(oh_dq),
                                   lo.reshape(N, D * 8)), 0.0)
        him = jnp.where(jnp.asarray(ang_ok),
                        jnp.einsum("md,nd->nm", jnp.asarray(oh_dq),
                                   hi.reshape(N, D * 8)), 1.0)
        him = jnp.where(him > 1.02 * mcut[:, None], 1.0, him)
        dim = jnp.einsum("md,ndw->nmw", jnp.asarray(oh_md), di)
        _, uq = ideal_ops.quantize_weights_for_modes(
            dim, lom, him, jnp.asarray(et.weight_quant_unquant),
            jnp.asarray(trial._QUANT_LEVELS_M1), jnp.asarray(quant_m))
        degen = him <= lom
        lof = jnp.where(degen, 0.0, lom)
        hif = jnp.where(degen, 1.0, him)
        rs64 = (hif - lof) / 64.0
        sf = jnp.asarray(et.dec_f32[dm_m])
        g = jnp.einsum("mtw,nmw->nmt", sf, uq.astype(jnp.float32))
        infill = g * rs64[..., None] + lof[..., None]
        d = infill - wei[:, None, :]
        return uq, jnp.sum(d * d * wes[:, None, :], axis=-1)

    uq1, q1 = plane_qwt(we1, ws1, mc1)
    uq2, q2 = plane_qwt(we2, ws2, mc2)
    qwt = q1 + q2
    mode_ok = (jnp.asarray(bitcount_np > 0)[None, :]
               & (jnp.asarray(quant_m)[None, :] <= maxwq[:, None]))
    qwt = jnp.where(mode_ok, qwt, jnp.float32(1e38))
    bb = fmts.best_for_bitcount(comb_err, comb_fmt[..., 0],
                                et.quant_mode_table, bitcount_np, 1, 0)
    total = jnp.where(qwt >= 1e37, jnp.float32(1e30), bb["error"] + qwt)
    cand_modes, _ = fmts.select_candidates(total, C)
    cand_c = np.clip(np.asarray(cand_modes), 0, M2 - 1)

    gm = np.asarray(got["mode"])
    wm = np.asarray(et.m2_mode_index)[cand_c]
    same = gm == wm
    assert same.mean() > 0.96, f"candidate agreement {same.mean()}"
    gerr = np.asarray(got["err"])
    werr = np.take_along_axis(np.asarray(total), cand_c, axis=1)
    rel = np.abs(gerr[same] - werr[same]) / np.maximum(werr[same], 1.0)
    assert np.median(rel) < 1e-5 and np.percentile(rel, 95) < 1e-3
    guq1 = np.asarray(got["uq"])
    guq2 = np.asarray(got["uq2"])
    wuq1 = np.asarray(uq1)[np.arange(N)[:, None], cand_c]
    wuq2 = np.asarray(uq2)[np.arange(N)[:, None], cand_c]
    assert (guq1[same] == wuq1[same]).mean() > 0.995
    assert (guq2[same] == wuq2[same]).mean() > 0.995


@pytest.mark.parametrize("bx,by", [(4, 4), (12, 12)])
def test_trial1_records_kernel_vs_xla(bx, by):
    """End-to-end trial1_records: interpret-mode kernels vs pure XLA.

    12x12 covers the T=144 > 128 operand layout (tex_stride/meta_rows,
    see ops/refine_pallas.py) that 2D kernel coverage previously lacked
    (the reference's biggest 2D footprint, astcenc_block_sizes.cpp)."""
    ctx = _ctx(bx, by, Quality.FASTEST)
    et = trial.build_encoder_tables(ctx.bsd)
    cfgs = compress_mod._CfgStatic(ctx.config)
    N = 32
    T = ctx.bsd.texel_count
    rng = np.random.RandomState(11)
    texels = jnp.asarray(
        np.floor(rng.rand(N, T, 4) * 255.0).astype(np.float32) * 257.0)
    st = compress_mod.make_block_state(texels, cfgs.channel_weights, 1)
    pot = jnp.zeros((N, T), jnp.int32)
    counts = jnp.zeros((N, 4), jnp.int32).at[:, 0].set(T)
    ql = jnp.full((N,), 11, jnp.int32)
    ext = jnp.ones((N,), bool)

    recs_k = trial.trial1_records(st, et, cfgs, 1, False, pot, counts, 1,
                                  False, ql, ext)

    import astcenc_tpu.ops.gather_pallas as gp
    orig = gp._use_pallas
    gp._use_pallas = lambda: False
    try:
        recs_x = trial.trial1_records(st, et, cfgs, 1, False, pot, counts,
                                      1, False, ql, ext)
    finally:
        gp._use_pallas = orig

    err_k = np.asarray(recs_k["err"])
    err_x = np.asarray(recs_x["err"])
    live = err_x < 1e29
    np.testing.assert_allclose(err_k[live], err_x[live], rtol=3e-4)
    # Winner (first-minimum) must agree for nearly all blocks
    wk = err_k.argmin(axis=1)
    wx = err_x.argmin(axis=1)
    assert (wk == wx).mean() > 0.9
    same = wk == wx
    for k in ("fmt", "vals", "mode", "useq"):
        a = np.asarray(recs_k[k])[same]
        b = np.asarray(recs_x[k])[same]
        sel_a = np.take_along_axis(
            a, wk[same].reshape((-1, 1) + (1,) * (a.ndim - 2)), axis=1)
        sel_b = np.take_along_axis(
            b, wk[same].reshape((-1, 1) + (1,) * (b.ndim - 2)), axis=1)
        agree = (sel_a == sel_b).mean()
        assert agree > 0.97, (k, agree)


def test_trial1_records_kernel_vs_xla_rgbm():
    """RGBM trial metric (M-demultiplied SSE + M==0 rejection) inside the
    fused kernels vs the XLA formulation (reference:
    astcenc_decompress_symbolic.cpp:366-400)."""
    from astcenc_tpu.config import Flags
    cfg = api.config_init(Profile.LDR, 4, 4, 1, Quality.FASTEST,
                          Flags.MAP_RGBM)
    ctx = api.context_alloc(cfg)
    et = trial.build_encoder_tables(ctx.bsd)
    cfgs = compress_mod._CfgStatic(ctx.config)
    assert cfgs.rgbm_scale > 0.0
    N = 32
    T = ctx.bsd.texel_count
    rng = np.random.RandomState(17)
    tex_np = np.floor(rng.rand(N, T, 4) * 255.0).astype(np.float32) * 257.0
    # Keep M well away from zero for most blocks, near zero for a few so
    # the rejection path is exercised.
    tex_np[:, :, 3] = np.maximum(tex_np[:, :, 3], 2 * 257.0)
    tex_np[:4, :, 3] = 257.0
    texels = jnp.asarray(tex_np)
    st = compress_mod.make_block_state(texels, cfgs.channel_weights, 1)
    pot = jnp.zeros((N, T), jnp.int32)
    counts = jnp.zeros((N, 4), jnp.int32).at[:, 0].set(T)
    ql = jnp.full((N,), 11, jnp.int32)
    ext = jnp.ones((N,), bool)

    recs_k = trial.trial1_records(st, et, cfgs, 1, False, pot, counts, 1,
                                  False, ql, ext)
    import astcenc_tpu.ops.gather_pallas as gp
    orig = gp._use_pallas
    gp._use_pallas = lambda: False
    try:
        recs_x = trial.trial1_records(st, et, cfgs, 1, False, pot, counts,
                                      1, False, ql, ext)
    finally:
        gp._use_pallas = orig

    err_k = np.asarray(recs_k["err"])
    err_x = np.asarray(recs_x["err"])
    live = err_x < 1e29
    np.testing.assert_allclose(err_k[live], err_x[live], rtol=3e-4)
    # The M==0 rejection must fire identically.
    np.testing.assert_array_equal(err_k >= 1e29, err_x >= 1e29)
    wk = err_k.argmin(axis=1)
    wx = err_x.argmin(axis=1)
    assert (wk == wx).mean() > 0.9


def test_alpha_scale_ones_bit_identical():
    """has_asr kernels fed a unit alpha-scale row must be bit-identical to
    the static-cw kernels (the multiply-by-1.0f is exact), across the full
    trial front+refine path."""
    ctx = _ctx(4, 4, Quality.FASTEST)
    et = trial.build_encoder_tables(ctx.bsd)
    cfgs = compress_mod._CfgStatic(ctx.config)
    N = 32
    T = ctx.bsd.texel_count
    rng = np.random.RandomState(13)
    tex_np = np.floor(rng.rand(N, T, 4) * 255.0).astype(np.float32) * 257.0
    texels = jnp.asarray(tex_np)
    pot = jnp.zeros((N, T), jnp.int32)
    counts = jnp.zeros((N, 4), jnp.int32).at[:, 0].set(T)
    ql = jnp.full((N,), 11, jnp.int32)
    ext = jnp.ones((N,), bool)

    st = compress_mod.make_block_state(texels, cfgs.channel_weights, 1)
    recs_base = trial.trial1_records(st, et, cfgs, 1, False, pot, counts,
                                     1, False, ql, ext)

    # Same texels with a forced unit per-block scale: every kernel takes
    # the has_asr branch but multiplies by exactly 1.0f.
    st2 = compress_mod.make_block_state(texels, cfgs.channel_weights, 1,
                                        alpha_weight=True)
    st2["cw_scale"] = jnp.ones((N,), jnp.float32)
    recs_ones = trial.trial1_records(st2, et, cfgs, 1, False, pot, counts,
                                     1, False, ql, ext)

    for k in recs_base:
        a = np.asarray(recs_base[k])
        b = np.asarray(recs_ones[k])
        if k == "err":
            # The x1.0 row blocks/permits XLA mul+add fusion, so error
            # sums may differ by 1 ulp; every selection payload must
            # still be bit-identical.
            np.testing.assert_allclose(a, b, rtol=2e-7)
        else:
            assert np.array_equal(a, b), k
