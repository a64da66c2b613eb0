#!/usr/bin/env python3
"""Stage-level timing of the 6x6 -medium trial pipeline on the live backend.

Times the full mono pipeline and then each major sub-stage of
trial1_records in isolation (jitted separately), at the bench chunk size.
Used to target kernelization work; not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("ASTC_JAX_CACHE", "/tmp/jax_cache"))


def timeit(fn, *args, reps=5):
    # Reduce outputs to one scalar on-device so the timed loop fetches a
    # few bytes (host-fetch of large outputs dominates on the tunneled
    # backend and was previously mis-attributed to compute).
    @jax.jit
    def red(*a):
        out = jax.tree.leaves(fn(*a))
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)

    np.asarray(red(*args))  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        s = red(*args)
    np.asarray(s)
    return (time.perf_counter() - t0) / reps


def main():
    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.codec import compress as compress_mod
    from astcenc_tpu.codec import trial, partition_search
    from astcenc_tpu.ops import ideal as ideal_ops
    from astcenc_tpu.ops import angular as ang
    from astcenc_tpu.ops import formats as fmts

    N = int(os.environ.get("ASTC_PROF_N", "8192"))
    block = (6, 6)
    cfg = api.config_init(Profile.LDR, block[0], block[1], 1,
                          Quality.MEDIUM, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = compress_mod.EncKey(
        trial.build_encoder_tables(ctx.bsd), ctx.bsd)
    cfgs = compress_mod._CfgStatic(ctx.config)
    et = ctx._enc_key.tables
    T = ctx.bsd.texel_count

    rng = np.random.RandomState(0)
    texels = jnp.asarray(
        np.floor(rng.rand(N, T, 4).astype(np.float32) * 255.0) * 257.0)

    print(f"backend={jax.default_backend()} N={N} T={T} "
          f"M1={et.m1_quant.shape[0]} M2={et.m2_quant.shape[0]} "
          f"D={et.dec_int.shape[0]} W={et.dec_int.shape[2]}")

    # Full pipeline
    dt = timeit(lambda tx: compress_mod.compress_symbolic_batch_mono(
        ctx._dtables_key, ctx._enc_key, cfgs, tx), texels)
    print(f"full mono pipeline: {dt*1000:8.1f} ms   "
          f"{N*T/dt/1e6:7.2f} MT/s")

    st = compress_mod.make_block_state(texels, cfgs.channel_weights, 1)
    pot1 = jnp.zeros((N, T), jnp.int32)
    counts1 = jnp.zeros((N, 4), jnp.int32).at[:, 0].set(T)
    ql = jnp.full((N,), 11, jnp.int32)
    ext = jnp.ones((N,), bool)

    # One full 1-plane records pass
    @jax.jit
    def recs1(st_, ql_, ext_):
        return trial.trial1_records(st_, et, cfgs, 1, False, pot1, counts1,
                                    1, False, ql_, ext_)
    dt = timeit(recs1, st, ql, ext)
    print(f"trial1_records (pc=1): {dt*1000:8.1f} ms")

    # 2-plane records (folded x4)
    ext4 = jnp.ones((N, 4), bool)

    @jax.jit
    def recs2(st_, ql_, ext_):
        return trial.trial2_records(st_, et, cfgs, 1, False, ql_, ext_,
                                    fold_all=True)
    dt = timeit(recs2, st, ql, ext4)
    print(f"trial2_records (fold4): {dt*1000:8.1f} ms")

    # Partition search
    @jax.jit
    def psearch(st_):
        return partition_search.find_best_partition_candidates(
            st_, ctx.bsd, cfgs.channel_weights, 2, 34, 2)
    dt = timeit(psearch, st)
    print(f"partition search pc=2: {dt*1000:8.1f} ms")

    # ---- sub-stages of trial1_records ----
    pmask = ideal_ops.partition_onehot(pot1)

    @jax.jit
    def stage_ideal(st_):
        ei4 = ideal_ops.ideal_colors_and_weights(
            st_["texels"], pmask, counts1, st_["data_min"], st_["data_max"],
            cfgs.channel_weights, (1, 1, 1, 1))
        return ei4
    dt = timeit(stage_ideal, st)
    print(f"  ideal colors+weights: {dt*1000:8.1f} ms")

    ei = stage_ideal(st)

    @jax.jit
    def stage_dec(w, es):
        return ideal_ops.ideal_weights_for_decimation(
            w, es, jnp.asarray(et.dec_int), jnp.asarray(et.dec_sq),
            jnp.asarray(et.dec_f32))
    dt = timeit(stage_dec, ei["weights"], ei["weight_error_scale"])
    print(f"  ideal_weights_for_decimation: {dt*1000:8.1f} ms")

    dec_ideal = stage_dec(ei["weights"], ei["weight_error_scale"])
    D = et.dec_int.shape[0]
    W = et.dec_int.shape[2]
    wvalid_np = np.arange(W)[None, :] < et.dec_wcount[:, None]
    maxprec = jnp.minimum(jnp.minimum(
        jnp.asarray(et.dm_maxprec1)[None, :], ang.TUNE_MAX_ANGULAR_QUANT),
        11)
    maxprec = jnp.broadcast_to(maxprec, (N, D))

    @jax.jit
    def stage_ang(di):
        return ang.angular_endpoints_for_quant_levels(
            di, jnp.asarray(wvalid_np), maxprec)
    dt = timeit(stage_ang, dec_ideal)
    print(f"  angular endpoints: {dt*1000:8.1f} ms")

    low_v, high_v = stage_ang(dec_ideal)
    M1 = et.m1_quant.shape[0]
    quant_m = et.m1_quant
    dm_m = et.m1_dm
    ang_ok = quant_m <= ang.TUNE_MAX_ANGULAR_QUANT
    ql_idx = np.where(ang_ok, quant_m, 0)
    oh_dq = np.zeros((M1, D * 8), np.float32)
    oh_dq[np.arange(M1), dm_m * 8 + ql_idx] = 1.0
    oh_md = np.zeros((M1, D), np.float32)
    oh_md[np.arange(M1), dm_m] = 1.0

    @jax.jit
    def stage_permode(di, low_v_, high_v_, w, es):
        low_m = jnp.einsum("md,nd->nm", jnp.asarray(oh_dq),
                           low_v_.reshape(N, D * 8))
        high_m = jnp.einsum("md,nd->nm", jnp.asarray(oh_dq),
                            high_v_.reshape(N, D * 8))
        di_mode = jnp.einsum("md,ndw->nmw", jnp.asarray(oh_md), di)
        uqf, uq = ideal_ops.quantize_weights_for_modes(
            di_mode, low_m, high_m, jnp.asarray(et.weight_quant_unquant),
            jnp.asarray(trial._QUANT_LEVELS_M1), jnp.asarray(quant_m))
        decf32_by_mode = jnp.asarray(et.dec_f32[dm_m])
        err = ideal_ops.weight_set_error(uqf, w, es, decf32_by_mode)
        return uq, err
    dt = timeit(stage_permode, dec_ideal, low_v, high_v, ei["weights"],
                ei["weight_error_scale"])
    print(f"  per-mode quantize+error: {dt*1000:8.1f} ms")

    @jax.jit
    def stage_formats(st_, ei0, ei1):
        eci = fmts.encoding_choice_errors(
            st_["texels"], pmask, counts1, ei0, ei1, cfgs.channel_weights,
            st_["is_luminance"], 65535.0)
        be, fm = fmts.color_error_tables_ldr(eci, ei0, ei1, counts1,
                                             cfgs.channel_weights)
        bitcount_np = trial._FREE_BITS_1PLANE[1] - et.m1_weight_bits
        bb = fmts.best_for_bitcount(be[:, 0], fm[:, 0], et.quant_mode_table,
                                    bitcount_np, 1, 0)
        return bb
    dt = timeit(stage_formats, st, ei["ep0"], ei["ep1"])
    print(f"  format selection: {dt*1000:8.1f} ms")


if __name__ == "__main__":
    main()


def profile_refine():
    """Time the fused refine kernel standalone at trial1 NC size."""
    from astcenc_tpu import api
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.codec import compress as compress_mod
    from astcenc_tpu.codec import trial
    from astcenc_tpu.ops import refine_pallas as refine_ops

    N = int(os.environ.get("ASTC_PROF_N", "8192"))
    C = 3
    R = 3
    NC = N * C
    cfg = api.config_init(Profile.LDR, 6, 6, 1, Quality.MEDIUM, 0)
    ctx = api.context_alloc(cfg)
    et = trial.build_encoder_tables(ctx.bsd)
    T = ctx.bsd.texel_count
    W = et.dec_int.shape[2]
    D = et.dec_int.shape[0]
    wvalid_np = np.arange(W)[None, :] < et.dec_wcount[:, None]
    rtabs = refine_ops.RefineTables(et.dec_int, et.dec_f32, et.dm_color,
                                    wvalid_np, et.weight_prev_next)
    rng = np.random.RandomState(0)
    tex = jnp.asarray(np.floor(
        rng.rand(NC, T, 4).astype(np.float32) * 255.0) * 257.0)
    texk = refine_ops.pack_tex(tex)
    wgrid0 = jnp.asarray(rng.randint(0, 65, (NC, W), np.int32))
    dm_f = jnp.asarray(rng.randint(0, D, (NC,), np.int32))
    wq_f = jnp.asarray(rng.randint(0, 12, (NC,), np.int32))
    valid_f = jnp.ones((NC,), bool)
    cq_f = jnp.asarray(rng.randint(4, 21, (NC,), np.int32))
    cqm_f = jnp.asarray(rng.randint(4, 21, (NC,), np.int32))
    fmt_req_f = jnp.asarray(rng.randint(0, 16, (NC, 1), np.int32))
    pot_f = jnp.zeros((NC, T), jnp.int32)
    meta = refine_ops.pack_meta_full(wgrid0, dm_f, wq_f, valid_f,
                                     cq_f, cqm_f, fmt_req_f, pot_f, T)
    ep = np.abs(rng.rand(NC, 4, 4).astype(np.float32)) * 65535.0
    fmeta = jnp.concatenate([jnp.asarray(ep.reshape(NC, 16)),
                             jnp.asarray(ep.reshape(NC, 16))], axis=1)

    @jax.jit
    def run(meta_, fmeta_, texk_):
        return refine_ops.trial1_refine_full(
            rtabs, meta_, fmeta_, texk_, et.ncolors, False,
            (1.0, 1.0, 1.0, 1.0), R, 1, 1)
    dt = timeit(run, meta, fmeta, texk)
    print(f"refine_full pc=1 NC={NC}: {dt*1000:8.1f} ms")


if os.environ.get("ASTC_PROF_REFINE"):
    profile_refine()
