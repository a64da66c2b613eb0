"""Fused mode-search kernel (Pallas/Mosaic TPU).

The per-mode stage of a trial — quantize the ideal decimated weights into
each block mode's angular [low, high] range, score the quantized set
against the ideal per-texel weights, combine with the per-mode best
endpoint-format error, and keep the top-C candidate modes — runs as one
kernel over a block tile.

Why: in the XLA formulation this stage materializes (N, M, W) quantized
grids, (N, M, T) infills and several (N, M, ~21) format tables in HBM
(hundreds of MB per trial pass at production batch sizes; the profiled
dominant cost of the encoder, see astcenc_compress_symbolic.cpp:433-604 +
astcenc_weight_align.cpp for the loops this replaces). Every one of those
tensors is a pure function of a per-block (D, W) ideal-weight tile and a
handful of static per-mode scalars, so the whole stage fits in VMEM.

Layout: feature-major with the block batch on the 128-lane axis, matching
ops/refine_pallas.py. Per-mode metadata (decimation mode, quant level,
unquant LUT, bit budget, quant_mode_table rows) is static at trace time —
the mode loop is unrolled with constant-folded table lookups, the TPU
analog of the reference's per-BSD packed block-mode array
(astcenc_block_sizes.cpp:822-1012).

Selection: an insertion sort over the unrolled mode loop keeps the C best
(total error, payload) per block, with strict-< updates so earlier modes
win ties — reproducing the reference's repeated-argmin candidate order
(astcenc_pick_best_endpoint_format.cpp:1286-1356).

Outputs (per candidate c, int32 rows at base c*stride where
stride = 16 + Wp [+ Wp for 2-plane], Wp = W rounded up to 8):
  [0 mode_index | 1 dm | 2 wq | 3 valid | 4 cq | 5 cq_mod |
   8:8+pc fmt_req | 16:16+W uq grid | 16+Wp:16+Wp+W uq2 grid]
(+ (C, BT) f32 total errors)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_pallas import _interpret

_BIG = 1e30               # ERROR_CALC_DEFAULT
QUANT_6 = 4
FMT_LUMINANCE = 0

_QUANT_LEVELS = (2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32)
_IC_S = {1: 4, 2: 7, 3: 10, 4: 13}


def make_mode_meta(quant_m, dm_m, weight_bits, mode_index, free_bits: int,
                   quant_unquant, quant_mode_table, mod_bits: int, pc: int,
                   max_angular_quant: int):
    """Static per-mode metadata tuple for the kernel.

    Args:
      quant_m/dm_m/weight_bits/mode_index: (M,) numpy per-mode tables
        (dm already remapped to the pass's decimation subset).
      free_bits: static bits available before weights (113-ish minus
        partition overhead; reference _FREE_BITS tables).
      quant_unquant: (12, 32) value-rank -> unquant LUT.
      quant_mode_table: (10, 128) numpy.
      mod_bits: extra bits for the matched-format trick (0/2/5/8).
      pc: partition count (1..4) — sets the integer-count range.
      max_angular_quant: TUNE_MAX_ANGULAR_QUANT.

    Returns a hashable tuple of per-mode records:
      (mode_index, dm, wq, levels, unquant tuple, ang_ok,
       ic_chain tuple of (ql, ql_clipped, ql_mod, slot),
       nv_ql, nv_ql_mod)  -- ic entries only for valid (ql >= QUANT_6).
    """
    M = len(quant_m)
    if pc == 1:
        ic_range = range(1, 5)
        ic_base = 1
    else:
        ic_range = range(pc, min(4 * pc, 9) + 1)
        ic_base = pc
    recs = []
    for m in range(M):
        bits = int(free_bits - weight_bits[m])
        if bits <= 0:
            continue                      # mode can never be encoded
        q = int(quant_m[m])
        levels = _QUANT_LEVELS[q]
        unq = tuple(int(v) for v in quant_unquant[q][:levels])
        ang_ok = q <= max_angular_quant
        bc = min(max(bits, 0), 127)
        chain = []
        for ic in ic_range:
            ql = int(quant_mode_table[ic, bc])
            if ql < QUANT_6:
                continue
            ql_mod = int(quant_mode_table[ic, min(bc + mod_bits, 127)])
            chain.append((ql, min(max(ql, 0), 20), ql_mod, ic - ic_base))
        nv_ql = int(quant_mode_table[1 if pc == 1 else 0, bc])
        nv_ql_mod = int(quant_mode_table[1 if pc == 1 else 0,
                                         min(bc + mod_bits, 127)])
        recs.append((int(mode_index[m]), int(dm_m[m]), q, levels, unq,
                     ang_ok, tuple(chain), nv_ql, nv_ql_mod))
    return tuple(recs)


def _ms_kernel(di_ref, lo_ref, hi_ref, wei_ref, wes_ref, mcut_ref,
               maxwq_ref, ce_ref, cf_ref, sfm_ref,
               oint_ref, oerr_ref, *, modes: tuple, C: int, pc: int,
               S: int, T: int, W: int, D: int, two: bool):
    f32 = jnp.float32
    BT = di_ref.shape[1]
    wei = wei_ref[0:T, :]
    wes = wes_ref[0:T, :]
    mcut = mcut_ref[0:1, :]
    maxwq = maxwq_ref[0:1, :]

    if two:
        wei2 = wei_ref[128:128 + T, :]
        wes2 = wes_ref[128:128 + T, :]
        mcut2 = mcut_ref[1:2, :]

    # Running top-C state: value + payload rows.
    ninf = jnp.full((1, BT), f32(_BIG))
    zero = jnp.zeros((1, BT), f32)
    best_v = [ninf for _ in range(C)]
    npay = 6 + pc + W * (2 if two else 1)
    best_p = [[zero for _ in range(npay)] for _ in range(C)]

    def quantize_plane(d, q, levels, unq, ang_ok, di_r, lo_r, hi_r, mc):
        """One plane's quantize-into-range; returns (uq, uqf-infill parts)."""
        di_d = di_r[d * W:(d + 1) * W, :]                    # (W, BT)
        if ang_ok:
            low = lo_r[d * 8 + q:d * 8 + q + 1, :]
            high = hi_r[d * 8 + q:d * 8 + q + 1, :]
            high = jnp.where(high > 1.02 * mc, f32(1.0), high)
        else:
            low = zero
            high = jnp.ones((1, BT), f32)
        degen = high <= low
        low = jnp.where(degen, f32(0.0), low)
        high = jnp.where(degen, f32(1.0), high)
        rscale = high - low
        scale = 1.0 / rscale
        scaled_low = low * scale
        ix = jnp.clip(di_d * scale - scaled_low, 0.0, 1.0)   # (W, BT)
        qlm1 = f32(levels - 1)
        ix1 = ix * qlm1
        wl = jnp.floor(ix1)
        # One chain resolves both LUT entries (wl and wl+1 clamped).
        ixl = jnp.zeros((W, BT), f32)
        ixh = jnp.zeros((W, BT), f32)
        for l in range(levels):
            m = wl == f32(l)
            ixl = jnp.where(m, f32(unq[l]), ixl)
            ixh = jnp.where(m, f32(unq[min(l + 1, levels - 1)]), ixh)
        pick_h = (ixl + ixh) < 128.0 * ix
        uq = jnp.where(pick_h, ixh, ixl)                     # (W, BT) ints
        return uq, low, rscale * (1.0 / 64.0)

    def plane_err(d, uq, low, rs64, wei_p, wes_p):
        sf_d = sfm_ref[d * T:(d + 1) * T, 0:W]               # (T, W)
        g = jax.lax.dot_general(
            sf_d, uq, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                      # (T, BT) exact
        infill = g * rs64 + low
        dd = infill - wei_p
        return jnp.sum(dd * dd * wes_p, axis=0, keepdims=True)

    for rec in modes:
        (mode_index, d, q, levels, unq, ang_ok, chain, nv_ql,
         nv_qlm) = rec

        uq1, low1, rs1 = quantize_plane(d, q, levels, unq, ang_ok,
                                        di_ref, lo_ref, hi_ref, mcut)
        qwt = plane_err(d, uq1, low1, rs1, wei, wes)
        if two:
            uq2, low2, rs2 = quantize_plane(
                d, q, levels, unq, ang_ok,
                di_ref[D * W:, :], lo_ref[D * 8:, :], hi_ref[D * 8:, :],
                mcut2)
            qwt = qwt + plane_err(d, uq2, low2, rs2, wei2, wes2)

        # Format chain: static rows of the combined color-error table.
        best_fe = ninf
        cq = jnp.full((1, BT), f32(nv_ql))
        cqm = jnp.full((1, BT), f32(nv_qlm))
        fmt = [jnp.full((1, BT), f32(FMT_LUMINANCE)) for _ in range(pc)]
        first = True
        for (ql, qlc, ql_mod, slot) in chain:
            row = ce_ref[qlc * S + slot:qlc * S + slot + 1, :]
            take = row < best_fe if not first else (row == row)
            first = False
            best_fe = jnp.where(take, row, best_fe)
            cq = jnp.where(take, f32(ql), cq)
            cqm = jnp.where(take, f32(ql_mod), cqm)
            base = (qlc * S + slot) * pc
            for p in range(pc):
                fr = cf_ref[base + p:base + p + 1, :]
                fmt[p] = jnp.where(take, fr, fmt[p])
        none_valid = best_fe >= f32(_BIG)
        if nv_ql < QUANT_6:
            for p in range(pc):
                fmt[p] = jnp.where(none_valid, f32(FMT_LUMINANCE), fmt[p])
        cq = jnp.where(none_valid, f32(nv_ql), cq)
        cqm = jnp.where(none_valid, f32(nv_qlm), cqm)

        mode_ok = f32(q) <= maxwq
        total = jnp.where(mode_ok, best_fe + qwt, f32(_BIG))

        # Insertion into the running top-C (strict < keeps earlier modes
        # ahead on ties = reference repeated-argmin order).
        pay = [jnp.full((1, BT), f32(mode_index)),
               jnp.full((1, BT), f32(d)),
               jnp.full((1, BT), f32(q)),
               jnp.clip(cq, 4.0, 20.0),
               jnp.clip(cqm, 0.0, 20.0),
               jnp.where(total < f32(_BIG), f32(1.0), f32(0.0))]
        pay += fmt
        pay += [uq1[w:w + 1, :] for w in range(W)]
        if two:
            pay += [uq2[w:w + 1, :] for w in range(W)]
        v = total
        for c in range(C):
            take = v < best_v[c]
            new_bv = jnp.where(take, v, best_v[c])
            v = jnp.where(take, best_v[c], v)
            best_v[c] = new_bv
            bp = best_p[c]
            for i in range(npay):
                new_bp = jnp.where(take, pay[i], bp[i])
                pay[i] = jnp.where(take, bp[i], pay[i])
                bp[i] = new_bp

    Wp = (W + 7) & ~7
    rows = []
    for c in range(C):
        p = best_p[c]
        valid = jnp.where(best_v[c] < f32(_BIG), p[5], f32(0.0))
        crows = [p[0], p[1], p[2], valid, p[3], p[4], zero, zero]
        crows += p[6:6 + pc] + [zero] * (8 - pc)
        crows += p[6 + pc:6 + pc + W]
        crows += [zero] * (Wp - W)
        if two:
            crows += p[6 + pc + W:6 + pc + 2 * W]
            crows += [zero] * (Wp - W)
        rows += crows
    oint_ref[:] = jnp.concatenate(rows, axis=0).astype(jnp.int32)
    oerr_ref[:] = jnp.concatenate(best_v, axis=0)


@functools.partial(jax.jit, static_argnums=(10, 11, 12, 13, 14, 15, 16))
def _ms_call(diT, loT, hiT, weiT, wesT, mcutT, maxwqT, ceT, cfT, sfm,
             modes: tuple, C: int, pc: int, S: int, T: int, W: int,
             D: int):
    B = diT.shape[1]
    two = weiT.shape[0] > 128
    BT = 128
    kern = functools.partial(_ms_kernel, modes=modes, C=C, pc=pc, S=S,
                             T=T, W=W, D=D, two=two)
    const_spec = pl.BlockSpec(sfm.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    spec = lambda r: pl.BlockSpec((r, BT), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    Wp = (W + 7) & ~7
    crows = 16 + Wp * (2 if two else 1)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((C * crows, B), jnp.int32),
                   jax.ShapeDtypeStruct((C, B), jnp.float32)),
        grid=(B // BT,),
        in_specs=[spec(diT.shape[0]), spec(loT.shape[0]),
                  spec(hiT.shape[0]), spec(weiT.shape[0]),
                  spec(wesT.shape[0]), spec(mcutT.shape[0]),
                  spec(maxwqT.shape[0]), spec(ceT.shape[0]),
                  spec(cfT.shape[0]), const_spec],
        out_specs=(pl.BlockSpec((C * crows, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((C, BT), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(diT, loT, hiT, weiT, wesT, mcutT, maxwqT, ceT, cfT, sfm)


class MsTables:
    """Device-resident stencil master for one (BSD, decimation subset)."""

    def __init__(self, dec_f32_np):
        D, T, W = dec_f32_np.shape
        self.D, self.T, self.W = D, T, W
        self.sfm = jnp.asarray(dec_f32_np.reshape(D * T, W), jnp.float32)


def mode_search(tables: MsTables, dec_ideal, low_v, high_v, wei, wes,
                mcut, maxwq, comb_err, comb_fmt, modes: tuple, C: int,
                pc: int, dec_ideal2=None, low_v2=None, high_v2=None,
                wei2=None, wes2=None, mcut2=None):
    """Run the fused mode search; block-major in/out.

    Args:
      dec_ideal: (N, D, W); low_v/high_v: (N, D, 8); wei/wes: (N, T);
      mcut/maxwq: (N,); comb_err: (N, 21, S) f32;
      comb_fmt: (N, 21, S, pc) int32; modes: make_mode_meta tuple.
      *2 args: second plane (2-plane trials).

    Returns dict of block-major candidate tensors:
      mode (N, C), dm (N, C), wq (N, C), valid (N, C) bool,
      cq (N, C), cqm (N, C), fmt (N, C, pc), uq (N, C, W)
      [+ uq2 (N, C, W)], err (N, C).
    """
    N = dec_ideal.shape[0]
    D, T, W = tables.D, tables.T, tables.W
    S = comb_err.shape[2]
    two = dec_ideal2 is not None

    pad = (-N) % 128
    def padded(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) \
            if pad else x

    di = padded(dec_ideal).reshape(N + pad, D * W).T
    lo = padded(low_v).reshape(N + pad, D * 8).T
    hi = padded(high_v).reshape(N + pad, D * 8).T
    if two:
        di = jnp.concatenate(
            [di, padded(dec_ideal2).reshape(N + pad, D * W).T], axis=0)
        lo = jnp.concatenate(
            [lo, padded(low_v2).reshape(N + pad, D * 8).T], axis=0)
        hi = jnp.concatenate(
            [hi, padded(high_v2).reshape(N + pad, D * 8).T], axis=0)

    def pack_t(a, b):
        out = jnp.zeros((N + pad, 256 if two else 128), jnp.float32)
        out = out.at[:N, 0:T].set(a)
        if two:
            out = out.at[:N, 128:128 + T].set(b)
        return out.T

    weiT = pack_t(wei, wei2)
    wesT = pack_t(wes, wes2)
    mrows = 2 if two else 1
    mcutT = jnp.zeros((N + pad, mrows), jnp.float32).at[:N, 0].set(mcut)
    if two:
        mcutT = mcutT.at[:N, 1].set(mcut2)
    mcutT = mcutT.T
    maxwqT = padded(maxwq.astype(jnp.float32))[:, None].T
    ceT = padded(comb_err).reshape(N + pad, 21 * S).T
    cfT = padded(comb_fmt).reshape(N + pad, 21 * S * pc).astype(
        jnp.float32).T

    oint, oerr = _ms_call(di, lo, hi, weiT, wesT, mcutT, maxwqT, ceT, cfT,
                          tables.sfm, modes, C, pc, S, T, W, D)
    oint = oint[:, :N]
    oerr = oerr[:, :N]
    Wp = (W + 7) & ~7
    crows = 16 + Wp * (2 if two else 1)
    out = {"err": oerr.T}
    g = {"mode": 0, "dm": 1, "wq": 2, "valid": 3, "cq": 4, "cqm": 5}
    for k, r in g.items():
        out[k] = jnp.stack([oint[c * crows + r, :] for c in range(C)],
                           axis=1)
    out["valid"] = out["valid"] != 0
    out["fmt"] = jnp.stack(
        [oint[c * crows + 8:c * crows + 8 + pc, :].T for c in range(C)],
        axis=1)                                          # (N, C, pc)
    out["uq"] = jnp.stack(
        [oint[c * crows + 16:c * crows + 16 + W, :].T for c in range(C)],
        axis=1)                                          # (N, C, W)
    if two:
        out["uq2"] = jnp.stack(
            [oint[c * crows + 16 + Wp:c * crows + 16 + Wp + W, :].T
             for c in range(C)], axis=1)
    return out
