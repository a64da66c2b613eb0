"""Fused partition-candidate line-error ranking (Pallas/Mosaic TPU).

For every block and every top-ranked candidate partitioning, computes the
uncorrelated-lines and same-chroma-lines error estimates that
find_best_partition_candidates uses to pick the partitionings worth a full
trial (reference: astcenc_find_best_partitioning.cpp:551-779 with
compute_avgs_and_dirs_* and compute_error_squared_* from
astcenc_averages_and_directions.cpp).

The XLA formulation folds the candidate axis into the batch and
materializes (N*S, T, 4) texel/deviation tensors in HBM (hundreds of MB per
partition count at production batch sizes). Here the grid is
(candidate, block-tile): each step re-reads the same VMEM-resident texel
tile and only the (S, T, N) partition-of-texel tensor streams. Layout is
feature-major with blocks on the 128-lane axis (see refine_pallas.py).

The 4-component and 3-component (no-alpha) paths share one pass: the
channel mask is a per-block lane vector (alpha lane = uses_alpha), and the
alpha direction candidate is suppressed for 3-component rows, preserving
the reference's first-max tie-break order over the remaining candidates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_pallas import _interpret
from .refine_pallas import _asr_cw, _texp, asr_row


def _psearch_kernel(pot_ref, tex_ref, ua_ref, out_u_ref, out_s_ref, *,
                    T: int, P: int, wie: float, cw: tuple,
                    has_asr: bool = False):
    pot = pot_ref[0]                               # (T, BT) int32
    BT = pot.shape[1]
    f32 = jnp.float32
    texp = _texp(tex_ref, T)
    if has_asr:
        cw = _asr_cw(tex_ref, T, cw)
    ua = ua_ref[:] != 0                            # (1, BT)
    cm = [jnp.ones((1, BT), f32) for _ in range(3)]
    cm.append(jnp.where(ua, 1.0, 0.0))             # alpha lane mask
    ncomp = 3.0 + cm[3]
    texc = [texp[ch] * cm[ch] for ch in range(4)]

    uncor_err = jnp.zeros((1, BT), f32)
    samec_err = jnp.zeros((1, BT), f32)
    u_extra = jnp.zeros((1, BT), f32)
    s_extra = jnp.zeros((1, BT), f32)

    for p in range(P):
        inp = (pot == p).astype(f32)               # (T, BT)
        cnt = jnp.sum(inp, axis=0, keepdims=True)  # (1, BT)
        cnt_safe = jnp.maximum(cnt, 1.0)
        avg = [jnp.sum(inp * texc[ch], axis=0, keepdims=True) / cnt_safe
               for ch in range(4)]

        #

        # Dominant direction: per-channel positive-deviation sums, keep the
        # first-longest (compute_avgs_and_dirs_4_comp :388-456).
        best_norm = None
        best_dir = None
        for c in range(4):
            posm = inp * ((texc[c] - avg[c]) > 0).astype(f32)
            np_sum = jnp.sum(posm, axis=0, keepdims=True)
            s = [(jnp.sum(posm * texc[d], axis=0, keepdims=True)
                  - avg[d] * np_sum) * cm[d] for d in range(4)]
            norm = None
            for d in range(4):
                t_n = s[d] * s[d] * cm[d]
                norm = t_n if norm is None else norm + t_n
            if c == 3:
                # Alpha candidate only exists for 4-component rows.
                norm = jnp.where(ua, norm, -1.0)
            if best_norm is None:
                best_norm = norm
                best_dir = s
            else:
                take = norm > best_norm            # strict >: first wins
                best_norm = jnp.where(take, norm, best_norm)
                best_dir = [jnp.where(take, s[d], best_dir[d])
                            for d in range(4)]

        def normalize_safe(v):
            lensq = None
            for d in range(4):
                t_l = v[d] * v[d] * cm[d]
                lensq = t_l if lensq is None else lensq + t_l
            rl = 1.0 / jnp.sqrt(jnp.where(lensq > 0, lensq, 1.0))
            unit = 1.0 / jnp.sqrt(ncomp)
            return [jnp.where(lensq == 0.0, cm[d] * unit, v[d] * rl)
                    for d in range(4)]

        b_u = normalize_safe(best_dir)
        b_s = normalize_safe([avg[d] * cm[d] for d in range(4)])

        dproj = None
        for d in range(4):
            t_d = avg[d] * b_u[d] * cm[d]
            dproj = t_d if dproj is None else dproj + t_d
        amod = [avg[d] - b_u[d] * dproj for d in range(4)]

        # Per-texel projections and squared line distances.
        param_u = None
        param_s = None
        for d in range(4):
            tu = texp[d] * (b_u[d] * cm[d])
            ts = texp[d] * (b_s[d] * cm[d])
            param_u = tu if param_u is None else param_u + tu
            param_s = ts if param_s is None else param_s + ts

        eu = None
        es = None
        for d in range(4):
            du = amod[d] + param_u * b_u[d] - texp[d]
            ds = param_s * b_s[d] - texp[d]
            wchan = cw[d]
            t_eu = du * du * (wchan * cm[d])
            t_es = ds * ds * (wchan * cm[d])
            eu = t_eu if eu is None else eu + t_eu
            es = t_es if es is None else es + t_es
        uncor_err = uncor_err + jnp.sum(inp * eu, axis=0, keepdims=True)
        samec_err = samec_err + jnp.sum(inp * es, axis=0, keepdims=True)

        # Line length from the uncorrelated projection range.
        big = 1e10
        lo = jnp.min(jnp.where(inp > 0, param_u, big), axis=0, keepdims=True)
        hi = jnp.max(jnp.where(inp > 0, param_u, -big), axis=0,
                     keepdims=True)
        ll = jnp.maximum(hi - lo, 1e-7)
        lsq = ll * ll
        ew = cnt * wie
        bu_sq = None
        bs_sq = None
        for d in range(4):
            t_bu = (b_u[d] * cm[d]) ** 2
            t_bs = (b_s[d] * cm[d]) ** 2
            bu_sq = t_bu if bu_sq is None else bu_sq + t_bu
            bs_sq = t_bs if bs_sq is None else bs_sq + t_bs
        u_extra = u_extra + bu_sq * lsq * ew
        s_extra = s_extra + bs_sq * lsq * ew

    out_u_ref[:] = (uncor_err + u_extra)[None]
    out_s_ref[:] = (samec_err + s_extra)[None]


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def _psearch_call(potT, texT, ua, T: int, P: int, wie: float, cw: tuple,
                  BT: int, has_asr: bool = False):
    S = potT.shape[0]
    N = potT.shape[2]
    kern = functools.partial(_psearch_kernel, T=T, P=P, wie=wie, cw=cw,
                             has_asr=has_asr)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((S, 1, N), jnp.float32),
                   jax.ShapeDtypeStruct((S, 1, N), jnp.float32)),
        interpret=_interpret(),
        grid=(S, N // BT),
        in_specs=[
            pl.BlockSpec((1, T, BT), lambda s, i: (s, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((texT.shape[0], BT), lambda s, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT), lambda s, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, 1, BT), lambda s, i: (s, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, BT), lambda s, i: (s, 0, i),
                                memory_space=pltpu.VMEM)),
    )(potT, texT, ua)


def line_errors(potS, tex_packed, uses_alpha, P: int, wie: float, cw,
                BT: int = 128, cw_scale=None):
    """Candidate line errors, kernel-fused.

    Args:
      potS: (N, S, T) int32 partition-of-texel per top candidate.
      tex_packed: (N, 512) f32 from refine_pallas.pack_tex.
      uses_alpha: (N,) bool.
      P: static partition count; wie: weight-imprecision constant.

    Returns (uncor (N, S) f32, samec (N, S) f32).
    """
    N, S, T = potS.shape
    if cw_scale is not None:
        tex_packed = tex_packed.at[:, asr_row(T)].set(
            cw_scale.astype(jnp.float32))
    pad = (-N) % BT
    potT = jnp.transpose(potS, (1, 2, 0))          # (S, T, N)
    ua = uses_alpha.astype(jnp.int32)[None, :]     # (1, N)
    texT = tex_packed.T
    if pad:
        potT = jnp.pad(potT, ((0, 0), (0, 0), (0, pad)),
                       constant_values=255)
        ua = jnp.pad(ua, ((0, 0), (0, pad)))
        texT = jnp.pad(texT, ((0, 0), (0, pad)))
    u, s = _psearch_call(potT, texT, ua, T, P, float(wie),
                         tuple(float(c) for c in cw), BT,
                         cw_scale is not None)
    return u[:, 0, :N].T, s[:, 0, :N].T
