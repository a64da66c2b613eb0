"""Ideal endpoints and weights, batched over blocks.

TPU redesign of the reference's per-block scalar+SIMD pipeline
(reference: Source/astcenc_ideal_endpoints_and_weights.cpp,
Source/astcenc_averages_and_directions.cpp): partition reductions become
one-hot matmuls on the MXU; the per-decimation weighted least squares and
its single gradient-refinement step become batched einsums over a dense
(decimation, texel, weight) stencil tensor.

Conventions:
  * texels: (N, T, 4) float32 in [0, 65535] (LDR unorm) or LNS space.
  * pmask:  (N, T, P) float32 one-hot partition membership (P = 4 always;
    unused partitions are all-zero columns).
  * All reductions masked so unused partitions produce benign values.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import lut as lut_ops

_EPS_LINE = 1e-7


def partition_onehot(pot: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """(N, T) partition ids -> (N, T, 4) float one-hot."""
    oh = (pot[..., None] == jnp.arange(4, dtype=pot.dtype)).astype(jnp.float32)
    if valid is not None:
        oh = oh * valid[..., None].astype(jnp.float32)
    return oh


def partition_means(texels: jnp.ndarray, pmask: jnp.ndarray):
    """Masked mean per partition: (N, P, 4) sums / counts."""
    sums = jnp.einsum("ntp,ntc->npc", pmask, texels)
    counts = jnp.sum(pmask, axis=1)  # (N, P)
    means = sums / jnp.maximum(counts[..., None], 1.0)
    return means, counts


def avgs_and_dirs(texels: jnp.ndarray, pmask: jnp.ndarray,
                  comp_mask: tuple) -> tuple:
    """Partition average + dominant direction.

    The reference sidesteps an eigen-solve by summing positive-deviation
    vectors per channel and keeping the longest
    (reference: compute_avgs_and_dirs_4_comp, :388-456; _3_comp :459).

    Args:
      texels: (N, T, 4).
      pmask: (N, T, P) one-hot float.
      comp_mask: 4-tuple of 0/1 selecting active components.

    Returns:
      (avg (N, P, 4), dir (N, P, 4)); inactive components zeroed in dir.
    """
    cm = jnp.array(comp_mask, dtype=jnp.float32)
    avg, _ = partition_means(texels * cm, pmask)

    # Per channel c: sum over texels of (texel - avg) restricted to texels
    # whose channel-c deviation is positive, computed without materializing
    # the (N, T, P, 4) deviation tensor (memory-critical for the partition
    # search, which folds candidates into the batch axis).
    avg_t = jnp.einsum("ntp,npc->ntc", pmask, avg)  # (N, T, 4)
    texc = texels * cm

    dirs = []
    norms = []
    for c in range(4):
        if not comp_mask[c]:
            continue
        posm = pmask * ((texc[:, :, c] - avg_t[:, :, c]) > 0
                        )[..., None].astype(jnp.float32)    # (N, T, P)
        s = (jnp.einsum("ntp,ntd->npd", posm, texc)
             - avg * jnp.sum(posm, axis=1)[..., None])       # (N, P, 4)
        s = s * cm
        dirs.append(s)
        norms.append(jnp.sum(s * s * cm, axis=-1))  # (N, P)

    dirs_arr = jnp.stack(dirs, axis=0)   # (C, N, P, 4)
    norms_arr = jnp.stack(norms, axis=0)  # (C, N, P)
    best = jnp.argmax(norms_arr, axis=0)  # first max wins = reference order
    # Reference uses strict > to replace, so earlier channel wins ties; argmax
    # also returns the first occurrence of the max. Select via a C-step
    # where-chain: axis-0 gathers scalarize on TPU.
    dir_best = dirs_arr[0]
    for c in range(1, dirs_arr.shape[0]):
        dir_best = jnp.where((best == c)[..., None], dirs_arr[c], dir_best)
    return avg, dir_best


def _normalize_safe(v: jnp.ndarray, comp_mask: tuple) -> jnp.ndarray:
    """normalize(v) with fallback to the unit-diagonal vector (reference
    normalize_safe): length==0 -> 1/sqrt(C) in each active component."""
    cm = jnp.array(comp_mask, dtype=jnp.float32)
    ncomp = sum(comp_mask)
    lensq = jnp.sum(v * v * cm, axis=-1, keepdims=True)
    unit = cm / jnp.sqrt(float(ncomp))
    safe = v / jnp.sqrt(jnp.where(lensq > 0, lensq, 1.0))
    return jnp.where(lensq == 0.0, unit, safe)


def ideal_colors_and_weights(texels, pmask, counts, data_min, data_max,
                             channel_weight, comp_mask,
                             omitted_component: int | None = None):
    """Project texels onto the per-partition dominant line.

    Implements compute_ideal_colors_and_weights_{4,3,2,1}_comp according to
    comp_mask / omitted_component (reference: :107-609).

    Args:
      texels: (N, T, 4); pmask: (N, T, P); counts: (N, P).
      data_min/data_max: (N, 4) whole-block min/max (fills omitted lanes).
      channel_weight: (4,) static error weights.
      comp_mask: active components tuple.
      omitted_component: lane filled from block min/max (3-comp modes), or
        None (4-comp).

    Returns dict:
      weights (N, T) in [0,1]; weight_error_scale (N, T);
      ep0/ep1 (N, P, 4); is_constant_wes (N,).
    """
    ncomp = sum(comp_mask)
    cw = jnp.asarray(channel_weight, dtype=jnp.float32)
    cm = jnp.array(comp_mask, dtype=jnp.float32)
    # Per-block channel weights (USE_ALPHA_WEIGHT) arrive as (N, 4); the
    # error weight then becomes a per-block scalar broadcast over texels.
    error_weight = jnp.sum(cw * cm, axis=-1) / ncomp
    if cw.ndim == 2:
        error_weight = error_weight[:, None]               # (N, 1)

    if ncomp == 1:
        comp = comp_mask.index(1)
        vals = texels[:, :, comp]  # (N, T)
        big = 1e10
        low = jnp.min(jnp.where(pmask.transpose(0, 2, 1) > 0,
                                vals[:, None, :], big), axis=2)   # (N, P)
        high = jnp.max(jnp.where(pmask.transpose(0, 2, 1) > 0,
                                 vals[:, None, :], -big), axis=2)
        degen = high <= low
        low = jnp.where(degen, 0.0, low)
        high = jnp.where(degen, _EPS_LINE, high)
        length = high - low
        lensq = length * length
        scale = 1.0 / length

        low_t = jnp.einsum("ntp,np->nt", pmask, low)
        scale_t = jnp.einsum("ntp,np->nt", pmask, scale)
        lensq_t = jnp.einsum("ntp,np->nt", pmask, lensq)
        w = jnp.clip((vals - low_t) * scale_t, 0.0, 1.0)
        wes = lensq_t * error_weight

        lane = jnp.arange(4)
        sep = (lane == comp)
        ep0 = jnp.where(sep, low[..., None], data_min[:, None, :])
        ep1 = jnp.where(sep, high[..., None], data_max[:, None, :])

        active = counts > 0
        lensq_masked = jnp.where(active, lensq, lensq[:, :1])
        const_wes = jnp.all(lensq_masked == lensq[:, :1], axis=1)
        return {"weights": w, "weight_error_scale": wes,
                "ep0": ep0, "ep1": ep1, "is_constant_wes": const_wes}

    avg, dirv = avgs_and_dirs(texels, pmask, comp_mask)

    # Flip direction if its (rgb or active-lane) sum is negative
    if ncomp >= 3:
        flip_sum = jnp.sum(dirv[..., :3], axis=-1)
    else:
        flip_sum = jnp.sum(dirv * cm, axis=-1)
    dirv = jnp.where((flip_sum < 0)[..., None], -dirv, dirv)
    b = _normalize_safe(dirv, comp_mask)

    # Per-texel projection parameter against own partition's line
    avg_t = jnp.einsum("ntp,npc->ntc", pmask, avg)
    b_t = jnp.einsum("ntp,npc->ntc", pmask, b)
    param = jnp.sum((texels - avg_t) * b_t * cm, axis=-1)  # (N, T)

    big = 1e10
    inpart = pmask.transpose(0, 2, 1) > 0  # (N, P, T)
    lowp = jnp.min(jnp.where(inpart, param[:, None, :], big), axis=2)
    highp = jnp.max(jnp.where(inpart, param[:, None, :], -big), axis=2)
    degen = highp <= lowp
    lowp = jnp.where(degen, 0.0, lowp)
    highp = jnp.where(degen, _EPS_LINE, highp)
    length = highp - lowp
    lensq = length * length
    scale = 1.0 / length

    low_t = jnp.einsum("ntp,np->nt", pmask, lowp)
    scale_t = jnp.einsum("ntp,np->nt", pmask, scale)
    lensq_t = jnp.einsum("ntp,np->nt", pmask, lensq)
    w = jnp.clip((param - low_t) * scale_t, 0.0, 1.0)
    wes = lensq_t * error_weight

    ep0 = avg + b * lowp[..., None]
    ep1 = avg + b * highp[..., None]
    if omitted_component is not None:
        lane = jnp.arange(4)
        om = lane == omitted_component
        ep0 = jnp.where(om, data_min[:, None, :], ep0)
        ep1 = jnp.where(om, data_max[:, None, :], ep1)

    active = counts > 0
    lensq_masked = jnp.where(active, lensq, lensq[:, :1])
    const_wes = jnp.all(lensq_masked == lensq[:, :1], axis=1)
    return {"weights": w, "weight_error_scale": wes,
            "ep0": ep0, "ep1": ep1, "is_constant_wes": const_wes}


def ideal_weights_for_decimation(ei_weights, ei_wes, dec_int, dec_sq,
                                 dec_f32):
    """Ideal decimated weights: weighted average + one gradient step.

    Reference: compute_ideal_weights_for_decimation (:845-971). The direct
    (1:1) decimation falls out of the same math exactly.

    Args:
      ei_weights: (N, T) ideal per-texel weights.
      ei_wes: (N, T) weight error scales.
      dec_int: (D, T, W) integer contribution stencil (0..16 per entry).
      dec_sq: (D, T, W) squared stencil.
      dec_f32: (D, T, W) stencil / 16 (rows sum to 1).

    Returns:
      (N, D, W) ideal decimated weights (may exceed [0,1] slightly).
    """
    wes_w = ei_wes * ei_weights  # (N, T)
    num = jnp.einsum("dtw,nt->ndw", dec_int, wes_w)
    den = jnp.einsum("dtw,nt->ndw", dec_int, ei_wes) + 1e-10
    initial = num / den

    infilled = jnp.einsum("dtw,ndw->ndt", dec_f32, initial)
    diff = (infilled - ei_weights[:, None, :]) * ei_wes[:, None, :]

    ec0 = jnp.einsum("dtw,nt->ndw", dec_sq, ei_wes) + 1e-10
    ec1 = jnp.einsum("dtw,ndt->ndw", dec_int, diff)

    step = jnp.clip((ec1 * -16.0) / ec0, -0.25, 0.25)
    return initial + step


def quantize_weights_for_modes(dec_ideal_by_mode, low, high, quant_unquant,
                               levels_m1_tab, quant_of_mode):
    """Quantize ideal weights into the mode's [low, high] range.

    Reference: compute_quantized_weights_for_decimation (:974-1080) — two
    candidate LUT entries, pick the nearer by the 128*ix test.

    Args:
      dec_ideal_by_mode: (N, M, W) ideal weights gathered per mode.
      low/high: (N, M) angular range bounds.
      quant_unquant: (12, 32) int LUT value-rank -> unquant (0..64).
      levels_m1_tab: (12,) float levels-1 ("quant_levels_m1").
      quant_of_mode: (M,) static quant level per mode.

    Returns:
      (weights_uqf (N, M, W) float 0..1-space reconstructions,
       weights_uq (N, M, W) int unquant values 0..64)
    """
    degen = high <= low
    low = jnp.where(degen, 0.0, low)
    high = jnp.where(degen, 1.0, high)

    rscale = high - low
    scale = 1.0 / rscale
    scaled_low = low * scale
    rscale64 = rscale / 64.0

    qlm1 = levels_m1_tab[quant_of_mode]             # (M,)
    steps_m1 = (qlm1).astype(jnp.int32)             # levels-1 as int

    ix = jnp.clip(dec_ideal_by_mode * scale[..., None]
                  - scaled_low[..., None], 0.0, 1.0)
    ix1 = ix * qlm1[None, :, None]
    wl = ix1.astype(jnp.int32)                      # trunc
    wh = jnp.minimum(wl + 1, steps_m1[None, :, None])

    # Select-chain LUT: per-element gathers scalarize on TPU (96% of device
    # time profiled); a 32-step compare+select chain runs on the VPU.
    lut = quant_unquant[quant_of_mode]              # (M, 32) static gather
    lut_b = lut[None, :, None, :]                   # (1, M, 1, 32)
    ixl = lut_ops.lookup_span(lut_b, wl, 32)
    ixh = lut_ops.lookup_span(lut_b, wh, 32)

    pick_h = (ixl + ixh).astype(jnp.float32) < (128.0 * ix)
    uq = jnp.where(pick_h, ixh, ixl)                # int 0..64
    uqf = uq.astype(jnp.float32) * rscale64[..., None] + low[..., None]
    return uqf, uq


def weight_set_error(uqf_by_mode, ei_weights, ei_wes, dec_f32_by_mode):
    """Error of a quantized weight set vs the ideal per-texel weights.

    Reference: compute_error_of_weight_set_1plane (:688-749).

    Args:
      uqf_by_mode: (N, M, W) reconstructed 0..1 weights.
      ei_weights/ei_wes: (N, T).
      dec_f32_by_mode: (M, T, W) per-mode infill stencil.

    Returns: (N, M) error.
    """
    infilled = jnp.einsum("mtw,nmw->nmt", dec_f32_by_mode, uqf_by_mode)
    d = infilled - ei_weights[:, None, :]
    return jnp.sum(d * d * ei_wes[:, None, :], axis=-1)
