"""Angular weight-range alignment, batched.

TPU redesign of the reference's angular quantization search
(reference: Source/astcenc_weight_align.cpp): the per-weight sincos sums
become a 64-bin histogram matmul against the sincos tables (MXU), and the
per-angular-step error accumulation is a fused broadcast+reduce over the
(block, decimation, weight, step) lattice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

ANGULAR_STEPS = 32
SINCOS_STEPS = 64
TUNE_MAX_ANGULAR_QUANT = 7  # QUANT_12

STEPS_FOR_QUANT_LEVEL = np.array([2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32],
                                 dtype=np.int32)


@functools.cache
def _sincos_tables():
    """(64, 32) sin/cos tables (reference: prepare_angular_tables :72-84)."""
    j = np.arange(SINCOS_STEPS, dtype=np.float32)[:, None]
    step = np.arange(1, ANGULAR_STEPS + 1, dtype=np.float32)[None, :]
    ang = (2.0 * np.pi / (SINCOS_STEPS - 1.0)) * step * j
    return np.sin(ang).astype(np.float32), np.cos(ang).astype(np.float32)


def compute_angular_offsets(dec_weights, wvalid):
    """Angular offsets per (n, d, step).

    Args:
      dec_weights: (N, D, W) ideal decimated weights.
      wvalid: (D, W) bool weight-slot validity.

    Returns: (N, D, 32) offsets.
    """
    sin_t, cos_t = _sincos_tables()
    isample = jnp.clip(dec_weights, 0.0, 1.0) * (SINCOS_STEPS - 1.0)
    isample = jnp.floor(isample + 0.5).astype(jnp.int32)

    # Histogram over the 64 sincos bins, then one matmul per table
    onehot = (isample[..., None] == jnp.arange(SINCOS_STEPS)).astype(jnp.float32)
    onehot = onehot * wvalid[None, :, :, None]
    hist = jnp.sum(onehot, axis=2)  # (N, D, 64)

    asum_y = jnp.einsum("nds,sa->nda", hist, jnp.asarray(sin_t))
    asum_x = jnp.einsum("nds,sa->nda", hist, jnp.asarray(cos_t))

    angle = jnp.arctan2(asum_y, asum_x)
    angle = jnp.where(jnp.isnan(angle), 0.0, angle)
    # atan2(0, 0) is 0 in XLA already, but keep the reference's NaN guard
    zero_both = (asum_x == 0.0) & (asum_y == 0.0)
    angle = jnp.where(zero_both, 0.0, angle)
    return angle * (1.0 / (2.0 * np.pi))


def lowest_and_highest_weight(dec_weights, wvalid, offsets, max_quant_steps):
    """Per angular step: lowest index, span, error, cut-low/high errors.

    Reference: compute_lowest_and_highest_weight (:160-245).

    Args:
      dec_weights: (N, D, W).
      wvalid: (D, W) bool.
      offsets: (N, D, 32).
      max_quant_steps: (N, D) span clamp bound (steps of max precision).

    Returns: dict of (N, D, 32) arrays.
    """
    N, D, W = dec_weights.shape
    rcp = jnp.arange(1, ANGULAR_STEPS + 1, dtype=jnp.float32)  # (32,)

    big = jnp.float32(3.4e38)
    wv = wvalid[None]
    minw = jnp.min(jnp.where(wv, dec_weights, big), axis=-1)    # (N, D)
    maxw = jnp.max(jnp.where(wv, dec_weights, -big), axis=-1)

    minidx = jnp.round(minw[..., None] * rcp - offsets)         # (N, D, 32)
    maxidx = jnp.round(maxw[..., None] * rcp - offsets)

    # Broadcast over (N, D, W, 32) and reduce over W. A scan over W would
    # serialize 16-64 tiny device steps; as a plain reduce XLA fuses the
    # whole thing into one streaming kernel (the intermediate is never
    # materialized on TPU).
    sval = (dec_weights[..., None] * rcp[None, None, None, :]
            - offsets[:, :, None, :])                      # (N, D, W, 32)
    svalrte = jnp.round(sval)
    diff = sval - svalrte
    ok = wvalid[None, :, :, None]
    errv = jnp.sum(jnp.where(ok, diff * diff, 0.0), axis=2)
    is_min = (svalrte == minidx[:, :, None, :]) & ok
    cutlo = jnp.sum(jnp.where(is_min, 1.0 - 2.0 * diff, 0.0), axis=2)
    is_max = (svalrte == maxidx[:, :, None, :]) & ok
    cuthi = jnp.sum(jnp.where(is_max, 1.0 + 2.0 * diff, 0.0), axis=2)

    span = (maxidx - minidx + 1.0).astype(jnp.int32)
    span = jnp.minimum(span, max_quant_steps[..., None] + 3)
    span = jnp.maximum(span, 2)

    ssize = 1.0 / rcp
    errscale = ssize * ssize
    return {
        "lowest_weight": minidx,
        "span": span,
        "error": errv * errscale,
        "cut_low": cutlo * errscale,
        "cut_high": cuthi * errscale,
        "offsets": offsets,
    }


def angular_endpoints_for_quant_levels(dec_weights, wvalid, max_precision):
    """[low, high] weight values per (n, d, quant level 0..7).

    Reference: compute_angular_endpoints_for_quant_levels (:256-355).

    Args:
      dec_weights: (N, D, W) ideal decimated weights.
      wvalid: (D, W) static weight validity.
      max_precision: (N, D) int32 max quant level (already min'd with
        TUNE_MAX_ANGULAR_QUANT and the per-block quant limit); -1 disables.

    Returns:
      (low (N, D, 8), high (N, D, 8)) float32. Entries above max_precision
      are unspecified (callers select [0,1] for quant > angular limit).
    """
    steps_tab = jnp.asarray(STEPS_FOR_QUANT_LEVEL)
    max_prec_c = jnp.clip(max_precision, 0, 11)
    max_quant_steps = steps_tab[max_prec_c]                     # (N, D)
    max_angular_steps = max_quant_steps

    offsets = compute_angular_offsets(dec_weights, wvalid)
    r = lowest_and_highest_weight(dec_weights, wvalid, offsets,
                                  max_quant_steps)

    step_ids = jnp.arange(ANGULAR_STEPS, dtype=jnp.int32)
    step_ok = step_ids[None, None, :] < max_angular_steps[..., None]

    err = jnp.where(step_ok, r["error"], jnp.float32(1e30))
    e_lo = jnp.where(step_ok, r["error"] + r["cut_low"], jnp.float32(1e30))
    e_hi = jnp.where(step_ok, r["error"] + r["cut_high"], jnp.float32(1e30))
    e_lohi = jnp.where(step_ok, r["error"] + r["cut_low"] + r["cut_high"],
                       jnp.float32(1e30))
    span = r["span"]

    # For each target span s, gather the candidates in the reference's update
    # order: per step (ascending) -> plain@s, cutlow@s+1, cuthigh@s+1,
    # cutlowhigh@s+2. First-minimum matches the reference's strict-< updates.
    # Candidate axis layout: (32 steps x 4 variants).
    def best_for_span(s):
        # Per step, first-minimum across the 4 variants (strict-< updates ==
        # keep the earliest variant on ties), then first-minimum across
        # steps. Written as a fused elementwise chain + one 32-wide argmin:
        # stacking into a 128-wide candidate axis forced layout copies that
        # dominated the whole encoder's HBM traffic on TPU.
        big = jnp.float32(1e30)
        c0 = jnp.where(span == s, err, big)
        c1 = jnp.where(span == s + 1, e_lo, big)
        c2 = jnp.where(span == s + 1, e_hi, big)
        c3 = jnp.where(span == s + 2, e_lohi, big)
        vbest = c0
        vidx = jnp.zeros(c0.shape, jnp.int32)
        for i, c in ((1, c1), (2, c2), (3, c3)):
            upd = c < vbest
            vidx = jnp.where(upd, i, vidx)
            vbest = jnp.where(upd, c, vbest)
        bsi = jnp.argmin(vbest, axis=-1)                     # (N, D) first-min
        best_err = jnp.min(vbest, axis=-1)
        # One-hot contraction instead of take_along_axis: per-element
        # gathers scalarize on TPU.
        oh = (jnp.arange(vbest.shape[-1], dtype=jnp.int32)
              == bsi[..., None])
        variant = jnp.sum(jnp.where(oh, vidx, 0), axis=-1)
        cutflag = ((variant == 1) | (variant == 3)).astype(jnp.float32)
        found = best_err < big
        return bsi, cutflag, found

    lows = []
    highs = []
    for l in range(TUNE_MAX_ANGULAR_QUANT + 1):
        q = int(STEPS_FOR_QUANT_LEVEL[l])
        bsi, cutflag, found = best_for_span(q)
        bsi = jnp.where(found, bsi, 0)
        oh = (jnp.arange(ANGULAR_STEPS, dtype=jnp.int32) == bsi[..., None])
        lw = jnp.sum(jnp.where(oh, r["lowest_weight"], 0.0), axis=-1) + cutflag
        hw = lw + float(q) - 1.0
        stepsize = 1.0 / (1.0 + bsi.astype(jnp.float32))
        off = jnp.sum(jnp.where(oh, offsets, 0.0), axis=-1)
        lows.append((off + lw) * stepsize)
        highs.append((off + hw) * stepsize)

    return jnp.stack(lows, axis=-1), jnp.stack(highs, axis=-1)
