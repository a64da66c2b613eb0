"""Least-squares endpoint recomputation for fixed weights, batched.

TPU redesign of recompute_ideal_colors_1plane / _2planes
(reference: Source/astcenc_ideal_endpoints_and_weights.cpp:1146-1650): the
per-partition 2x2 normal equations become masked einsum reductions over the
texel axis for all blocks at once.
"""

from __future__ import annotations

import jax.numpy as jnp


def recompute_ideal_colors_1plane(texels, pmask, counts, undec_weights,
                                  channel_weight, ep0_in, ep1_in,
                                  is_hdr: bool = False):
    """Refit endpoints per partition given per-texel weights.

    Args:
      texels: (N, T, 4) in 0..65535 domain.
      pmask: (N, T, P) one-hot partitions.
      counts: (N, P).
      undec_weights: (N, T) infilled weights in [0, 1] (uquant/64).
      channel_weight: (4,) static.
      ep0_in/ep1_in: (N, P, 4) previous endpoints (kept if solve fails).
      is_hdr: enable the RGBO (HDR mode 7) vector computation.

    Returns dict: ep0, ep1 (N, P, 4); rgbs (N, P, 4); rgbo (N, P, 4).
    """
    cwj = jnp.asarray(channel_weight, jnp.float32)
    if cwj.ndim == 2:
        # Per-block channel weights (USE_ALPHA_WEIGHT): broadcast over the
        # partition axis.
        cw = cwj[:, None, :]                                 # (N, 1, 4)
        ls_weight = jnp.sum(cwj[:, :3], axis=-1)[:, None]    # (N, 1)
    else:
        cw = cwj
        ls_weight = float(channel_weight[0] + channel_weight[1]
                          + channel_weight[2])

    idx = undec_weights                      # (N, T)
    om = 1.0 - idx

    rgba_sum = jnp.einsum("ntp,ntc->npc", pmask, texels)  # per-partition sums
    rgba_sum = rgba_sum * cw
    tc = counts.astype(jnp.float32)
    rgba_weight_sum = jnp.maximum(cw * tc[..., None]
                                  if cwj.ndim == 2 else
                                  cw[None, None, :] * tc[..., None], 1e-17)

    mean_rgb = (rgba_sum / rgba_weight_sum)[..., :3]
    norm = jnp.sqrt(jnp.sum(mean_rgb * mean_rgb, axis=-1, keepdims=True))
    scale_dir = mean_rgb / jnp.where(norm > 0, norm, 1.0)  # (N, P, 3)

    scale_dir_t = jnp.einsum("ntp,npc->ntc", pmask, scale_dir)
    scale = jnp.sum(scale_dir_t * texels[..., :3], axis=-1)  # (N, T)

    big = 1e10
    inpart = pmask.transpose(0, 2, 1) > 0  # (N, P, T)
    scale_min = jnp.min(jnp.where(inpart, scale[:, None, :], big), axis=2)
    scale_max = jnp.max(jnp.where(inpart, scale[:, None, :], -big), axis=2)
    wmin = jnp.min(jnp.where(inpart, idx[:, None, :], 1.0), axis=2)
    wmax = jnp.max(jnp.where(inpart, idx[:, None, :], 0.0), axis=2)

    left_s = jnp.einsum("ntp,nt->np", pmask, om * om)
    middle_s = jnp.einsum("ntp,nt->np", pmask, om * idx)
    right_s = jnp.einsum("ntp,nt->np", pmask, idx * idx)
    www_s = jnp.einsum("ntp,nt->np", pmask, idx) + 1e-17

    cvy = jnp.einsum("ntp,ntc->npc", pmask, texels * idx[..., None])
    cvx = jnp.einsum("ntp,ntc->npc", pmask, texels * om[..., None])

    sv0 = jnp.einsum("ntp,nt->np", pmask, om * scale) * ls_weight
    sv1 = jnp.einsum("ntp,nt->np", pmask, idx * scale) * ls_weight

    left = left_s[..., None] * cw
    middle = middle_s[..., None] * cw
    right = right_s[..., None] * cw
    lmrs0 = left_s * ls_weight
    lmrs1 = middle_s * ls_weight
    lmrs2 = right_s * ls_weight

    cvx = cvx * cw
    cvy = cvy * cw

    scalediv = jnp.clip(scale_min / jnp.maximum(scale_max, 1e-10), 0.0, 1.0)
    sds = scale_dir * scale_max[..., None]
    rgbs = jnp.concatenate([sds, scalediv[..., None]], axis=-1)

    all_same = wmin >= wmax * 0.999

    # All-same-weight path: average color as both endpoints
    avg = (cvx + cvy) / rgba_weight_sum
    notnan = ~jnp.isnan(avg)
    ep0_same = jnp.where(notnan, avg, ep0_in)
    ep1_same = jnp.where(notnan, avg, ep1_in)
    rgbs_same = jnp.concatenate([sds, jnp.ones_like(scalediv[..., None])],
                                axis=-1)

    # Analytic 2x2 solve
    det = left * right - middle * middle
    rdet = 1.0 / det
    mss = left * left + 2.0 * middle * middle + right * right

    ep0_f = (right * cvx - middle * cvy) * rdet
    ep1_f = (left * cvy - middle * cvx) * rdet

    det_ok = jnp.abs(det) > mss * 1e-4
    notnan2 = ~(jnp.isnan(ep0_f) | jnp.isnan(ep1_f))
    full = det_ok & notnan2
    ep0_fit = jnp.where(full, ep0_f, ep0_in)
    ep1_fit = jnp.where(full, ep1_f, ep1_in)

    ls_det = lmrs0 * lmrs2 - lmrs1 * lmrs1
    ls_rdet = 1.0 / ls_det
    ls_mss = lmrs0 * lmrs0 + 2.0 * lmrs1 * lmrs1 + lmrs2 * lmrs2
    scale_ep0 = (lmrs2 * sv0 - lmrs1 * sv1) * ls_rdet
    scale_ep1 = (lmrs0 * sv1 - lmrs1 * sv0) * ls_rdet
    ls_ok = ((jnp.abs(ls_det) > ls_mss * 1e-4)
             & ~jnp.isnan(scale_ep0) & ~jnp.isnan(scale_ep1)
             & (scale_ep0 < scale_ep1))
    sdsm = scale_dir * scale_ep1[..., None]
    rgbs_fit = jnp.concatenate(
        [sdsm, (scale_ep0 / jnp.where(scale_ep1 != 0, scale_ep1, 1.0))[..., None]],
        axis=-1)
    rgbs_out = jnp.where(ls_ok[..., None], rgbs_fit, rgbs)

    ep0 = jnp.where(all_same[..., None], ep0_same, ep0_fit)
    ep1 = jnp.where(all_same[..., None], ep1_same, ep1_fit)
    rgbs_out = jnp.where(all_same[..., None], rgbs_same, rgbs_out)

    rgbo = jnp.zeros_like(ep0)
    if is_hdr:
        wws = www_s[..., None] * cw
        psum = right_s * ls_weight
        rgbq = cvx + cvy
        rgbq = rgbq.at[..., 3].set(jnp.sum(cvy[..., :3], axis=-1))
        rgbo = _compute_rgbo(rgba_weight_sum, wws, rgbq, psum)
        bad = jnp.isnan(jnp.sum(rgbo * rgbo, axis=-1))
        avgdif = jnp.maximum(
            jnp.sum(ep1[..., :3] - ep0[..., :3], axis=-1) / 3.0, 0.0)
        avg2 = (ep0 + ep1) * 0.5
        ep0b = avg2 - avgdif[..., None] * 0.5
        fallback = jnp.concatenate([ep0b[..., :3], avgdif[..., None]], -1)
        rgbo = jnp.where(bad[..., None], fallback, rgbo)

    return {"ep0": ep0, "ep1": ep1, "rgbs": rgbs_out, "rgbo": rgbo}


def recompute_ideal_colors_2planes(texels, undec_w1, undec_w2, p2c,
                                   channel_weight, data_mean, ep0_in, ep1_in,
                                   is_hdr: bool = False):
    """Refit single-partition endpoints for two weight planes.

    Reference: recompute_ideal_colors_2planes (:1369-1650).

    Args:
      texels: (N, T, 4); undec_w1/undec_w2: (N, T) infilled weights [0,1].
      p2c: (N,) plane-2 component.
      data_mean: (N, 4) block mean (defines scale_dir).
      ep0_in/ep1_in: (N, 4) previous endpoints.

    Returns dict: ep0, ep1 (N, 4); rgbs (N, 4); rgbo (N, 4).
    """
    cw = jnp.asarray(channel_weight, jnp.float32)
    if cw.ndim == 2:
        ls_weight = jnp.sum(cw[:, :3], axis=-1)              # (N,)
    else:
        ls_weight = float(channel_weight[0] + channel_weight[1]
                          + channel_weight[2])
    N, T, _ = texels.shape
    lane = jnp.arange(4)
    p2_mask = lane[None, :] == p2c[:, None]          # (N, 4)

    rgba_weight_sum = jnp.maximum(
        (cw if cw.ndim == 2 else cw[None, :]) * T, 1e-17)
    mean_rgb = data_mean[..., :3]
    norm = jnp.sqrt(jnp.sum(mean_rgb * mean_rgb, -1, keepdims=True))
    scale_dir = mean_rgb / jnp.where(norm > 0, norm, 1.0)

    scale = jnp.sum(scale_dir[:, None, :] * texels[..., :3], -1)  # (N, T)
    scale_min = jnp.min(scale, 1)
    scale_max = jnp.max(scale, 1)

    def lmr(idx):
        om = 1.0 - idx
        return (jnp.sum(om * om, 1), jnp.sum(om * idx, 1),
                jnp.sum(idx * idx, 1),
                jnp.min(idx, 1), jnp.max(idx, 1))

    l1, m1, r1, wmin1, wmax1 = lmr(undec_w1)
    l2, m2, r2, wmin2, wmax2 = lmr(undec_w2)

    color_idx = jnp.where(p2_mask[:, None, :], undec_w2[..., None],
                          undec_w1[..., None])       # (N, T, 4)
    cvy = jnp.sum(texels * color_idx, 1)
    cvx = jnp.sum(texels * (1.0 - color_idx), 1)
    www = jnp.sum(color_idx, 1) + 1e-17              # (N, 4)

    om1 = 1.0 - undec_w1
    sv0 = jnp.sum(om1 * scale, 1) * ls_weight
    sv1 = jnp.sum(undec_w1 * scale, 1) * ls_weight

    cvx = cvx * cw
    cvy = cvy * cw

    scalediv = jnp.clip(scale_min / jnp.maximum(scale_max, 1e-10), 0.0, 1.0)
    sds = scale_dir * scale_max[..., None]
    rgbs = jnp.concatenate([sds, scalediv[..., None]], -1)

    avg = (cvx + cvy) / rgba_weight_sum
    notnan = ~jnp.isnan(avg)

    ep0 = ep0_in
    ep1 = ep1_in

    def solve(lsum, msum, rsum):
        left = lsum[..., None] * cw
        middle = msum[..., None] * cw
        right = rsum[..., None] * cw
        det = left * right - middle * middle
        rdet = 1.0 / det
        mss = left * left + 2 * middle * middle + right * right
        e0 = (right * cvx - middle * cvy) * rdet
        e1 = (left * cvy - middle * cvx) * rdet
        ok = (jnp.abs(det) > mss * 1e-4) & ~jnp.isnan(e0) & ~jnp.isnan(e1)
        return e0, e1, ok

    # Plane 1 lanes (!= p2c)
    allsame1 = (wmin1 >= wmax1 * 0.999)[:, None]
    e0f, e1f, okf = solve(l1, m1, r1)
    p1m = ~p2_mask
    take_same = allsame1 & p1m & notnan
    take_fit = ~allsame1 & p1m & okf
    ep0 = jnp.where(take_same, avg, jnp.where(take_fit, e0f, ep0))
    ep1 = jnp.where(take_same, avg, jnp.where(take_fit, e1f, ep1))

    lm0 = l1 * ls_weight
    lm1 = m1 * ls_weight
    lm2 = r1 * ls_weight
    ls_det = lm0 * lm2 - lm1 * lm1
    ls_mss = lm0 * lm0 + 2 * lm1 * lm1 + lm2 * lm2
    se0 = (lm2 * sv0 - lm1 * sv1) / ls_det
    se1 = (lm0 * sv1 - lm1 * sv0) / ls_det
    ls_ok = ((jnp.abs(ls_det) > ls_mss * 1e-4)
             & ~jnp.isnan(se0) & ~jnp.isnan(se1) & (se0 < se1))
    sdsm = scale_dir * se1[..., None]
    rgbs_fit = jnp.concatenate(
        [sdsm, (se0 / jnp.where(se1 != 0, se1, 1.0))[..., None]], -1)
    rgbs = jnp.where(allsame1,
                     jnp.concatenate([sds, jnp.ones((N, 1))], -1),
                     jnp.where(ls_ok[..., None], rgbs_fit, rgbs))

    # Plane 2 lane (== p2c)
    allsame2 = (wmin2 >= wmax2 * 0.999)[:, None]
    e0f2, e1f2, okf2 = solve(l2, m2, r2)
    take_same2 = allsame2 & p2_mask & notnan
    take_fit2 = ~allsame2 & p2_mask & okf2
    ep0 = jnp.where(take_same2, avg, jnp.where(take_fit2, e0f2, ep0))
    ep1 = jnp.where(take_same2, avg, jnp.where(take_fit2, e1f2, ep1))

    rgbo = jnp.zeros_like(ep0)
    if is_hdr:
        wws = www * cw
        rsel = jnp.where(p2_mask, r2[:, None], r1[:, None])
        psum = jnp.sum(rsel[..., :3] * cw[..., :3], -1)
        rgbq = cvx + cvy
        rgbq = rgbq.at[..., 3].set(jnp.sum(cvy[..., :3], -1))
        rgbo = _compute_rgbo(rgba_weight_sum * jnp.ones((N, 1)), wws, rgbq,
                             psum)
        bad = jnp.isnan(jnp.sum(rgbo * rgbo, -1))
        avgdif = jnp.maximum(
            jnp.sum(ep1[..., :3] - ep0[..., :3], -1) / 3.0, 0.0)
        avg2 = (ep0 + ep1) * 0.5
        ep0b = avg2 - avgdif[..., None] * 0.5
        fb = jnp.concatenate([ep0b[..., :3], avgdif[..., None]], -1)
        rgbo = jnp.where(bad[..., None], fb, rgbo)

    return {"ep0": ep0, "ep1": ep1, "rgbs": rgbs, "rgbo": rgbo}


def _compute_rgbo(rgba_ws, wws, rgbq_sum, psum):
    """Structured 4x4 inverse for the HDR RGBO solve (reference: :1099-1143)."""
    X = rgba_ws[..., 0]
    Y = rgba_ws[..., 1]
    Z = rgba_ws[..., 2]
    P = wws[..., 0]
    Q = wws[..., 1]
    R = wws[..., 2]
    S = psum

    PP = P * P
    QQ = Q * Q
    RR = R * R

    SZmRR = S * Z - RR
    DT = SZmRR * Y - Z * QQ
    YP = Y * P
    QX = Q * X
    YX = Y * X
    mZYP = -Z * YP
    mZQX = -Z * QX
    mRYX = -R * YX
    ZQP = Z * Q * P
    RYP = R * YP
    RQX = R * QX

    rdet = 1.0 / (DT * X + mZYP * P)

    mat0 = jnp.stack([DT, ZQP, RYP, mZYP], -1)
    mat1 = jnp.stack([ZQP, SZmRR * X - Z * PP, RQX, mZQX], -1)
    mat2 = jnp.stack([RYP, RQX, (S * Y - QQ) * X - Y * PP, mRYX], -1)
    mat3 = jnp.stack([mZYP, mZQX, mRYX, Z * YX], -1)
    vect = rgbq_sum * rdet[..., None]

    return jnp.stack([
        jnp.sum(mat0 * vect, -1),
        jnp.sum(mat1 * vect, -1),
        jnp.sum(mat2 * vect, -1),
        jnp.sum(mat3 * vect, -1)], -1)
