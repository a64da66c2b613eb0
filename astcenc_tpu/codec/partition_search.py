"""Candidate partitioning search, batched.

TPU redesign of find_best_partition_candidates
(reference: Source/astcenc_find_best_partitioning.cpp): 3-pass k-means over
every block at once, coverage-bitmap mismatch ranking against all selected
partitionings via vectorized popcounts, and the two-line (uncorrelated /
same-chroma) error rank of the top candidates.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops import gather_pallas as gather_ops
from ..ops import ideal as ideal_ops
from ..ops import psearch_pallas as psearch_ops
from ..ops import refine_pallas as refine_ops

_CLUSTER_CUTOFFS = np.array([
    0.626220, 0.932770, 0.275454,
    0.318558, 0.240113, 0.009190,
    0.347661, 0.731960, 0.156391], dtype=np.float32)


def _kmeans(texels, cw, texel_count: int, partition_count: int):
    """3 rounds of k-means (reference: compute_kmeans_partition_ordering)."""
    N, T, _ = texels.shape
    cwj = jnp.asarray(cw, jnp.float32)
    cw_t = cwj[:, None, :] if cwj.ndim == 2 else cwj
    cw_tk = cwj[:, None, None, :] if cwj.ndim == 2 else cwj

    def dist_to(center):
        d = texels - center[:, None, :]
        return jnp.sum(d * d * cw_t, axis=-1)  # (N, T)

    # kmeans_init (reference: :60-135)
    sample0 = 145897 % texel_count
    centers = [texels[:, sample0, :]]
    distances = dist_to(centers[0])
    cutoff_idx = 3 * (partition_count - 2)

    for k in range(1, partition_count):
        dsum = jnp.sum(distances, axis=-1)
        dcut = dsum * float(_CLUSTER_CUTOFFS[cutoff_idx])
        cutoff_idx += 1
        csum = jnp.cumsum(distances, axis=-1)
        # First index where running sum >= cutoff (reference scans and breaks)
        reached = csum >= dcut[:, None]
        sample = jnp.argmax(reached, axis=-1)
        sample = jnp.where(jnp.any(reached, axis=-1), sample, texel_count - 1)
        center = jnp.take_along_axis(
            texels, sample[:, None, None], axis=1)[:, 0]
        centers.append(center)
        distances = jnp.minimum(distances, dist_to(center))

    centers = jnp.stack(centers, axis=1)  # (N, K, 4)

    def assign(centers):
        d = texels[:, :, None, :] - centers[:, None, :, :]
        dist = jnp.sum(d * d * cw_tk, axis=-1)    # (N, T, K)
        part = jnp.argmin(dist, axis=-1)          # first-min = reference
        # Fix empty partitions: assign texel i to partition i, repeated
        # (reference: kmeans_assign :184-198). Two sweeps suffice for K<=4.
        for _ in range(partition_count):
            counts = jnp.stack([(part == k).sum(-1)
                                for k in range(partition_count)], -1)
            for k in range(partition_count):
                empty = counts[:, k] == 0
                part = jnp.where(
                    empty[:, None] & (jnp.arange(T)[None, :] == k), k, part)
                counts = jnp.stack([(part == kk).sum(-1)
                                    for kk in range(partition_count)], -1)
        return part

    part = assign(centers)
    for _ in range(2):
        # kmeans_update: center of gravity
        oh = (part[..., None] == jnp.arange(partition_count)).astype(jnp.float32)
        sums = jnp.einsum("ntk,ntc->nkc", oh, texels)
        cnts = jnp.maximum(oh.sum(1), 1.0)
        centers = sums / cnts[..., None]
        part = assign(centers)
    return part


def _popc_xor(a, b):
    """Popcount of XOR between (N, 64) and (Q, 64) -> (N, Q)."""
    diff = a[:, None, :] ^ b[None, :, :]
    return diff.sum(-1)


def partition_mismatch(akm, cov, partition_count: int):
    """Mismatch counts vs every selected partitioning.

    Args:
      akm: (N, 4, 64) bool kmeans coverage bitmaps.
      cov: (Q, 4, 64) bool table coverage bitmaps.

    Returns (N, Q) int mismatch counts (already divided by 2).
    Reference: partition_mismatch{2,3,4} (:253-353).
    """
    p = {}
    for i in range(partition_count):
        for j in range(partition_count):
            p[(i, j)] = _popc_xor(akm[:, i].astype(jnp.int32),
                                  cov[:, j].astype(jnp.int32))

    if partition_count == 2:
        v1 = p[(0, 0)] + p[(1, 1)]
        v2 = p[(0, 1)] + p[(1, 0)]
        return jnp.minimum(v1, v2) // 2

    if partition_count == 3:
        v0 = jnp.minimum(p[(1, 1)] + p[(2, 2)], p[(1, 2)] + p[(2, 1)]) + p[(0, 0)]
        v1 = jnp.minimum(p[(1, 0)] + p[(2, 2)], p[(1, 2)] + p[(2, 0)]) + p[(0, 1)]
        v2 = jnp.minimum(p[(1, 0)] + p[(2, 1)], p[(1, 1)] + p[(2, 0)]) + p[(0, 2)]
        return jnp.minimum(jnp.minimum(v0, v1), v2) // 2

    mx23 = jnp.minimum(p[(2, 2)] + p[(3, 3)], p[(2, 3)] + p[(3, 2)])
    mx13 = jnp.minimum(p[(2, 1)] + p[(3, 3)], p[(2, 3)] + p[(3, 1)])
    mx12 = jnp.minimum(p[(2, 1)] + p[(3, 2)], p[(2, 2)] + p[(3, 1)])
    mx03 = jnp.minimum(p[(2, 0)] + p[(3, 3)], p[(2, 3)] + p[(3, 0)])
    mx02 = jnp.minimum(p[(2, 0)] + p[(3, 2)], p[(2, 2)] + p[(3, 0)])
    mx01 = jnp.minimum(p[(2, 1)] + p[(3, 0)], p[(2, 0)] + p[(3, 1)])

    def min3(a, b, c):
        return jnp.minimum(jnp.minimum(a, b), c)

    v0 = p[(0, 0)] + min3(p[(1, 1)] + mx23, p[(1, 2)] + mx13, p[(1, 3)] + mx12)
    v1 = p[(0, 1)] + min3(p[(1, 0)] + mx23, p[(1, 2)] + mx03, p[(1, 3)] + mx02)
    v2 = p[(0, 2)] + min3(p[(1, 1)] + mx03, p[(1, 0)] + mx13, p[(1, 3)] + mx01)
    v3 = p[(0, 3)] + min3(p[(1, 1)] + mx02, p[(1, 2)] + mx01, p[(1, 0)] + mx12)
    return min3(min3(v0, v1, v2), v3, v3) // 2


def find_best_partition_candidates(st, bsd, cw, partition_count: int,
                                   partition_search_limit: int,
                                   requested_candidates: int):
    """Top partitioning candidates per block.

    Returns:
      (cand_seeds (N, C) int32 raw seeds, cand_valid (N, C) bool)
    Reference: find_best_partition_candidates (:551-779).
    """
    texels = st["texels"]
    N, T, _ = texels.shape
    cw_scale = st.get("cw_scale")
    if cw_scale is not None:
        # Per-block channel weights (USE_ALPHA_WEIGHT): rgb lanes scaled by
        # the block's max alpha (reference: astcenc_entry.cpp:1016-1035).
        s = cw_scale
        cw_eff = jnp.stack([s * cw[0], s * cw[1], s * cw[2],
                            jnp.full_like(s, jnp.float32(cw[3]))], axis=1)
    else:
        cw_eff = cw
    parts = bsd.partitionings[partition_count]
    q_sel = parts["count_selected"]
    search = min(partition_search_limit, q_sel)
    reqc = min(requested_candidates, search)

    texels_per_block = bsd.texel_count
    wie = 0.055
    if texels_per_block <= 20:
        wie = 0.03
    elif texels_per_block <= 31:
        wie = 0.04
    elif texels_per_block <= 41:
        wie = 0.05
    wie = wie * wie

    # --- k-means ordering -----------------------------------------------------
    km_part = _kmeans(texels, cw_eff, bsd.texel_count, partition_count)
    kt = jnp.asarray(bsd.kmeans_texels.astype(np.int32))
    km_at = km_part[:, kt]                                   # (N, <=64)
    nk = kt.shape[0]
    # Coverage bitmap as a broadcast compare — a scatter here lowers to a
    # sort-based emulation on TPU.
    km_pad = jnp.full((N, 64), -1, km_at.dtype).at[:, :nk].set(km_at)
    akm = (km_pad[:, None, :]
           == jnp.arange(4, dtype=km_at.dtype)[None, :, None])  # (N, 4, 64)

    cov = jnp.asarray(parts["coverage"])                      # (Q, 4, 64)
    mism = partition_mismatch(akm, cov, partition_count)      # (N, Q)

    # Counting-sort order == stable argsort by mismatch, index ascending
    order = jnp.argsort(mism, axis=-1, stable=True)           # (N, Q)
    top = order[:, :search]                                   # packed indices

    # --- Line-error ranking of the top candidates ----------------------------
    pot_all = jnp.asarray(parts["partition_of_texel"].astype(np.int32))
    ptc_all = jnp.asarray(parts["partition_texel_count"].astype(np.int32))
    seeds_all = jnp.asarray(parts["seed"].astype(np.int32))

    uses_alpha = st["uses_alpha"]  # (N,) bool
    cwj = jnp.asarray(cw_eff, jnp.float32)

    S = search
    if gather_ops._use_pallas() and T <= 144:
        # Kernel-fused ranking: texels are read once per block tile instead
        # of materializing the (N*S, T, 4) candidate-folded tensors.
        potS = pot_all[top]                                  # (N, S, T)
        texk = refine_ops.pack_tex(texels)
        uncor, samec = psearch_ops.line_errors(
            potS, texk, uses_alpha, partition_count, wie, cw,
            cw_scale=cw_scale)
        return _select_candidates(uncor, samec, seeds_all, top, N, S, reqc)

    # Vectorize the detailed ranking over all top candidates at once by
    # folding the candidate axis into the batch axis.
    pot = pot_all[top].reshape(N * S, T)
    counts_f = ptc_all[top].reshape(N * S, 4).astype(jnp.float32)
    tex_rep = jnp.broadcast_to(texels[:, None], (N, S, T, 4)).reshape(
        N * S, T, 4)
    if cwj.ndim == 2:
        cw_f = jnp.broadcast_to(cwj[:, None, :], (N, S, 4)).reshape(
            N * S, 1, 4)
    else:
        cw_f = cwj
    pmask = ideal_ops.partition_onehot(pot)

    def line_errors(comp_mask):
        avg, dirv = ideal_ops.avgs_and_dirs(tex_rep, pmask, comp_mask)
        cm = jnp.array(comp_mask, jnp.float32)
        uncor_b = ideal_ops._normalize_safe(dirv, comp_mask)
        samec_b = ideal_ops._normalize_safe(avg * cm, comp_mask)
        d = jnp.sum(avg * uncor_b * cm, -1, keepdims=True)
        uncor_amod = avg - uncor_b * d

        b_t = jnp.einsum("ntp,npc->ntc", pmask, uncor_b)
        am_t = jnp.einsum("ntp,npc->ntc", pmask, uncor_amod)
        param_u = jnp.sum(tex_rep * b_t * cm, -1)
        dist_u = am_t + param_u[..., None] * b_t - tex_rep
        err_u = jnp.sum(dist_u * dist_u * cw_f * cm, -1)

        bs_t = jnp.einsum("ntp,npc->ntc", pmask, samec_b)
        param_s = jnp.sum(tex_rep * bs_t * cm, -1)
        dist_s = param_s[..., None] * bs_t - tex_rep
        err_s = jnp.sum(dist_s * dist_s * cw_f * cm, -1)

        uncor_err = err_u.sum(-1)
        samec_err = err_s.sum(-1)

        # Line lengths from the uncorrelated param range per partition
        big = 1e10
        inpart = pmask.transpose(0, 2, 1) > 0
        lo = jnp.min(jnp.where(inpart, param_u[:, None, :], big), 2)
        hi = jnp.max(jnp.where(inpart, param_u[:, None, :], -big), 2)
        ll = jnp.maximum(hi - lo, 1e-7)                   # (NS, P)

        ew = counts_f * wie
        lsq = ll * ll
        u_extra = jnp.sum(jnp.sum((uncor_b * cm) ** 2, -1) * lsq * ew, -1)
        s_extra = jnp.sum(jnp.sum((samec_b * cm) ** 2, -1) * lsq * ew, -1)
        return uncor_err + u_extra, samec_err + s_extra

    u4, s4 = line_errors((1, 1, 1, 1))
    u3, s3 = line_errors((1, 1, 1, 0))
    ua_rep = jnp.repeat(uses_alpha, S)
    uncor = jnp.where(ua_rep, u4, u3).reshape(N, S)
    samec = jnp.where(ua_rep, s4, s3).reshape(N, S)
    return _select_candidates(uncor, samec, seeds_all, top, N, S, reqc)


def _select_candidates(uncor, samec, seeds_all, top, N, S, reqc):
    """Keep the best `reqc` of each metric, interleave, dedup by seed."""
    u_order = jnp.argsort(uncor, axis=-1, stable=True)[:, :reqc]
    s_order = jnp.argsort(samec, axis=-1, stable=True)[:, :reqc]
    u_seeds = seeds_all[jnp.take_along_axis(top, u_order, 1)]
    s_seeds = seeds_all[jnp.take_along_axis(top, s_order, 1)]

    inter = jnp.stack([u_seeds, s_seeds], -1).reshape(N, 2 * reqc)
    # Dedup keeping first occurrence
    eq_prev = inter[:, :, None] == inter[:, None, :]
    first_dup = jnp.triu(eq_prev, k=1).any(1)                  # seen earlier
    keep = ~first_dup
    # Stable-compact the kept seeds to the front
    key = jnp.where(keep, 0, 1) * (2 * reqc) + jnp.arange(2 * reqc)[None, :]
    perm = jnp.argsort(key, axis=-1, stable=True)
    seeds_sorted = jnp.take_along_axis(inter, perm, 1)[:, :reqc]
    nkeep = keep.sum(-1)
    valid = jnp.arange(reqc)[None, :] < jnp.minimum(nkeep, reqc)[:, None]
    return seeds_sorted, valid
