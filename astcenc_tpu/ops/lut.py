"""Gather-free table lookups for TPU.

XLA lowers `take_along_axis` / fancy indexing with per-element indices to a
`gather` HLO, which the TPU backend executes (near-)scalarized: profiling the
encoder showed gathers at 96% of device time while every dot/elementwise op
ran at full rate. These helpers re-express small-table lookups as select
chains and one-hot contractions, which stay on the VPU/MXU.

Three shapes of problem, three tools:

* `lookup_span(table, idx, L)` — select-chain over a static span L (<= ~64).
  `table` must broadcast against `idx` with a trailing axis of size L;
  each chain step is a fused compare+select, so the whole lookup compiles
  to one elementwise fusion.
* `lookup_rows(rows, idx, a, b)` — per-row tables: `rows` is (..., L[, C])
  holding a distinct table per batch element, `idx` is (..., K) of indices
  into L. Factors L as a*b and contracts two one-hot tensors against the
  reshaped rows (batched matmul + weighted sum), never materializing a
  (batch, K, L) anything.
* `onehot(idx, L)` — float one-hot for einsum-style selection, exact for
  integer payloads below 2^24.

Reference behavior being replaced: the vtable_* SIMD lookups of
Source/astcenc_vecmathlib.h and the scalar LUT indexing throughout
astcenc_ideal_endpoints_and_weights.cpp / astcenc_compress_symbolic.cpp.
"""

from __future__ import annotations

import jax.numpy as jnp


def onehot(idx, L: int, dtype=jnp.float32):
    """(idx[..., None] == arange(L)) as dtype; exact selector for einsums."""
    return (idx[..., None] == jnp.arange(L, dtype=idx.dtype)).astype(dtype)


def lookup_span(table, idx, L: int):
    """out[...] = table[..., idx[...]] via an L-step select chain.

    Args:
      table: array broadcastable to idx.shape + (L,) (e.g. (M, L) against
        idx (N, M, W) after table[None, :, None, :] by the caller — here the
        caller passes `table` already shaped so table[..., k] broadcasts
        against idx).
      idx: integer array of indices in [0, L).
      L: static table span.

    Returns array of idx.shape with table's dtype.
    """
    acc = None
    for k in range(L):
        tk = table[..., k]
        term = jnp.where(idx == k, tk, jnp.zeros_like(tk))
        acc = term if acc is None else acc + term
    return acc


def _factor(L: int, a: int | None):
    if a is None:
        a = 1
        while a * a < L:
            a *= 2
    b = -(-L // a)
    return a, b


def lookup_rows(rows, idx, a: int | None = None):
    """Per-row table lookup: out[..., k(, c)] = rows[..., idx[..., k](, c)].

    Args:
      rows: (..., L) or (..., L, C) — one table per leading-batch element.
      idx: (..., K) integer indices into L (same leading batch shape).
      a: optional static factor; L is padded to a*b with b = ceil(L/a).

    Returns (..., K) or (..., K, C).
    """
    has_c = rows.ndim == idx.ndim + 1
    if not has_c:
        rows = rows[..., None]
    L, C = rows.shape[-2], rows.shape[-1]
    a_, b = _factor(L, a)
    pad = a_ * b - L
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros(rows.shape[:-2] + (pad, C), rows.dtype)],
            axis=-2)
    rowr = rows.reshape(rows.shape[:-2] + (a_, b, C)).astype(jnp.float32)

    idx = jnp.clip(idx, 0, L - 1)
    oh_hi = onehot(idx // b, a_)                       # (..., K, a)
    oh_lo = onehot(idx % b, b)                         # (..., K, b)
    # (..., K, a) x (..., a, b*C) -> (..., K, b*C)
    t = jnp.einsum("...ka,...abc->...kbc", oh_hi, rowr)
    out = jnp.einsum("...kb,...kbc->...kc", oh_lo, t)
    if not has_c:
        return out[..., 0]
    return out


def lookup_const(table, idx, a: int | None = None):
    """Constant-table lookup out[...] = table[idx[...](, :)] without gather.

    Args:
      table: (L,) or (L, C) constant table (any numeric dtype).
      idx: integer array.
      a: optional factor override.

    Returns idx.shape (+ (C,)) float32 — callers cast back as needed.
    """
    table = jnp.asarray(table)
    has_c = table.ndim == 2
    if not has_c:
        table = table[:, None]
    L, C = table.shape
    a_, b = _factor(L, a)
    pad = a_ * b - L
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad, C), table.dtype)], axis=0)
    tr = table.reshape(a_, b * C).astype(jnp.float32)

    idx = jnp.clip(idx, 0, L - 1)
    oh_hi = onehot(idx // b, a_)                       # (..., a)
    t = oh_hi @ tr                                     # (..., b*C)
    t = t.reshape(t.shape[:-1] + (b, C))
    oh_lo = onehot(idx % b, b)
    out = jnp.einsum("...b,...bc->...c", oh_lo, t)
    if not has_c:
        return out[..., 0]
    return out
