"""Hardware table gathers for per-row LUT lookups (Pallas/Mosaic TPU).

The encoder's inner loops are LUT-bound: BISE quantizer tables, weight
prev/next transfer tables, per-row color quant rows. XLA lowers per-element
gathers near-scalarized on TPU, so `ops/lut.py` re-expresses them as select
chains / one-hot contractions — correct, but a 256-entry table costs 256
fused compare-selects per element (it dominated the device profile at ~22%).

Mosaic TPU exposes the VPU's in-register shuffle as `tpu.dynamic_gather`,
reachable from Pallas via `jnp.take_along_axis(tab, idx, axis=1)` when
`tab.shape == idx.shape` (jax/_src/pallas/mosaic/lowering.py gather rule).
One hardware gather replaces the whole chain. The op handles one 128-lane
slab at a time, so wider tables loop over slabs with a bounds select —
still O(V/128) instead of O(V) steps.

`row_lookup` below is the public entry: per-row tables of any width, any
leading batch shape, f32/i32 payloads (f32 goes through an i32 bitcast;
dynamic_gather moves bits, so this is exact). On non-TPU backends it falls
back to the one-hot contraction path (`lut_ops.lookup_rows`), keeping CPU
tests and the virtual-mesh path working on identical semantics.

Reference behavior served: the vtable_* SIMD lookups of
Source/astcenc_vecmathlib.h used by astcenc_color_quantize.cpp and
astcenc_compress_symbolic.cpp's realign quant transfer tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lut as lut_ops

_LANES = 128


def _interpret() -> bool:
    """Pallas interpreter mode: lets the kernels run (slowly) on CPU for
    bit-level validation against the XLA formulations (tests/test_pallas)."""
    import os
    return os.environ.get("ASTC_PALLAS_INTERPRET", "") not in ("", "0")


def _kernel_enabled(name: str) -> bool:
    """Per-kernel-family opt-out, read at trace time: set
    ASTC_DISABLE_KERNELS="msearch,refine" to fall back to the XLA
    formulation for those families (debug/bisection aid)."""
    import os
    dis = os.environ.get("ASTC_DISABLE_KERNELS", "")
    return name not in {s.strip() for s in dis.split(",") if s.strip()}


def _use_pallas() -> bool:
    if _interpret():
        return True
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - backend probing never fatal
        return False


def kernel_bt() -> int:
    """Lane-axis tile width (blocks per grid step) for the refine kernel
    family. The kernels are dominated by narrow (rows, BT) row operations,
    so wider tiles amortize per-op issue overhead — but the refine kernels
    hold 3 (T, W, BT) f32 stencil tensors live, and beyond 128 lanes the
    working set exceeds the ~16 MB/core VMEM and spills (measured 1.4x
    slower at 512 on v5e)."""
    import os
    return int(os.environ.get("ASTC_BT", "128"))


def ms_bt(n: int, t: int = 36, m: int = 56) -> int:
    """Lane-axis tile width for the mode-search kernel. At 6x6 -medium
    (T=36, 56 modes) 512-lane tiles fit VMEM and run ~1.7x faster than
    128 on v5e, but the kernel's Mosaic stack scales with the unrolled
    mode count times the (T, BT) plane size: measured OOMs at
    8x8 -medium (109 modes, T=64, BT=512: 69M) and 8x8 -thorough
    (~150 modes, T=64, BT=256: 97M), while 6x6 -thorough (124 modes,
    T=36, BT=512 = 2.29e6) fits. The width halves until m*t*bt is
    within that measured envelope (floor 128 = one lane tile). Narrowed
    further for small batches so padding never exceeds ~2x the real
    lane count. BT only tiles the block axis — results are identical at
    any width."""
    import os
    bt = int(os.environ.get("ASTC_BT_MS", "512"))
    while bt > 128 and m * t * bt > 2_300_000:
        bt //= 2
    while bt > 128 and n <= bt // 2:
        bt //= 2
    return bt


def ms_feasible(t: int, m: int) -> bool:
    """Whether the unrolled mode-search kernel fits Mosaic's scoped-VMEM
    stack at the narrowest tile (BT=128). Past this the per-mode live set
    exceeds the budget no matter the width (measured blow-ups at
    m*t*128 >~ 2.3e6: 12x12 -thorough at 282 modes, 6x6x6 at 435 modes),
    so those configs run the XLA mode-search formulation instead — the
    refine kernel family, whose cost does not scale with mode count,
    still applies."""
    return m * t * 128 <= 2_300_000


def _pad_to(x, axis, mult, value=0):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _kernel(tab_ref, idx_ref, out_ref, *, kslabs: int, vslabs: int):
    tab = tab_ref[:]
    ids = idx_ref[:]
    for ks in range(kslabs):
        sl = slice(ks * _LANES, (ks + 1) * _LANES)
        i = ids[:, sl]
        acc = None
        for vs in range(vslabs):
            rel = i - vs * _LANES
            relc = jnp.clip(rel, 0, _LANES - 1)
            g = jnp.take_along_axis(
                tab[:, vs * _LANES:(vs + 1) * _LANES], relc, axis=1)
            if acc is None:
                acc = g
            else:
                inb = (rel >= 0) & (rel < _LANES)
                acc = jnp.where(inb, g, acc)
        out_ref[:, sl] = acc


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _row_lookup_2d(rows, idx, Vp: int, Kp: int, BT: int):
    """rows (B, Vp) int32, idx (B, Kp) int32 -> (B, Kp) int32."""
    B = rows.shape[0]
    grid = B // BT
    kern = functools.partial(
        _kernel, kslabs=Kp // _LANES, vslabs=Vp // _LANES)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Kp), jnp.int32),
        interpret=_interpret(),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BT, Vp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, Kp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(rows, idx)


def _block_tile(B: int) -> int:
    for bt in (512, 256, 128, 64, 32, 16, 8):
        if B % bt == 0:
            return bt
    return 8


def _master_kernel(vals_ref, mlo_ref, mhi_ref, out_ref, *,
                   kslabs: int, vslabs: int, BT: int, NQ: int, qcol: int):
    # The per-row table index rides along as column `qcol` of vals (avoids
    # a narrow (BT, 1)-blocked operand, which TPU block rules reject).
    ids = vals_ref[:]
    q = ids[:, qcol:qcol + 1]                            # (BT, 1) int32
    oh = (q == jax.lax.broadcasted_iota(
        jnp.int32, (BT, NQ), 1)).astype(jnp.bfloat16)
    # One-hot row select on the MXU; lo/hi payloads are <= 8 bit so the
    # bf16 matmuls are exact.
    lo = jnp.dot(oh, mlo_ref[:], preferred_element_type=jnp.float32)
    hi = jnp.dot(oh, mhi_ref[:], preferred_element_type=jnp.float32)
    rows = lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 8)  # (BT, V)
    for ks in range(kslabs):
        sl = slice(ks * _LANES, (ks + 1) * _LANES)
        i = ids[:, sl]
        acc = None
        for vs in range(vslabs):
            rel = i - vs * _LANES
            relc = jnp.clip(rel, 0, _LANES - 1)
            g = jnp.take_along_axis(
                rows[:, vs * _LANES:(vs + 1) * _LANES], relc, axis=1)
            if acc is None:
                acc = g
            else:
                inb = (rel >= 0) & (rel < _LANES)
                acc = jnp.where(inb, g, acc)
        out_ref[:, sl] = acc


@functools.partial(jax.jit, static_argnums=(3, 4))
def _master_lookup_tpu(vals, mlo, mhi, BT: int, qcol: int):
    B, K = vals.shape
    NQ, V = mlo.shape
    kern = functools.partial(_master_kernel, kslabs=K // _LANES,
                             vslabs=V // _LANES, BT=BT, NQ=NQ, qcol=qcol)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.int32),
        interpret=_interpret(),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NQ, V), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NQ, V), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(vals, mlo, mhi)


def master_lookup(qidx, vals, lo_tab, hi_tab):
    """out[b, k] = lo[q[b], v[b,k]] | hi[q[b], v[b,k]] << 8, TPU-gathered.

    The per-row 256-entry tables never touch HBM: each tile one-hot
    selects its rows from the (NQ, V) masters on the MXU and gathers in
    VMEM. Returns packed int32 (B, K); callers unpack with & 0xFF / >> 8.

    Args:
      qidx: (B,) int32 table-row index in [0, NQ).
      vals: (B, K) int32 values in [0, V).
      lo_tab/hi_tab: (NQ, V) numpy uint8-range tables.
    """
    B, K = vals.shape
    v = jnp.clip(vals, 0, lo_tab.shape[1] - 1).astype(jnp.int32)
    q = jnp.clip(qidx, 0, lo_tab.shape[0] - 1).astype(jnp.int32)
    v = jnp.concatenate([v, q[:, None]], axis=1)         # q rides in col K
    v = _pad_to(v, 1, _LANES)
    v = _pad_to(v, 0, 8)
    Bp = v.shape[0]
    BT = _block_tile(Bp)
    v = _pad_to(v, 0, BT)
    mlo = jnp.asarray(np.asarray(lo_tab, np.float32), jnp.bfloat16)
    mhi = jnp.asarray(np.asarray(hi_tab, np.float32), jnp.bfloat16)
    out = _master_lookup_tpu(v, mlo, mhi, _block_tile(v.shape[0]), K)
    return out[:B, :K]


def row_lookup(rows, idx):
    """out[..., k(, c)] = rows[..., idx[..., k](, c)], hardware-gathered.

    Args:
      rows: (..., V) or (..., V, C) per-row tables, f32 or i32.
      idx: (..., K) integer indices (clipped into [0, V)).

    Returns (..., K) or (..., K, C) with rows' dtype. Drop-in replacement
    for lut_ops.lookup_rows (which remains the non-TPU fallback).
    """
    if not _use_pallas():
        return lut_ops.lookup_rows(rows, idx)

    has_c = rows.ndim == idx.ndim + 1
    if not has_c:
        rows = rows[..., None]
    batch = idx.shape[:-1]
    V, C = rows.shape[-2], rows.shape[-1]
    K = idx.shape[-1]
    B = int(np.prod(batch)) if batch else 1

    dtype = rows.dtype
    r2 = rows.reshape(B, V, C)
    if dtype != jnp.int32:
        r2 = jax.lax.bitcast_convert_type(r2.astype(jnp.float32), jnp.int32)
    i2 = jnp.clip(idx.reshape(B, K), 0, V - 1).astype(jnp.int32)

    i2 = _pad_to(i2, 1, _LANES)
    Kp = i2.shape[1]
    outs = []
    for c in range(C):
        rc = _pad_to(r2[:, :, c], 1, _LANES)
        Vp = rc.shape[1]
        Bp_mult = _block_tile(B) if B % 8 == 0 else 8
        rc = _pad_to(rc, 0, Bp_mult)
        ic = _pad_to(i2, 0, Bp_mult)
        Bp = rc.shape[0]
        out = _row_lookup_2d(rc, ic, Vp, Kp, _block_tile(Bp))
        outs.append(out[:B, :K])
    o = jnp.stack(outs, axis=-1)
    if dtype != jnp.int32:
        o = jax.lax.bitcast_convert_type(o, jnp.float32).astype(dtype)
    o = o.reshape(batch + (K, C))
    return o[..., 0] if not has_c else o
