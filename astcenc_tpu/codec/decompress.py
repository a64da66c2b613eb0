"""Batched physical-block decoding, fully vectorized under jit.

TPU-native redesign of the reference decode path (physical_to_symbolic,
reference: Source/astcenc_symbolic_physical.cpp:291-556, and
decompress_symbolic_block, Source/astcenc_decompress_symbolic.cpp:170-308):
instead of per-block branching, every block in a (N, 16)-byte batch flows
through the same gather/ALU pipeline, with invalid or constant-color blocks
resolved by masks at the end. Bit-exact against the reference decoder
(tests/test_decode.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import color_unquant as cuq
from ..ops import softfloat as sf
from .decode_tables import (C_QUINT_PAD, C_SLOTS, C_TRIT_PAD, W_QUINT_PAD,
                            W_SLOTS, W_TRIT_PAD, DecodeTables)

_ERROR_NAN_BITS = np.uint32(0xFFFFE000)


def _bitplane(pcb: jnp.ndarray) -> jnp.ndarray:
    """(N, 16) uint8 -> (N, 128) int32 bit plane, LSB-first per byte."""
    bits = (pcb[:, :, None].astype(jnp.int32) >> jnp.arange(8, dtype=jnp.int32)) & 1
    return bits.reshape(pcb.shape[0], 128)


def _read_static(bp: jnp.ndarray, off: int, n: int) -> jnp.ndarray:
    """Read an n-bit little-endian field at a static offset."""
    v = jnp.zeros(bp.shape[0], jnp.int32)
    for b in range(n):
        v = v | (bp[:, off + b] << b)
    return v


def _read_dyn(bp: jnp.ndarray, off: jnp.ndarray, nmax: int,
              nbits: jnp.ndarray | int) -> jnp.ndarray:
    """Read an up-to-nmax-bit field at a traced offset (per block)."""
    idx = jnp.clip(off[:, None] + jnp.arange(nmax, dtype=jnp.int32), 0, 127)
    g = jnp.take_along_axis(bp, idx, axis=1)
    barange = jnp.arange(nmax, dtype=jnp.int32)
    if isinstance(nbits, int):
        mask = barange < nbits
        mask = jnp.broadcast_to(mask, g.shape)
    else:
        mask = barange[None, :] < nbits[:, None]
    return jnp.sum(jnp.where(mask, g << barange, 0), axis=1)


def _extract_fields(bp, offsets, nmax, nbits):
    """Extract per-slot bitfields.

    bp: (N, 128); offsets: (N, S); nbits: (N, 1) or (N, S) traced widths.
    Returns (N, S) int32 values.
    """
    N, S = offsets.shape
    barange = jnp.arange(nmax, dtype=jnp.int32)
    idx = jnp.clip(offsets[..., None] + barange, 0, 127).reshape(N, S * nmax)
    g = jnp.take_along_axis(bp, idx, axis=1).reshape(N, S, nmax)
    mask = barange[None, None, :] < nbits[..., None]
    return jnp.sum(jnp.where(mask, g << barange, 0), axis=2)


def _group_codes(tvals, shifts, group, pad):
    """Combine per-value trit/quint field bits into per-group codes."""
    N, S = tvals.shape
    contrib = tvals << shifts
    contrib = jnp.pad(contrib, ((0, 0), (0, pad - S)))
    return contrib.reshape(N, pad // group, group).sum(axis=2)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def decompress_symbolic_batch(tables_key, pcb, profile: int, decode_unorm8: bool):
    """Decode a batch of physical ASTC blocks to texel colors.

    Args:
      tables_key: hashable wrapper carrying the DecodeTables (static).
      pcb: (N, 16) uint8 physical blocks.
      profile: decode profile (cuq.PRF_*), static.
      decode_unorm8: round decode through unorm8, static.

    Returns:
      (N, T, 4) float32 texel colors (NaN error color for invalid blocks).
    """
    t: DecodeTables = tables_key.tables
    N = pcb.shape[0]
    T = t.texel_count
    is_3d = t.dim[2] > 1

    bp = _bitplane(pcb)
    bp_rev = bp[:, ::-1]

    block_mode = _read_static(bp, 0, 11)

    # ---- Constant color blocks (void extent) ------------------------------
    is_const = (block_mode & 0x1FF) == 0x1FC
    const_f16 = (block_mode & 0x200) != 0
    ccol = jnp.stack([
        pcb[:, 8].astype(jnp.int32) | (pcb[:, 9].astype(jnp.int32) << 8),
        pcb[:, 10].astype(jnp.int32) | (pcb[:, 11].astype(jnp.int32) << 8),
        pcb[:, 12].astype(jnp.int32) | (pcb[:, 13].astype(jnp.int32) << 8),
        pcb[:, 14].astype(jnp.int32) | (pcb[:, 15].astype(jnp.int32) << 8),
    ], axis=-1)

    if not is_3d:
        rsv = _read_static(bp, 10, 2)
        vx_ls = _read_static(bp, 12, 13)
        vx_hs = _read_static(bp, 25, 13)
        vx_lt = _read_static(bp, 38, 13)
        vx_ht = _read_static(bp, 51, 13)
        all_ones = ((vx_ls == 0x1FFF) & (vx_hs == 0x1FFF)
                    & (vx_lt == 0x1FFF) & (vx_ht == 0x1FFF))
        const_err = (rsv != 3) | (((vx_ls >= vx_hs) | (vx_lt >= vx_ht)) & ~all_ones)
    else:
        vx = [_read_static(bp, 10 + 9 * i, 9) for i in range(6)]
        all_ones = functools.reduce(jnp.logical_and,
                                    [v == 0x1FF for v in vx])
        const_err = (((vx[0] >= vx[1]) | (vx[2] >= vx[3]) | (vx[4] >= vx[5]))
                     & ~all_ones)

    # ---- Non-constant header decode ---------------------------------------
    pidx_tbl = jnp.asarray(t.block_mode_packed_index)
    pidx = pidx_tbl[block_mode]
    bad_mode = pidx == 0xFFFF
    pidx_c = jnp.clip(pidx, 0, t.bm_quant.shape[0] - 1)

    wq = jnp.asarray(t.bm_quant)[pidx_c]
    dual = jnp.asarray(t.bm_dual)[pidx_c]
    wb = jnp.asarray(t.bm_weight_bits)[pidx_c]
    dm = jnp.asarray(t.bm_decimation_mode)[pidx_c]

    pc = _read_static(bp, 11, 2) + 1
    partition_index = jnp.where(pc > 1, _read_static(bp, 13, 10), 0)

    # ---- Weight stream decode ---------------------------------------------
    w_bits = jnp.asarray(t.w_bits)[pidx_c][:, None]          # (N, 1)
    w_class = jnp.asarray(t.w_class)[pidx_c]
    w_m_off = jnp.asarray(t.w_m_off)[pidx_c]
    w_t_off = jnp.asarray(t.w_t_off)[pidx_c]
    w_t_bits = jnp.asarray(t.w_t_bits)[pidx_c]
    w_t_shift = jnp.asarray(t.w_t_shift)[pidx_c]

    m_vals = _extract_fields(bp_rev, w_m_off, 6, jnp.broadcast_to(w_bits, w_m_off.shape))
    tq_vals = _extract_fields(bp_rev, w_t_off, 3, w_t_bits)

    T_trit = _group_codes(tq_vals, w_t_shift, 5, W_TRIT_PAD)
    T_quint = _group_codes(tq_vals, w_t_shift, 3, W_QUINT_PAD)

    hi_trit = jnp.asarray(t.trits_of_integer)[T_trit].reshape(N, W_TRIT_PAD)[:, :W_SLOTS]
    hi_quint = jnp.asarray(t.quints_of_integer)[T_quint].reshape(N, W_QUINT_PAD)[:, :W_SLOTS]
    hi = jnp.where(w_class[:, None] == 1, hi_trit,
                   jnp.where(w_class[:, None] == 2, hi_quint, 0))

    wsym = m_vals | (hi << w_bits)
    wuq = jnp.asarray(t.weight_unquant)
    w64 = wuq[wq[:, None], jnp.clip(wsym, 0, 31)]            # (N, 64) in 0..64

    # Dual-plane de-interleave (plane2 lives in the odd slots)
    p1 = jnp.where(dual[:, None] == 1,
                   jnp.concatenate([w64[:, 0::2], jnp.zeros((N, 32), w64.dtype)], 1),
                   w64)
    p2 = jnp.concatenate([w64[:, 1::2], jnp.zeros((N, 32), w64.dtype)], 1)

    # ---- Undecimate weights (integer bilinear infill) ----------------------
    tw = jnp.asarray(t.dec_texel_weights)[dm]     # (N, 4, T)
    con = jnp.asarray(t.dec_texel_contribs)[dm]   # (N, 4, T)

    def infill(plane):
        g = jnp.take_along_axis(plane, tw.reshape(N, 4 * T), axis=1).reshape(N, 4, T)
        return (8 + jnp.sum(g * con, axis=1)) >> 4            # (N, T)

    wt1 = infill(p1)
    wt2 = infill(p2)

    # ---- Color endpoint mode decode ----------------------------------------
    ehs = jnp.where(pc > 1, 3 * pc - 4, 0)
    below = 128 - wb - ehs
    et_low = _read_static(bp, 23, 6)
    et_high = _read_dyn(bp, below, 8, ehs)
    encoded_type = et_low | (et_high << 6)
    baseclass = encoded_type & 0x3
    matched = (baseclass == 0) & (pc > 1)

    lanes = jnp.arange(4, dtype=jnp.int32)[None, :]
    fmt_matched = jnp.broadcast_to(((encoded_type >> 2) & 0xF)[:, None], (N, 4))
    bclass = jnp.maximum(baseclass - 1, 0)
    fmt_un = ((((encoded_type[:, None] >> (2 + lanes)) & 1) + bclass[:, None]) << 2)
    fmt_un = fmt_un | ((encoded_type[:, None] >> (2 + pc[:, None] + 2 * lanes)) & 3)
    fmt_multi = jnp.where(matched[:, None], fmt_matched, fmt_un)
    fmt_single = jnp.broadcast_to(_read_static(bp, 13, 4)[:, None], (N, 4))
    fmt = jnp.where((pc == 1)[:, None], fmt_single, fmt_multi)
    # Lanes beyond partition count are don't-care; zero them for safety
    fmt = jnp.where(lanes < pc[:, None], fmt, 0)

    below_final = jnp.where(matched, below + ehs, below)
    ehs_final = jnp.where(matched, 0, ehs)

    icount = jnp.sum(jnp.where(lanes < pc[:, None], ((fmt >> 2) + 1) * 2, 0), axis=1)

    color_bits_arr = jnp.array([0, 111, 99, 99, 99], jnp.int32)
    color_bits = color_bits_arr[pc] - wb - ehs_final - jnp.where(dual == 1, 2, 0)
    color_bits = jnp.clip(color_bits, 0, 127)
    cquant = jnp.asarray(t.quant_mode_table)[jnp.clip(icount >> 1, 0, 9), color_bits]

    plane2_component = jnp.where(dual == 1, _read_dyn(bp, below_final - 2, 2, 2), -1)

    bad = bad_mode | ((dual == 1) & (pc == 4)) | (icount > 18) | (cquant < 4)

    # Partition row lookup; unknown partitionings only occur for contexts
    # built with can_omit (self-decompress), where row_map holds -1.
    row_map = jnp.asarray(t.partition_row_map)
    prow = jnp.where(pc == 1, 0,
                     row_map[jnp.clip(pc - 2, 0, 2), partition_index])
    bad = bad | (prow < 0)
    prow = jnp.maximum(prow, 0)

    # ---- Color integer stream decode ---------------------------------------
    combo = jnp.clip((cquant - 4) * 9 + ((icount >> 1) - 1), 0, 152)
    c_bits = jnp.asarray(t.c_bits)[combo][:, None]
    c_class = jnp.asarray(t.c_class)[combo]
    base_off = jnp.where(pc == 1, 17, 29)[:, None]
    c_m_off = jnp.asarray(t.c_m_off)[combo] + base_off
    c_t_off = jnp.asarray(t.c_t_off)[combo] + base_off
    c_t_bits = jnp.asarray(t.c_t_bits)[combo]
    c_t_shift = jnp.asarray(t.c_t_shift)[combo]

    cm = _extract_fields(bp, c_m_off, 8, jnp.broadcast_to(c_bits, c_m_off.shape))
    ctq = _extract_fields(bp, c_t_off, 3, c_t_bits)
    cT_trit = _group_codes(ctq, c_t_shift, 5, C_TRIT_PAD)
    cT_quint = _group_codes(ctq, c_t_shift, 3, C_QUINT_PAD)
    chi_t = jnp.asarray(t.trits_of_integer)[cT_trit].reshape(N, C_TRIT_PAD)[:, :C_SLOTS]
    chi_q = jnp.asarray(t.quints_of_integer)[cT_quint].reshape(N, C_QUINT_PAD)[:, :C_SLOTS]
    chi = jnp.where(c_class[:, None] == 1, chi_t,
                    jnp.where(c_class[:, None] == 2, chi_q, 0))
    csym = cm | (chi << c_bits)
    cunq = jnp.asarray(t.color_unquant)
    cvals = cunq[jnp.clip(cquant - 4, 0, 16)[:, None], jnp.clip(csym, 0, 255)]

    # Split the flat value stream into per-partition groups of up to 8
    nvals = jnp.where(lanes < pc[:, None], ((fmt >> 2) + 1) * 2, 0)  # (N, 4)
    starts = jnp.concatenate([jnp.zeros((N, 1), jnp.int32),
                              jnp.cumsum(nvals, axis=1)[:, :3]], axis=1)
    vidx = jnp.clip(starts[:, :, None] + jnp.arange(8, dtype=jnp.int32), 0, C_SLOTS - 1)
    color_values = jnp.take_along_axis(cvals, vidx.reshape(N, 32), axis=1).reshape(N, 4, 8)

    # ---- Endpoint unpack + texel assembly -----------------------------------
    ep0, ep1, rgb_hdr, alpha_hdr = cuq.unpack_color_endpoints(
        profile, fmt, color_values)

    pot = jnp.asarray(t.partition_of_texel_cat)[prow]         # (N, T)
    ep0_t = jnp.take_along_axis(ep0, pot[:, :, None], axis=1)  # (N, T, 4)
    ep1_t = jnp.take_along_axis(ep1, pot[:, :, None], axis=1)
    rgbh_t = jnp.take_along_axis(rgb_hdr, pot, axis=1)         # (N, T)
    ah_t = jnp.take_along_axis(alpha_hdr, pot, axis=1)

    lane4 = jnp.arange(4, dtype=jnp.int32)
    use_p2 = (lane4[None, None, :] == plane2_component[:, None, None])
    wtex = jnp.where(use_p2, wt2[:, :, None], wt1[:, :, None])  # (N, T, 4)

    color = (ep0_t * (64 - wtex) + ep1_t * wtex + 32) >> 6

    u8_mask = decode_unorm8 or profile == cuq.PRF_LDR_SRGB
    if u8_mask:
        color = (color >> 8) * 257

    lns_mask = jnp.stack([rgbh_t, rgbh_t, rgbh_t, ah_t], axis=-1)
    f16 = jnp.where(lns_mask, sf.lns_to_sf16(color), sf.unorm16_to_sf16(color))
    out = sf.float16_to_float(f16)

    # ---- Constant color resolution ------------------------------------------
    if u8_mask:
        ccol_u8 = (ccol >> 8) * 257
    else:
        ccol_u8 = ccol
    const_u16_out = sf.float16_to_float(sf.unorm16_to_sf16(ccol_u8))
    if profile in (cuq.PRF_HDR, cuq.PRF_HDR_RGB_LDR_A):
        const_f16_out = sf.float16_to_float(ccol)
    else:
        const_f16_out = jnp.full((N, 4), _ERROR_NAN_BITS.view(np.float32))
    const_out = jnp.where(const_f16[:, None], const_f16_out, const_u16_out)

    err = jnp.where(is_const, const_err, bad)
    out = jnp.where(is_const[:, None, None],
                    jnp.broadcast_to(const_out[:, None, :], out.shape), out)
    out = jnp.where(err[:, None, None],
                    jnp.float32(_ERROR_NAN_BITS.view(np.float32)), out)
    return out


class TablesKey:
    """Hashable wrapper so DecodeTables can be a static jit argument."""

    __slots__ = ("tables", "_id")

    def __init__(self, tables: DecodeTables):
        self.tables = tables
        self._id = id(tables)

    def __hash__(self):
        return self._id

    def __eq__(self, other):
        return isinstance(other, TablesKey) and other._id == self._id
