"""Batched symbolic -> physical 128-bit block packing.

TPU redesign of symbolic_to_physical
(reference: Source/astcenc_symbolic_physical.cpp:102-286): per-block variable
bit layouts become scatter-adds into a (N, 128) bit plane using the same
static per-mode ISE stream descriptors the decoder uses, followed by one
byte-packing reduction. The weight stream is built forward then bit-reversed.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from ..tables import ise, quant
from .decode_tables import (C_QUINT_PAD, C_SLOTS, C_TRIT_PAD, W_QUINT_PAD,
                            W_SLOTS, W_TRIT_PAD, DecodeTables)


@functools.cache
def _weight_scramble_tables():
    t = np.zeros((12, 32), np.int32)
    for q in range(12):
        s = quant.weight_quant_tables(q)["scramble"]
        t[q, :len(s)] = s
    return t


@functools.cache
def _color_pack_tables():
    t = np.zeros((17, 256), np.int32)
    for q in range(ise.QUANT_6, 21):
        t[q - ise.QUANT_6] = quant.color_quant_tables(q)["uquant_to_scrambled_pquant"]
    return t


@functools.cache
def _trit_encode_flat():
    _, enc = ise.trit_tables()
    return enc.reshape(-1).astype(np.int32)  # index t4*81+t3*27+t2*9+t1*3+t0


@functools.cache
def _quint_encode_flat():
    _, enc = ise.quint_tables()
    return enc.reshape(-1).astype(np.int32)  # index q2*25+q1*5+q0


def _scatter_bits(plane, rows, offsets, values, nbits, valid):
    """Set `nbits` bits of `values` at per-element offsets into (N, 128)."""
    K = offsets.shape[1]
    for b in range(nbits):
        bit = (values >> b) & 1
        idx = jnp.clip(offsets + b, 0, 127)
        plane = plane.at[rows, idx].add(jnp.where(valid, bit, 0))
    return plane


def _scatter_bits_var(plane, rows, offsets, values, widths, maxbits, valid):
    for b in range(maxbits):
        bit = (values >> b) & 1
        ok = valid & (b < widths)
        idx = jnp.clip(offsets + b, 0, 127)
        plane = plane.at[rows, idx].add(jnp.where(ok, bit, 0))
    return plane


def _ise_encode_to_plane(plane, rows, symbols, nvals, bits, tclass,
                         m_off, t_off, t_bits, t_shift, base_off,
                         trit_pad, quint_pad, group_sizes):
    """Scatter a BISE stream into the bit plane.

    symbols: (N, S); nvals: (N,) or static; bits: (N, 1) plain bit counts;
    tclass: (N,) 0/1/2; offsets are (N, S) descriptor arrays.
    """
    N, S = symbols.shape
    slot = jnp.arange(S)[None, :]
    valid = slot < (nvals[:, None] if hasattr(nvals, "shape") else nvals)

    m = symbols & ((1 << bits) - 1)
    plane = _scatter_bits_var(plane, rows, base_off + m_off, m,
                              jnp.broadcast_to(bits, m.shape), 8, valid)

    hi = jnp.where(valid, symbols >> bits, 0)

    # Trit groups of 5
    tg5, tg3 = group_sizes
    hi5 = jnp.pad(hi, ((0, 0), (0, trit_pad - S))).reshape(N, trit_pad // 5, 5)
    tidx = (hi5[..., 4] * 81 + hi5[..., 3] * 27 + hi5[..., 2] * 9
            + hi5[..., 1] * 3 + hi5[..., 0])
    T5 = jnp.asarray(_trit_encode_flat())[jnp.clip(tidx, 0, 242)]
    T5 = jnp.repeat(T5, 5, axis=1)[:, :S]

    hi3 = jnp.pad(hi, ((0, 0), (0, quint_pad - S))).reshape(N, quint_pad // 3, 3)
    qidx = hi3[..., 2] * 25 + hi3[..., 1] * 5 + hi3[..., 0]
    T3 = jnp.asarray(_quint_encode_flat())[jnp.clip(qidx, 0, 124)]
    T3 = jnp.repeat(T3, 3, axis=1)[:, :S]

    tcode = jnp.where((tclass == 1)[:, None], T5,
                      jnp.where((tclass == 2)[:, None], T3, 0))
    tval = (tcode >> t_shift) & ((1 << t_bits) - 1)
    plane = _scatter_bits_var(plane, rows, base_off + t_off, tval, t_bits, 3,
                              valid & (tclass != 0)[:, None])
    return plane


def symbolic_to_physical_batch(tables: DecodeTables, scb) -> jnp.ndarray:
    """Pack a batch of symbolic blocks to (N, 16) uint8 physical blocks."""
    t = tables
    N = scb["block_mode"].shape[0]
    rows = jnp.arange(N)[:, None]

    block_mode = scb["block_mode"]
    pc = scb["partition_count"]
    pidx_tbl = jnp.asarray(t.block_mode_packed_index)
    pk = jnp.clip(pidx_tbl[jnp.clip(block_mode, 0, 2047)], 0,
                  t.bm_quant.shape[0] - 1)

    wq = jnp.asarray(t.bm_quant)[pk]
    dual = jnp.asarray(t.bm_dual)[pk]
    wbits_total = jnp.asarray(t.bm_weight_bits)[pk]
    w_count = jnp.asarray(t.w_count)[pk]             # real (interleaved) count

    # --- Weight stream --------------------------------------------------------
    levels_m1 = jnp.asarray(np.array(
        [1, 2, 3, 4, 5, 7, 9, 11, 15, 19, 23, 31], np.float32))[wq]
    uqw = scb["weights"].astype(jnp.float32)         # (N, 64) 0..64
    uqw2 = scb["weights2"].astype(jnp.float32)
    qw1 = jnp.floor(uqw / 64.0 * levels_m1[:, None] + 0.5).astype(jnp.int32)
    qw2 = jnp.floor(uqw2 / 64.0 * levels_m1[:, None] + 0.5).astype(jnp.int32)
    scram = jnp.asarray(_weight_scramble_tables())
    s1 = scram[wq[:, None], jnp.clip(qw1, 0, 31)]
    s2 = scram[wq[:, None], jnp.clip(qw2, 0, 31)]

    # Interleave for dual-plane blocks
    inter = jnp.zeros((N, W_SLOTS), jnp.int32)
    inter = inter.at[:, 0::2].set(s1[:, :32])
    inter = inter.at[:, 1::2].set(s2[:, :32])
    symbols = jnp.where((dual == 1)[:, None], inter, s1)

    wplane = jnp.zeros((N, 128), jnp.int32)
    w_bits = jnp.asarray(t.w_bits)[pk][:, None]
    w_class = jnp.asarray(t.w_class)[pk]
    wplane = _ise_encode_to_plane(
        wplane, rows, symbols, w_count, w_bits, w_class,
        jnp.asarray(t.w_m_off)[pk], jnp.asarray(t.w_t_off)[pk],
        jnp.asarray(t.w_t_bits)[pk], jnp.asarray(t.w_t_shift)[pk],
        jnp.zeros((N, 1), jnp.int32), W_TRIT_PAD, W_QUINT_PAD, (5, 3))

    plane = wplane[:, ::-1]  # weights fill from bit 127 downward

    # --- Header ---------------------------------------------------------------
    plane = _scatter_bits(plane, rows, jnp.zeros((N, 1), jnp.int32),
                          block_mode[:, None], 11,
                          jnp.ones((N, 1), bool))
    plane = _scatter_bits(plane, rows, jnp.full((N, 1), 11),
                          (pc - 1)[:, None], 2, jnp.ones((N, 1), bool))

    fmt = scb["color_formats"]
    matched = scb["color_formats_matched"]
    is_multi = pc > 1

    # Single partition: 4-bit format at 13
    plane = _scatter_bits(plane, rows, jnp.full((N, 1), 13),
                          fmt[:, 0][:, None], 4, (~is_multi)[:, None])

    # Multi partition: 10-bit index at 13 + CEM fields
    plane = _scatter_bits(plane, rows, jnp.full((N, 1), 13),
                          scb["partition_index"][:, None], 10,
                          is_multi[:, None])

    lanes = jnp.arange(4)[None, :]
    in_use = lanes < pc[:, None]
    classes = jnp.where(in_use, fmt >> 2, 4)
    low_class = jnp.min(classes, axis=1)
    low_class = jnp.where(low_class == 3, 2, low_class)
    encoded_type_u = low_class + 1
    classbit = jnp.where(in_use, (fmt >> 2) - low_class[:, None], 0)
    encoded_type_u = encoded_type_u + jnp.sum(classbit << (2 + lanes), axis=1)
    lowbits = jnp.where(in_use, fmt & 3, 0)
    encoded_type_u = encoded_type_u + jnp.sum(
        lowbits << (2 + pc[:, None] + 2 * lanes), axis=1)

    encoded_type = jnp.where(matched, (fmt[:, 0] << 2), encoded_type_u)
    ehs = jnp.where(matched | ~is_multi, 0, 3 * pc - 4)
    below_weights = 128 - wbits_total - ehs

    plane = _scatter_bits(plane, rows, jnp.full((N, 1), 23),
                          (encoded_type & 0x3F)[:, None], 6,
                          is_multi[:, None])
    plane = _scatter_bits_var(plane, rows, below_weights[:, None],
                              (encoded_type >> 6)[:, None], ehs[:, None], 8,
                              is_multi[:, None] & (ehs > 0)[:, None])

    # Dual-plane component
    plane = _scatter_bits(plane, rows, (below_weights - 2)[:, None],
                          jnp.clip(scb["plane2_component"], 0, 3)[:, None], 2,
                          (dual == 1)[:, None])

    # --- Color values ---------------------------------------------------------
    nvals_p = jnp.where(in_use, ((fmt >> 2) + 1) * 2, 0)      # (N, 4)
    starts = jnp.concatenate([jnp.zeros((N, 1), jnp.int32),
                              jnp.cumsum(nvals_p, 1)[:, :3]], 1)
    icount = jnp.sum(nvals_p, axis=1)

    cq = jnp.clip(scb["quant_mode"], 4, 20)
    packt = jnp.asarray(_color_pack_tables())
    cvals = scb["color_values"]                                # (N, 4, 8)
    csym = packt[(cq - 4)[:, None, None], jnp.clip(cvals, 0, 255)]

    # Scatter per-partition values into the flat stream
    flat = jnp.zeros((N, C_SLOTS), jnp.int32)
    j8 = jnp.arange(8)[None, None, :]
    sidx = jnp.clip(starts[:, :, None] + j8, 0, C_SLOTS - 1)
    sval = jnp.where(j8 < nvals_p[:, :, None], csym, 0)
    flat = flat.at[jnp.arange(N)[:, None, None], sidx].add(sval)

    combo = jnp.clip((cq - 4) * 9 + ((icount >> 1) - 1), 0, 152)
    c_bits = jnp.asarray(t.c_bits)[combo][:, None]
    c_class = jnp.asarray(t.c_class)[combo]
    base = jnp.where(is_multi, 29, 17)[:, None]
    plane = _ise_encode_to_plane(
        plane, rows, flat, icount, c_bits, c_class,
        jnp.asarray(t.c_m_off)[combo], jnp.asarray(t.c_t_off)[combo],
        jnp.asarray(t.c_t_bits)[combo], jnp.asarray(t.c_t_shift)[combo],
        base, C_TRIT_PAD, C_QUINT_PAD, (5, 3))

    # --- Byte pack + constant-color overrides ---------------------------------
    plane = jnp.clip(plane, 0, 1)
    shifts = (1 << jnp.arange(8, dtype=jnp.int32))
    pcb = (plane.reshape(N, 16, 8) * shifts).sum(-1).astype(jnp.uint8)

    const_u16 = scb.get("const_u16", jnp.zeros((N,), bool))
    const_f16 = scb.get("const_f16", jnp.zeros((N,), bool))
    ccol = scb.get("constant_color", jnp.zeros((N, 4), jnp.int32))
    if "const_u16" in scb:
        head_u16 = np.array([0xFC, 0xFD, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF],
                            np.uint8)
        head_f16 = np.array([0xFC, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF],
                            np.uint8)
        cc_lo = (ccol & 0xFF).astype(jnp.uint8)
        cc_hi = ((ccol >> 8) & 0xFF).astype(jnp.uint8)
        cc_bytes = jnp.stack([cc_lo[:, 0], cc_hi[:, 0], cc_lo[:, 1],
                              cc_hi[:, 1], cc_lo[:, 2], cc_hi[:, 2],
                              cc_lo[:, 3], cc_hi[:, 3]], axis=1)
        const_any = const_u16 | const_f16
        head = jnp.where(const_f16[:, None], jnp.asarray(head_f16),
                         jnp.asarray(head_u16))
        cblock = jnp.concatenate([head, cc_bytes], axis=1).astype(jnp.uint8)
        pcb = jnp.where(const_any[:, None], cblock, pcb)
    return pcb
