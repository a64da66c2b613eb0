"""Single-block introspection (host-side).

The batched analog of astcenc_get_block_info (reference:
astcenc_entry.cpp:1401-1517): parses one physical block into the flat
metadata record used by diagnostic tooling (-dimage style debug output).
Host NumPy, reusing the table layer's ISE codec.
"""

from __future__ import annotations

import numpy as np

from ..tables import ise, quant


def _read_bits(data: np.ndarray, off: int, n: int) -> int:
    v = 0
    for b in range(n):
        bit = (int(data[(off + b) >> 3]) >> ((off + b) & 7)) & 1
        v |= bit << b
    return v


def get_block_info(ctx, pcb: np.ndarray) -> dict:
    """Parse one 16-byte physical block into decode metadata."""
    bsd = ctx.bsd
    dt = ctx.dtables
    pcb = np.asarray(pcb, np.uint8).reshape(16)

    info = {
        "block_is_error": False,
        "block_is_constant": False,
        "block_is_hdr": False,
        "block_is_dual_plane": False,
        "partition_count": 0,
        "partition_index": 0,
        "dual_plane_component": -1,
        "color_endpoint_modes": [],
        "color_quant_level": None,
        "weight_quant_level": None,
        "weight_x": 0, "weight_y": 0, "weight_z": 0,
        "weight_values_plane1": None,
        "weight_values_plane2": None,
        "partition_assignment": None,
    }

    block_mode = _read_bits(pcb, 0, 11)
    if (block_mode & 0x1FF) == 0x1FC:
        info["block_is_constant"] = True
        info["block_is_hdr"] = bool(block_mode & 0x200)
        info["constant_color"] = [
            int(pcb[8 + 2 * i]) | (int(pcb[9 + 2 * i]) << 8)
            for i in range(4)]
        return info

    pk = int(bsd.block_mode_packed_index[block_mode])
    if pk == 0xFFFF:
        info["block_is_error"] = True
        return info

    wq = int(bsd.bm_quant_mode[pk])
    dual = bool(bsd.bm_is_dual_plane[pk])
    dm = int(bsd.bm_decimation_mode[pk])
    wdims = bsd.dm_weight_dims[dm]
    wcount = int(bsd.dm_weight_count[dm])
    real_count = wcount * (2 if dual else 1)

    pc = _read_bits(pcb, 11, 2) + 1

    info.update(block_is_dual_plane=dual, partition_count=pc,
                weight_quant_level=ise.QUANT_LEVELS[wq],
                weight_x=int(wdims[0]), weight_y=int(wdims[1]),
                weight_z=int(wdims[2]))

    # Weight stream (bit-reversed at the top of the block)
    bits = np.unpackbits(pcb[::-1])  # already reversed byte+bit order
    rev = np.packbits(bits).tobytes()
    wsyms = ise.decode_ise(wq, real_count, np.frombuffer(rev, np.uint8))
    uuq = quant.weight_quant_tables(wq)["unscramble_unquant"]
    w = uuq[np.asarray(wsyms)]
    if dual:
        info["weight_values_plane1"] = w[0::2].tolist()
        info["weight_values_plane2"] = w[1::2].tolist()
    else:
        info["weight_values_plane1"] = w.tolist()

    if pc > 1:
        pidx = _read_bits(pcb, 13, 10)
        info["partition_index"] = pidx
        parts = bsd.partitionings[pc]
        row = int(parts["packed_index"][pidx])
        if row != 0xFFFF:
            info["partition_assignment"] = (
                parts["partition_of_texel"][row].tolist())
        cem_base = _read_bits(pcb, 23, 6)
        info["cem_base"] = cem_base
    else:
        fmt = _read_bits(pcb, 13, 4)
        info["color_endpoint_modes"] = [fmt]
        info["block_is_hdr"] = fmt in (2, 3, 7, 11, 14, 15)

    return info
