"""Minimal OpenEXR scanline I/O (no external dependencies).

Covers the subset the reference CLI exercises through tinyexr
(reference: Source/astcenccli_image_load_store.cpp:122-426): single-part
scanline images, HALF/FLOAT channels, NONE / ZIPS / ZIP compression.
Writer emits uncompressed HALF scanlines.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 0x01312F76

_PT_UINT, _PT_HALF, _PT_FLOAT = 0, 1, 2
_COMP_NONE, _COMP_RLE, _COMP_ZIPS, _COMP_ZIP = 0, 1, 2, 3


class ExrError(ValueError):
    pass


def _read_nullstr(buf, off):
    end = buf.index(b"\0", off)
    return buf[off:end].decode("latin1"), end + 1


def _unpredict_and_interleave(data: bytes) -> bytes:
    """Invert the EXR ZIP predictor: delta-decode then re-interleave.

    Encode-side: split bytes into two halves (even/odd positions), then
    delta-encode (d[i] = t[i] - t[i-1] + 128). Decode runs the inverse:
    t[0] = d[0], t[i] = t[i-1] + d[i] - 128 (mod 256), then interleave.
    """
    deltas = np.frombuffer(data, np.uint8).astype(np.int64)
    t = np.cumsum(np.concatenate([deltas[:1], deltas[1:] - 128]))
    out = (t % 256).astype(np.uint8)
    n = len(out)
    half = (n + 1) // 2
    inter = np.zeros(n, np.uint8)
    inter[0::2] = out[:half]
    inter[1::2] = out[half:]
    return inter.tobytes()


def read_exr(path):
    """Read a single-part scanline EXR. Returns (H, W, 4) float32 RGBA."""
    with open(path, "rb") as f:
        raw = f.read()
    if len(raw) < 8 or struct.unpack("<I", raw[:4])[0] != _MAGIC:
        raise ExrError("not an EXR file")
    version = struct.unpack("<I", raw[4:8])[0]
    if version & 0x200:
        raise ExrError("multi-part EXR not supported")
    if version & 0x800:
        raise ExrError("deep EXR not supported")

    off = 8
    channels = []
    compression = _COMP_NONE
    dw = None
    while True:
        name, off = _read_nullstr(raw, off)
        if not name:
            break
        atype, off = _read_nullstr(raw, off)
        (size,) = struct.unpack("<I", raw[off:off + 4])
        off += 4
        data = raw[off:off + size]
        off += size
        if name == "channels":
            coff = 0
            while data[coff] != 0:
                cname_end = data.index(b"\0", coff)
                cname = data[coff:cname_end].decode("latin1")
                coff = cname_end + 1
                ptype, _plin = struct.unpack("<iB", data[coff:coff + 5])
                coff += 16
                channels.append((cname, ptype))
        elif name == "compression":
            compression = data[0]
        elif name == "dataWindow":
            dw = struct.unpack("<4i", data)
    if dw is None or not channels:
        raise ExrError("missing required EXR attributes")
    w = dw[2] - dw[0] + 1
    h = dw[3] - dw[1] + 1
    if compression not in (_COMP_NONE, _COMP_ZIPS, _COMP_ZIP):
        raise ExrError(f"unsupported EXR compression {compression}")
    lines_per_block = 16 if compression == _COMP_ZIP else 1
    nblocks = (h + lines_per_block - 1) // lines_per_block

    # channels are stored sorted by name; each scanline holds each channel's
    # full row consecutively
    offsets = struct.unpack(f"<{nblocks}Q", raw[off:off + 8 * nblocks])

    dtypes = {_PT_HALF: np.float16, _PT_FLOAT: np.float32,
              _PT_UINT: np.uint32}
    csizes = {_PT_HALF: 2, _PT_FLOAT: 4, _PT_UINT: 4}
    planes = {c: np.zeros((h, w), np.float32) for c, _ in channels}

    for bofs in offsets:
        y, size = struct.unpack("<ii", raw[bofs:bofs + 8])
        payload = raw[bofs + 8:bofs + 8 + size]
        ny = min(lines_per_block, dw[3] - y + 1)
        rowbytes = sum(w * csizes[pt] for _, pt in channels)
        if compression in (_COMP_ZIPS, _COMP_ZIP):
            if size < ny * rowbytes:
                payload = _unpredict_and_interleave(zlib.decompress(payload))
        arr = np.frombuffer(payload, np.uint8)
        pos = 0
        for line in range(ny):
            yy = y - dw[1] + line
            for cname, ptype in channels:
                nb = w * csizes[ptype]
                row = arr[pos:pos + nb].view(dtypes[ptype])
                planes[cname][yy] = row.astype(np.float32)
                pos += nb

    out = np.zeros((h, w, 4), np.float32)
    out[..., 3] = 1.0
    for i, c in enumerate("RGBA"):
        if c in planes:
            out[..., i] = planes[c]
    if "Y" in planes and "R" not in planes:   # luminance-only
        for i in range(3):
            out[..., i] = planes["Y"]
    ncomp = sum(1 for c in "RGBA" if c in planes) or 1
    return out, ncomp


def _attr(name, atype, data):
    return (name.encode() + b"\0" + atype.encode() + b"\0"
            + struct.pack("<I", len(data)) + data)


def write_exr(path, rgb: np.ndarray, ncomp: int = 3):
    """Write an uncompressed HALF scanline EXR from (H, W, >=3) float data."""
    rgb = np.asarray(rgb, np.float32)
    h, w = rgb.shape[:2]
    names = ["B", "G", "R"] if ncomp <= 3 else ["A", "B", "G", "R"]
    src = {"R": rgb[..., 0], "G": rgb[..., 1], "B": rgb[..., 2]}
    if ncomp > 3:
        src["A"] = (rgb[..., 3] if rgb.shape[2] > 3
                    else np.ones((h, w), np.float32))

    chl = b""
    for n in names:                     # alphabetical order
        chl += n.encode() + b"\0" + struct.pack("<iBBBBii", _PT_HALF,
                                                0, 0, 0, 0, 1, 1)
    chl += b"\0"

    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    hdr = b"".join([
        _attr("channels", "chlist", chl),
        _attr("compression", "compression", bytes([_COMP_NONE])),
        _attr("dataWindow", "box2i", box),
        _attr("displayWindow", "box2i", box),
        _attr("lineOrder", "lineOrder", b"\0"),
        _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0)),
        _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0)),
        _attr("screenWindowWidth", "float", struct.pack("<f", 1.0)),
        b"\0",
    ])
    head = struct.pack("<II", _MAGIC, 2) + hdr
    table_off = len(head)
    data_off = table_off + 8 * h
    rowbytes = len(names) * w * 2

    offsets = []
    body = b""
    for y in range(h):
        offsets.append(data_off + len(body))
        row = b"".join(src[n][y].astype(np.float16).tobytes() for n in names)
        body += struct.pack("<ii", y, rowbytes) + row
    with open(path, "wb") as f:
        f.write(head)
        f.write(struct.pack(f"<{h}Q", *offsets))
        f.write(body)
