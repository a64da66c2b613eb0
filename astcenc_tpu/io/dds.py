"""DDS container support (uncompressed RGBA surfaces).

Mirrors the reference CLI's DDS support, which reads/writes uncompressed
u8 / f16 / f32 RGBA surfaces (reference:
Source/astcenccli_image_load_store.cpp:1712-2400). Uses the DX10 extended
header with standard DXGI formats.
"""

from __future__ import annotations

import struct

import numpy as np

_DDS_MAGIC = 0x20534444
_DX10_MAGIC = 0x30315844

_DXGI_R32G32B32A32_FLOAT = 2
_DXGI_R16G16B16A16_FLOAT = 10
_DXGI_R8G8B8A8_UNORM = 28


class DdsError(ValueError):
    pass


def write_dds(path, data: np.ndarray):
    """Write an uncompressed RGBA DDS (u8 / f16 / f32 by dtype)."""
    if data.ndim == 3:
        data = data[None]
    dz, dy, dx, _ = data.shape
    if data.dtype == np.uint8:
        dxgi, bpp = _DXGI_R8G8B8A8_UNORM, 4
    elif data.dtype == np.float16:
        dxgi, bpp = _DXGI_R16G16B16A16_FLOAT, 8
    else:
        data = data.astype(np.float32)
        dxgi, bpp = _DXGI_R32G32B32A32_FLOAT, 16

    flags = 1 | 2 | 4 | 0x1000 | 8
    caps2 = 0
    if dz > 1:
        flags |= 0x800000
        caps2 = 0x200000
    pitch = dx * bpp

    ddspf = struct.pack("<8I", 32, 4, _DX10_MAGIC, 0, 0, 0, 0, 0)
    header = struct.pack("<7I44s", 124, flags, dy, dx, pitch, dz, 1,
                         b"\0" * 44) + ddspf + struct.pack(
        "<5I", 0x1000, caps2, 0, 0, 0)
    dx10 = struct.pack("<5I", dxgi, 4 if dz > 1 else 3, 0, 1, 0)
    with open(path, "wb") as f:
        f.write(struct.pack("<I", _DDS_MAGIC))
        f.write(header)
        f.write(dx10)
        f.write(np.ascontiguousarray(data).tobytes())


def read_dds(path):
    """Read an uncompressed RGBA DDS. Returns (data (Z,H,W,4), is_hdr)."""
    with open(path, "rb") as f:
        raw = f.read()
    if len(raw) < 128 or struct.unpack("<I", raw[:4])[0] != _DDS_MAGIC:
        raise DdsError("not a DDS file")
    size, flags, dy, dx, pitch, dz, mips = struct.unpack("<7I", raw[4:32])
    if size != 124:
        raise DdsError("bad DDS header size")
    dz = max(dz, 1)
    pf = struct.unpack("<8I", raw[76:108])
    off = 4 + 124
    dxgi = None
    if pf[1] & 4 and pf[2] == _DX10_MAGIC:
        dxgi = struct.unpack("<5I", raw[off:off + 20])[0]
        off += 20
    payload = raw[off:]

    if dxgi == _DXGI_R8G8B8A8_UNORM or dxgi is None and pf[1] & 0x40:
        arr = np.frombuffer(payload, np.uint8)[:dz * dy * dx * 4]
        return arr.reshape(dz, dy, dx, 4).copy(), False
    if dxgi == _DXGI_R16G16B16A16_FLOAT:
        arr = np.frombuffer(payload, np.float16)[:dz * dy * dx * 4]
        return arr.reshape(dz, dy, dx, 4).astype(np.float32), True
    if dxgi == _DXGI_R32G32B32A32_FLOAT:
        arr = np.frombuffer(payload, np.float32)[:dz * dy * dx * 4]
        return arr.reshape(dz, dy, dx, 4).copy(), True
    raise DdsError(f"unsupported DDS format {dxgi}")
