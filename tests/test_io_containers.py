"""KTX / DDS container tests."""

import struct

import numpy as np
import pytest

from astcenc_tpu.io import dds, ktx


def test_ktx_compressed_roundtrip(tmp_path):
    blocks = np.arange(16 * 24, dtype=np.uint8).reshape(24, 16)
    path = str(tmp_path / "t.ktx")
    ktx.write_ktx_compressed(path, (6, 6, 1), (34, 23, 1), blocks)
    kind, bd, idim, payload, srgb = ktx.read_ktx(path)
    assert kind == "astc"
    assert bd == (6, 6, 1)
    assert idim == (34, 23, 1)
    assert not srgb
    np.testing.assert_array_equal(payload, blocks)


def test_ktx_srgb_and_3d(tmp_path):
    blocks = np.zeros((64, 16), np.uint8)
    path = str(tmp_path / "t3.ktx")
    ktx.write_ktx_compressed(path, (3, 3, 3), (12, 12, 12), blocks, srgb=False)
    kind, bd, idim, _, _ = ktx.read_ktx(path)
    assert bd == (3, 3, 3) and idim == (12, 12, 12)

    path2 = str(tmp_path / "ts.ktx")
    ktx.write_ktx_compressed(path2, (8, 8, 1), (64, 64, 1),
                             np.zeros((64, 16), np.uint8), srgb=True)
    _, _, _, _, srgb = ktx.read_ktx(path2)
    assert srgb


def test_ktx_uncompressed_roundtrip(tmp_path):
    img = np.random.RandomState(0).randint(0, 255, (1, 8, 12, 4), np.uint8)
    path = str(tmp_path / "u.ktx")
    ktx.write_ktx_uncompressed(path, img)
    kind, bd, idim, data, _ = ktx.read_ktx(path)
    assert kind == "raw"
    np.testing.assert_array_equal(data, img)


def test_dds_roundtrip(tmp_path):
    img = np.random.RandomState(1).randint(0, 255, (1, 6, 9, 4), np.uint8)
    path = str(tmp_path / "t.dds")
    dds.write_dds(path, img)
    data, is_hdr = dds.read_dds(path)
    assert not is_hdr
    np.testing.assert_array_equal(data, img)


def test_dds_f16(tmp_path):
    img = np.random.RandomState(2).rand(1, 4, 4, 4).astype(np.float16)
    path = str(tmp_path / "f.dds")
    dds.write_dds(path, img)
    data, is_hdr = dds.read_dds(path)
    assert is_hdr
    np.testing.assert_allclose(data, img.astype(np.float32), rtol=1e-3)


def test_ktx_bad_magic(tmp_path):
    p = str(tmp_path / "bad.ktx")
    open(p, "wb").write(b"not a ktx file at all")
    with pytest.raises(ktx.KtxError):
        ktx.read_ktx(p)


def test_exr_roundtrip(tmp_path):
    from astcenc_tpu.io import exr
    src = (np.random.RandomState(5).rand(17, 23, 4) * 8).astype(np.float32)
    p = str(tmp_path / "a.exr")
    exr.write_exr(p, src, ncomp=4)
    back, ncomp = exr.read_exr(p)
    assert ncomp == 4
    np.testing.assert_array_equal(
        back, src.astype(np.float16).astype(np.float32))


def test_exr_truncated(tmp_path):
    from astcenc_tpu.io import exr
    p = str(tmp_path / "bad.exr")
    open(p, "wb").write(b"\x76\x2f\x31\x01")
    with pytest.raises((exr.ExrError, ValueError, struct.error, IndexError)):
        exr.read_exr(p)


def test_exr_interop_with_reference(tmp_path, ref_binary):
    """Our EXR is readable by tinyexr and vice versa (incl. ZIP lines)."""
    import subprocess
    from astcenc_tpu.io import exr
    src = (np.random.RandomState(7).rand(24, 36, 4) * 4).astype(np.float32)
    ours = str(tmp_path / "ours.exr")
    exr.write_exr(ours, src, ncomp=3)
    astc = str(tmp_path / "x.astc")
    refout = str(tmp_path / "ref.exr")
    subprocess.run([ref_binary, "-ch", ours, astc, "4x4", "-fastest",
                    "-silent", "-j", "1"], check=True, capture_output=True)
    subprocess.run([ref_binary, "-dh", astc, refout, "-silent"],
                   check=True, capture_output=True)
    img, _ = exr.read_exr(refout)   # tinyexr writes ZIP-compressed lines
    assert img.shape == (24, 36, 4)
    assert np.isfinite(img).all()


def test_exr_rle_roundtrip(tmp_path):
    """RLE-compressed EXR decode: synthesize an RLE file by re-packing an
    uncompressed write (reference reads RLE via tinyexr,
    astcenccli_image_load_store.cpp:122-426)."""
    from astcenc_tpu.io import exr

    rng = np.random.RandomState(9)
    # Runs of constant values exercise the repeat path; noise the literals
    img = np.repeat(rng.rand(8, 4, 3).astype(np.float32), 4, axis=1)
    base = str(tmp_path / "plain.exr")
    exr.write_exr(base, img)
    raw = bytearray(open(base, "rb").read())

    # Patch compression attr NONE -> RLE, then recompress each scanline
    idx = raw.index(b"compression\x00compression\x00")
    raw[idx + len(b"compression\x00compression\x00") + 4] = 1  # _COMP_RLE

    def rle_compress(data: bytes) -> bytes:
        # predictor: deinterleave + delta (inverse of reader's post-pass)
        arr = np.frombuffer(data, np.uint8)
        n = len(arr)
        half = (n + 1) // 2
        planar = np.concatenate([arr[0::2], arr[1::2]])
        d = np.concatenate([planar[:1],
                            (planar[1:].astype(np.int64)
                             - planar[:-1].astype(np.int64) + 128) % 256]
                           ).astype(np.uint8).tobytes()
        out = bytearray()
        i = 0
        while i < len(d):
            j = i
            while j + 1 < len(d) and d[j + 1] == d[i] and j - i < 126:
                j += 1
            if j > i:                     # run of j-i+1 equal bytes
                out.append(j - i)
                out.append(d[i])
                i = j + 1
            else:
                k = i
                while (k < len(d) and k - i < 127
                       and not (k + 1 < len(d) and d[k + 1] == d[k])):
                    k += 1
                out.append(256 - (k - i))
                out += d[i:k]
                i = k
        return bytes(out)

    # Walk scanline blocks (NONE layout: header .. offsets .. y/size/data)
    img2, _ = exr.read_exr(base)
    H, W = img.shape[:2]
    # locate offset table: parse until empty name
    off = 8
    while True:
        end = raw.index(b"\x00", off)
        name = bytes(raw[off:end]).decode(); off = end + 1
        if not name:
            break
        end = raw.index(b"\x00", off); off = end + 1
        (sz,) = struct.unpack("<I", bytes(raw[off:off + 4])); off += 4 + sz
    table_off = off
    offsets = list(struct.unpack(f"<{H}Q", bytes(raw[table_off:table_off + 8 * H])))
    blocks = []
    for bo in offsets:
        y, size = struct.unpack("<ii", bytes(raw[bo:bo + 8]))
        payload = bytes(raw[bo + 8:bo + 8 + size])
        comp = rle_compress(payload)
        if len(comp) >= len(payload):
            comp = payload                # stored raw when not smaller
        blocks.append((y, comp))
    out = bytearray(raw[:table_off + 8 * H])
    pos = table_off + 8 * H
    for i, (y, comp) in enumerate(blocks):
        struct.pack_into("<Q", out, table_off + 8 * i, pos)
        out += struct.pack("<ii", y, len(comp))
        out += comp
        pos = len(out) - 0
        struct.pack_into("<Q", out, table_off + 8 * i, pos - 8 - len(comp))
    rle_path = str(tmp_path / "rle.exr")
    open(rle_path, "wb").write(out)

    img3, _ = exr.read_exr(rle_path)
    np.testing.assert_array_equal(
        img3.astype(np.float16), img2.astype(np.float16))


@pytest.mark.slow
def test_exr_piz_corpus():
    """PIZ decode of the HDRIHaven corpus image, cross-checked against its
    Radiance-format sibling (pixel-exact to Radiance precision)."""
    import os
    from astcenc_tpu.io import exr, image_io
    base = "/root/reference/Test/Images/HDRIHaven/HDR-RGB"
    epath = os.path.join(base, "hdr-rgb-arboretum.exr")
    hpath = os.path.join(base, "hdr-rgb-arboretum.hdr")
    if not (os.path.exists(epath) and os.path.exists(hpath)):
        pytest.skip("HDRIHaven corpus unavailable")
    img, _ = exr.read_exr(epath)
    h = np.asarray(image_io._read_radiance_hdr(hpath), np.float32)
    rel = (np.abs(img[..., :3] - h[..., :3])
           / np.maximum(np.abs(h[..., :3]), 0.05))
    assert float(np.median(rel)) == 0.0
    assert float((rel.max(-1) > 0.2).mean()) < 1e-4


def _ktx_raw(gl_type, gl_fmt, w, h, payload, type_size=1):
    """Minimal uncompressed KTX v1 file (reference header layout,
    astcenccli_image_load_store.cpp:873-905)."""
    magic = bytes([0xAB, 0x4B, 0x54, 0x58, 0x20, 0x31, 0x31, 0xBB,
                   0x0D, 0x0A, 0x1A, 0x0A])
    hdr = struct.pack("<13I", 0x04030201, gl_type, type_size, gl_fmt,
                      gl_fmt, gl_fmt, w, h, 0, 0, 1, 1, 0)
    return magic + hdr + struct.pack("<I", len(payload)) + payload


def test_ktx_uncompressed_luminance8(tmp_path):
    # GL_LUMINANCE u8 -> (l, l, l, 255)
    lum = np.arange(12, dtype=np.uint8).reshape(3, 4)
    p = str(tmp_path / "l8.ktx")
    with open(p, "wb") as f:
        f.write(_ktx_raw(0x1401, 0x1909, 4, 3, lum.tobytes()))
    kind, _, dims, data, _ = ktx.read_ktx(p)
    assert kind == "raw" and dims == (4, 3, 1)
    assert data.dtype == np.uint8
    np.testing.assert_array_equal(data[0, ..., 0], lum)
    np.testing.assert_array_equal(data[0, ..., 1], lum)
    np.testing.assert_array_equal(data[0, ..., 2], lum)
    assert (data[0, ..., 3] == 255).all()


def test_ktx_uncompressed_bgra8_and_rg16(tmp_path):
    rng = np.random.RandomState(1)
    bgra = rng.randint(0, 255, (2, 5, 4), np.uint8)
    p = str(tmp_path / "bgra.ktx")
    with open(p, "wb") as f:
        f.write(_ktx_raw(0x1401, 0x80E1, 5, 2, bgra.tobytes()))
    _, _, _, data, _ = ktx.read_ktx(p)
    np.testing.assert_array_equal(data[0, ..., 0], bgra[..., 2])
    np.testing.assert_array_equal(data[0, ..., 2], bgra[..., 0])
    np.testing.assert_array_equal(data[0, ..., 3], bgra[..., 3])

    # GL_RG u16 unorm -> fp16 (r, g, 0, 1)
    rg = rng.randint(0, 65535, (2, 5, 2), np.uint16)
    p2 = str(tmp_path / "rg16.ktx")
    with open(p2, "wb") as f:
        f.write(_ktx_raw(0x1403, 0x8227, 5, 2, rg.tobytes(), 2))
    _, _, _, data2, _ = ktx.read_ktx(p2)
    assert data2.dtype == np.float16
    exp = (rg.astype(np.float32) / 65535.0).astype(np.float16)
    np.testing.assert_array_equal(data2[0, ..., 0], exp[..., 0])
    assert (data2[0, ..., 2] == 0).all() and (data2[0, ..., 3] == 1).all()


def _dds_legacy(w, h, bitcount, masks, flags, payload):
    """Minimal legacy (non-DX10) DDS file."""
    ddspf = struct.pack("<8I", 32, flags, 0, bitcount, *masks)
    header = struct.pack("<7I44s", 124, 1 | 2 | 4 | 0x1000, h, w,
                         w * bitcount // 8, 1, 1, b"\0" * 44) + ddspf \
        + struct.pack("<5I", 0x1000, 0, 0, 0, 0)
    return struct.pack("<I", 0x20534444) + header + payload


def test_dds_legacy_bgra8(tmp_path):
    rng = np.random.RandomState(2)
    bgra = rng.randint(0, 255, (3, 4, 4), np.uint8)
    p = str(tmp_path / "bgra.dds")
    with open(p, "wb") as f:
        f.write(_dds_legacy(4, 3, 32, (0xFF0000, 0xFF00, 0xFF, 0xFF000000),
                            0x41, bgra.tobytes()))
    data, hdr = dds.read_dds(p)
    assert not hdr
    np.testing.assert_array_equal(data[0, ..., 0], bgra[..., 2])
    np.testing.assert_array_equal(data[0, ..., 2], bgra[..., 0])


def test_dds_legacy_l8_and_dx10_r16f(tmp_path):
    lum = np.arange(20, dtype=np.uint8).reshape(4, 5)
    p = str(tmp_path / "l8.dds")
    with open(p, "wb") as f:
        f.write(_dds_legacy(5, 4, 8, (0xFF, 0, 0, 0), 0x20000,
                            lum.tobytes()))
    data, hdr = dds.read_dds(p)
    assert not hdr
    np.testing.assert_array_equal(data[0, ..., 1], lum)
    assert (data[0, ..., 3] == 255).all()

    # DX10 R16_FLOAT -> (r, 0, 0, 1) float
    r16 = np.linspace(0, 4, 20, dtype=np.float16).reshape(4, 5)
    ddspf = struct.pack("<8I", 32, 4, 0x30315844, 0, 0, 0, 0, 0)
    header = struct.pack("<7I44s", 124, 1 | 2 | 4 | 0x1000, 4, 5,
                         10, 1, 1, b"\0" * 44) + ddspf \
        + struct.pack("<5I", 0x1000, 0, 0, 0, 0)
    dx10 = struct.pack("<5I", 54, 3, 0, 1, 0)
    p2 = str(tmp_path / "r16f.dds")
    with open(p2, "wb") as f:
        f.write(struct.pack("<I", 0x20534444) + header + dx10
                + r16.tobytes())
    data2, hdr2 = dds.read_dds(p2)
    assert hdr2
    np.testing.assert_array_equal(data2[0, ..., 0],
                                  r16.astype(np.float32))
    assert (data2[0, ..., 1] == 0).all() and (data2[0, ..., 3] == 1).all()
