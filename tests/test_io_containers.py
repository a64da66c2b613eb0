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
