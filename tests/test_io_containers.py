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
