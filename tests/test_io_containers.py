"""KTX / DDS container tests."""

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
