"""3D block correctness gates vs the reference codec.

Mirrors tests/test_decode.py's strategy for volumetric footprints
(reference: Test/astc_test_functional.py:631 covers every 3D block size;
Source/UnitTest/test_decode.cpp:135 is the 2D analog):

- reference-encoded 3x3x3 and 6x6x6 streams must decode BIT-EXACTLY
  through our batched decoder (vs the reference's own -dl output);
- our 6x6x6 encoder output must decode identically through our decoder
  and the reference binary, and hit a sanity PSNR;
- the HDR image-level gate compares our mPSNR against the committed
  reference result CSV row for hdr-rgb-00.hdr (the metric the reference
  harness records for HDR images, Test/testlib/encoder.py:338).
"""

import os
import subprocess

import numpy as np
import pytest

from astcenc_tpu import api
from astcenc_tpu.config import Profile, Quality
from astcenc_tpu.io import astc_file, image_io

SMALL = "/root/reference/Test/Images/Small"


def _volume_slices(tmp_path, size=24, nz=6):
    """Write nz size x size slices (base_0.png..) from a real image; return
    (pattern path, volume array (nz, size, size, 4))."""
    src = os.path.join(SMALL, "LDR-RGB/ldr-rgb-00.png")
    if not os.path.exists(src):
        pytest.skip("reference test images unavailable")
    from PIL import Image
    img = Image.open(src).convert("RGBA")
    vol = []
    for z in range(nz):
        sl = img.crop((z * 7, z * 5, z * 7 + size, z * 5 + size))
        sl.save(str(tmp_path / f"vol_{z}.png"))
        vol.append(np.asarray(sl))
    return str(tmp_path / "vol.png"), np.stack(vol)


def _ref_decode_slices(ref_binary, astc, tmp_path, nz):
    out = str(tmp_path / "refout.png")
    subprocess.run([ref_binary, "-dl", astc, out, "-silent"],
                   check=True, capture_output=True)
    slices = []
    for z in range(nz):
        p = str(tmp_path / f"refout_{z:03d}.png")
        arr, _, _ = image_io.load_image(p)
        slices.append(arr)
    return np.stack(slices)


@pytest.mark.parametrize("block,nz,preset", [
    ("3x3x3", 6, "-fast"),
    pytest.param("6x6x6", 6, "-fastest", marks=pytest.mark.slow),
])
def test_decode_3d_bit_exact(ref_binary, tmp_path, block, nz, preset):
    """Reference-encoded 3D streams decode bit-exactly through our decoder."""
    pattern, _ = _volume_slices(tmp_path, nz=nz)
    astc = str(tmp_path / "t.astc")
    subprocess.run([ref_binary, "-cl", pattern, astc, block, preset,
                    "-zdim", str(nz), "-silent", "-j", "1"],
                   check=True, capture_output=True)

    bd, idim, blocks = astc_file.read_astc(astc)
    assert bd[2] > 1, "not a 3D stream"
    cfg = api.config_init(Profile.LDR, bd[0], bd[1], bd[2],
                          Quality.MEDIUM, 0)
    ctx = api.context_alloc(cfg)
    ours = api.decompress_image(ctx, blocks, idim[0], idim[1], idim[2],
                                out_type="u8")
    ref = _ref_decode_slices(ref_binary, astc, tmp_path, nz)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.slow
def test_encode_3d_roundtrip_6x6x6(ref_binary, tmp_path):
    """Our 6x6x6 encode: reference binary and our decoder agree bit-exactly
    on the stream, and image PSNR matches a live reference encode of the
    same volume within the BASELINE tolerance (0.05 dB)."""
    pattern, vol = _volume_slices(tmp_path, size=24, nz=6)
    cfg = api.config_init(Profile.LDR, 6, 6, 6, Quality.FASTEST, 0)
    ctx = api.context_alloc(cfg)
    blocks = api.compress_image(ctx, vol)

    ours = api.decompress_image(ctx, blocks, vol.shape[2], vol.shape[1],
                                vol.shape[0], out_type="u8")

    astc = str(tmp_path / "ours.astc")
    astc_file.write_astc(astc, (6, 6, 6),
                         (vol.shape[2], vol.shape[1], vol.shape[0]),
                         np.asarray(blocks, np.uint8))
    ref = _ref_decode_slices(ref_binary, astc, tmp_path, vol.shape[0])
    np.testing.assert_array_equal(ours, ref)

    # Live reference encode of the same volume as the quality baseline.
    refastc = str(tmp_path / "refenc.astc")
    subprocess.run([ref_binary, "-cl", pattern, refastc, "6x6x6",
                    "-fastest", "-zdim", str(vol.shape[0]), "-silent",
                    "-j", "1"], check=True, capture_output=True)
    refdec = _ref_decode_slices(ref_binary, refastc, tmp_path,
                                vol.shape[0])

    from astcenc_tpu.utils import metrics
    flat = vol.reshape(-1, vol.shape[2], 4)
    q_ours = metrics.psnr(flat, ours.reshape(-1, vol.shape[2], 4))
    q_ref = metrics.psnr(flat, refdec.reshape(-1, vol.shape[2], 4))
    assert q_ours >= q_ref - 0.05, (q_ours, q_ref)


@pytest.mark.slow
def test_hdr_mpsnr_vs_reference_csv():
    """HDR image-level gate: our 6x6 -fastest mPSNR on hdr-rgb-00.hdr must
    be within 0.05 dB of the committed reference CSV row (26.7571 dB,
    Test/Images/Small/astc_reference-5.0-avx2_fastest_results.csv)."""
    src = os.path.join(SMALL, "HDR-RGB/hdr-rgb-00.hdr")
    if not os.path.exists(src):
        pytest.skip("reference HDR image unavailable")
    img, _, _ = image_io.load_image(src)
    img = img.astype(np.float32)
    if img.shape[-1] == 3:
        img = np.concatenate(
            [img, np.ones(img.shape[:-1] + (1,), np.float32)], axis=-1)

    cfg = api.config_init(Profile.HDR_RGB_LDR_A, 6, 6, 1,
                          Quality.FASTEST, 0)
    ctx = api.context_alloc(cfg)
    blocks = api.compress_image(ctx, img)
    dec = api.decompress_image(ctx, blocks, img.shape[1], img.shape[0],
                               out_type="f32")[0]

    from astcenc_tpu.utils import metrics
    m = metrics.mpsnr(img[..., :3], dec[..., :3])
    assert m >= 26.7571 - 0.05, f"mPSNR {m} vs reference CSV 26.7571"
