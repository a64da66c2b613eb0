"""Encoder tests: spec validity, roundtrip quality, reference conformance.

Mirrors the reference's test strategy (SURVEY.md §4): API error paths,
roundtrip PSNR floors per preset, and cross-validation of our encoded
bitstreams through the reference decoder.
"""

import os
import subprocess

import numpy as np
import pytest

from astcenc_tpu import api
from astcenc_tpu.config import ConfigError, Flags, Profile, Quality
from astcenc_tpu.io import astc_file, image_io
from astcenc_tpu.utils import metrics

SMALL = "/root/reference/Test/Images/Small/LDR-RGB/ldr-rgb-00.png"


def _test_image(size=32, alpha=False):
    if os.path.exists(SMALL):
        from PIL import Image
        img = np.asarray(Image.open(SMALL).convert("RGBA")
                         .crop((0, 0, size, size)))
    else:
        rng = np.random.RandomState(3)
        img = np.kron(rng.randint(0, 255, (size // 4, size // 4, 4), np.uint8),
                      np.ones((4, 4, 1), np.uint8))
    if not alpha:
        img = img.copy()
        img[..., 3] = 255
    return img


@pytest.fixture(scope="module")
def ctx44():
    cfg = api.config_init(Profile.LDR, 4, 4, 1, Quality.FASTEST, 0)
    return api.context_alloc(cfg)


def test_roundtrip_quality_4x4_fastest(ctx44):
    img = _test_image(32)
    blocks = api.compress_image(ctx44, img)
    assert blocks.shape == (64, 16)
    out = api.decompress_image(ctx44, blocks, 32, 32, 1, out_type="u8")
    p = metrics.psnr(img, out[0])
    # The reference achieves ~40+ dB here; require a sane quality floor
    assert p > 33.0, p


def test_constant_color_blocks(ctx44):
    img = np.full((16, 16, 4), [10, 200, 30, 255], np.uint8)
    blocks = api.compress_image(ctx44, img)
    # Constant blocks must use void-extent encoding (first byte 0xFC)
    assert (blocks[:, 0] == 0xFC).all()
    out = api.decompress_image(ctx44, blocks, 16, 16, 1, out_type="u8")
    np.testing.assert_array_equal(out[0], img)


def test_reference_decoder_conformance(ctx44, ref_binary, tmp_path):
    """Our encoded bitstream must decode identically on the reference."""
    img = _test_image(32)
    blocks = api.compress_image(ctx44, img)
    ours = str(tmp_path / "ours.astc")
    refpng = str(tmp_path / "refdec.png")
    astc_file.write_astc(ours, ctx44.block_dims, (32, 32, 1), blocks)
    subprocess.run([ref_binary, "-dl", ours, refpng, "-silent"], check=True,
                   capture_output=True)
    refdec, _, _ = image_io.load_image(refpng)
    ourdec = api.decompress_image(ctx44, blocks, 32, 32, 1, out_type="u8")
    np.testing.assert_array_equal(refdec, ourdec[0])


@pytest.mark.slow
def test_quality_vs_reference_4x4_fastest(ctx44, ref_binary, tmp_path):
    from PIL import Image
    img = _test_image(64)
    src = str(tmp_path / "in.png")
    Image.fromarray(img).save(src)
    blocks = api.compress_image(ctx44, img)
    ourdec = api.decompress_image(ctx44, blocks, 64, 64, 1, out_type="u8")
    p_ours = metrics.psnr(img, ourdec[0])

    refastc = str(tmp_path / "ref.astc")
    refdec = str(tmp_path / "refdec.png")
    subprocess.run([ref_binary, "-cl", src, refastc, "4x4", "-fastest",
                    "-silent", "-j", "1"], check=True, capture_output=True)
    subprocess.run([ref_binary, "-dl", refastc, refdec, "-silent"],
                   check=True, capture_output=True)
    rd, _, _ = image_io.load_image(refdec)
    p_ref = metrics.psnr(img, rd)
    # Round-1 gate: within 1.5 dB of the reference encoder; the BASELINE
    # target is 0.05 dB and is tracked in bench/QUALITY notes.
    assert p_ours > p_ref - 1.5, (p_ours, p_ref)


def test_config_errors():
    with pytest.raises(ConfigError):
        api.config_init(Profile.LDR, 7, 7, 1, Quality.MEDIUM, 0)
    with pytest.raises(ConfigError):
        api.config_init(Profile.LDR, 4, 4, 1, 150.0, 0)
    with pytest.raises(ConfigError):
        api.config_init(Profile.LDR, 4, 4, 1, Quality.MEDIUM,
                        Flags.MAP_NORMAL | Flags.MAP_RGBM)


def test_preset_interpolation():
    # quality=30 interpolates between FAST (10) and MEDIUM (60)
    cfg = api.config_init(Profile.LDR, 6, 6, 1, 30.0, 0)
    fast = api.config_init(Profile.LDR, 6, 6, 1, Quality.FAST, 0)
    med = api.config_init(Profile.LDR, 6, 6, 1, Quality.MEDIUM, 0)
    assert (min(fast.tune_block_mode_limit, med.tune_block_mode_limit)
            <= cfg.tune_block_mode_limit
            <= max(fast.tune_block_mode_limit, med.tune_block_mode_limit))
    # HDR profiles disable the db cutoff
    hdr = api.config_init(Profile.HDR, 6, 6, 1, Quality.MEDIUM, 0)
    assert hdr.tune_db_limit == 999.0


def test_rgbm_encode_no_zero_m():
    """RGBM: M==0 candidate encodings are rejected and the decode metric is
    applied in demultiplied space (reference:
    astcenc_decompress_symbolic.cpp:366-400)."""
    from astcenc_tpu import api
    from astcenc_tpu.config import Flags, Profile, Quality

    rng = np.random.RandomState(11)
    hdr = rng.rand(24, 24, 3).astype(np.float32) * 4.0
    # RGBM-encode with M scale 5: M = ceil(maxc/5 * 255)/255
    m = np.clip(np.ceil(hdr.max(-1) / 5.0 * 255.0), 16, 255) / 255.0
    rgbm = np.zeros((24, 24, 4), np.float32)
    rgbm[..., :3] = hdr / (m[..., None] * 5.0)
    rgbm[..., 3] = m
    img = np.clip(np.rint(rgbm * 255.0), 0, 255).astype(np.uint8)

    cfg = api.config_init(Profile.LDR, 6, 6, 1, Quality.FAST,
                          Flags.MAP_RGBM)
    ctx = api.context_alloc(cfg)
    blocks = api.compress_image(ctx, img)
    dec = api.decompress_image(ctx, blocks, 24, 24, 1, out_type="u8")[0]
    assert (dec[..., 3] > 0).all(), "decoded M must never be zero"
    hdr_dec = dec[..., :3] / 255.0 * (dec[..., 3:4] / 255.0) * 5.0
    rel = np.abs(hdr_dec - hdr) / np.maximum(hdr, 0.25)
    # The reference encoder scores median rel = 0.293 on this exact input
    # (random noise is hard); gate at parity + slack, not an absolute bar.
    assert np.median(rel) < 0.33


def test_normal_map_roundtrip():
    """-normal: rrrg encode swizzle + z reconstruction on decode
    (reference: astcenccli_toplevel.cpp -normal + astcenc_image.cpp:420)."""
    from astcenc_tpu import api
    from astcenc_tpu.config import Flags, Profile, Quality
    from astcenc_tpu.utils import metrics

    # Smooth normal field from a sinusoidal heightmap (realistic content;
    # the reference encoder scores 0.44 deg mean angular error on this
    # input at 5x5 -medium, ours 0.42 deg).
    n = 24
    x, y = np.meshgrid(np.arange(n), np.arange(n), indexing="xy")
    h = np.sin(x / 5.0) * np.cos(y / 7.0) * 3.0
    dx = np.gradient(h, axis=1)
    dy = np.gradient(h, axis=0)
    v = np.stack([-dx, -dy, np.ones_like(h)], -1)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v = v.astype(np.float32)
    img = np.zeros((n, n, 4), np.uint8)
    img[..., :3] = np.clip(np.rint((v * 0.5 + 0.5) * 255), 0, 255)
    img[..., 3] = 255

    cfg = api.config_init(Profile.LDR, 5, 5, 1, Quality.MEDIUM,
                          Flags.MAP_NORMAL)
    ctx = api.context_alloc(cfg)
    blocks = api.compress_image(ctx, img, swizzle=(0, 0, 0, 1))  # rrrg
    dec = api.decompress_image(ctx, blocks, n, n, 1, out_type="u8",
                               swizzle=(0, 3, 6, 5))             # ra z 1
    nd = dec[0, ..., :3].astype(np.float32) / 255.0 * 2.0 - 1.0
    nd /= np.maximum(np.linalg.norm(nd, axis=-1, keepdims=True), 1e-6)
    cosang = np.clip(np.sum(nd * v, axis=-1), -1, 1)
    mean_deg = np.degrees(np.arccos(cosang)).mean()
    assert mean_deg < 1.0, f"mean angular error {mean_deg:.2f} deg"


def test_error_enum_strings():
    """Stable error enum + string table (reference: astcenc.h:207-236,
    astcenc_entry.cpp:1519-1558)."""
    from astcenc_tpu.config import Error
    assert api.get_error_string(Error.SUCCESS) == "ASTCENC_SUCCESS"
    assert api.get_error_string(Error.ERR_BAD_BLOCK_SIZE) == \
        "ASTCENC_ERR_BAD_BLOCK_SIZE"
    assert api.get_error_string(4) == "ASTCENC_ERR_BAD_BLOCK_SIZE"
    assert api.get_error_string(999) is None
    # Raised validation errors carry the matching code
    try:
        api.config_init(Profile.LDR, 7, 7, 1, Quality.MEDIUM, 0)
    except ConfigError as e:
        assert e.code == Error.ERR_BAD_BLOCK_SIZE
        assert api.get_error_string(e) == "ASTCENC_ERR_BAD_BLOCK_SIZE"
    try:
        api.config_init(Profile.LDR, 4, 4, 1, 150.0, 0)
    except ConfigError as e:
        assert e.code == Error.ERR_BAD_QUALITY
    try:
        api.config_init(Profile.LDR, 4, 4, 1, Quality.MEDIUM,
                        Flags.MAP_NORMAL | Flags.MAP_RGBM)
    except ConfigError as e:
        assert e.code == Error.ERR_BAD_FLAGS
