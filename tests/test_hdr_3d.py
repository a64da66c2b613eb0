"""HDR and 3D encode/decode behavioral tests (CPU, slow-marked where heavy)."""

import math

import numpy as np
import pytest

from astcenc_tpu import api
from astcenc_tpu.config import Profile, Quality


@pytest.mark.slow
def test_3d_roundtrip():
    g = np.linspace(0, 255, 12)
    vol = (g[:, None, None] * 0.5 + g[None, :, None] * 0.3
           + g[None, None, :] * 0.2)
    img = np.stack([vol, vol * 0.8 + 20, 255 - vol,
                    np.full_like(vol, 255)], -1).astype(np.uint8)
    cfg = api.config_init(Profile.LDR, 3, 3, 3, Quality.MEDIUM, 0)
    ctx = api.context_alloc(cfg)
    blocks = api.compress_image(ctx, img)
    assert blocks.shape == (64, 16)
    out = api.decompress_image(ctx, blocks, 12, 12, 12, out_type="u8")
    mse = ((img[..., :3] / 255.0 - out[..., :3] / 255.0) ** 2).mean()
    psnr = 10 * math.log10(1 / mse)
    assert psnr > 35.0, psnr


@pytest.mark.slow
def test_hdr_roundtrip():
    rng = np.random.RandomState(2)
    base = np.abs(rng.randn(8, 8, 3).astype(np.float32)) * 2.0
    hdr = np.kron(base, np.ones((8, 8, 1), np.float32))
    hdr = np.concatenate([hdr, np.ones((64, 64, 1), np.float32)], -1)
    cfg = api.config_init(Profile.HDR, 6, 6, 1, Quality.MEDIUM, 0)
    ctx = api.context_alloc(cfg)
    blocks = api.compress_image(ctx, hdr)
    out = api.decompress_image(ctx, blocks, 64, 64, 1, out_type="f32")
    d = out[0]
    assert np.isfinite(d).all()
    rel = np.abs(d[..., :3] - hdr[..., :3]) / np.maximum(hdr[..., :3], 0.01)
    assert float(np.median(rel)) < 0.05


def test_block_info_roundtrip():
    cfg = api.config_init(Profile.LDR, 4, 4, 1, Quality.FASTEST, 0)
    ctx = api.context_alloc(cfg)
    # Constant-color (void extent) block
    blk = np.zeros(16, np.uint8)
    blk[:8] = [0xFC, 0xFD, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF]
    info = api.get_block_info(ctx, blk)
    assert info["block_is_constant"]
    # An invalid block mode
    blk2 = np.zeros(16, np.uint8)
    info2 = api.get_block_info(ctx, blk2)
    assert info2["block_is_error"]


def test_progress_and_cancel():
    cfg = api.config_init(Profile.LDR, 4, 4, 1, Quality.FASTEST, 0)
    ctx = api.context_alloc(cfg)
    img = np.zeros((16, 16, 4), np.uint8)
    seen = []
    api.compress_image(ctx, img, progress_callback=seen.append)
    assert seen and seen[-1] == 100.0
    api.compress_cancel(ctx)
    api.compress_reset(ctx)


def test_block_info_full_fields():
    """get_block_info completeness (reference: astcenc_entry.cpp:1445-1516):
    per-partition CEMs, color values, decoded endpoints, quant levels,
    consistent with our own decoder's texel output."""
    rng = np.random.RandomState(21)
    # Hard content at a slower preset drives multi-partition encodings
    img = rng.randint(0, 255, (24, 24, 4), np.uint8)
    cfg = api.config_init(Profile.LDR, 4, 4, 1, Quality.MEDIUM, 0)
    ctx = api.context_alloc(cfg)
    blocks = np.asarray(api.compress_image(ctx, img))
    saw_multi = False
    for i in range(blocks.shape[0]):
        info = api.get_block_info(ctx, blocks[i])
        assert not info["block_is_error"]
        if info["block_is_constant"]:
            continue
        pc = info["partition_count"]
        assert len(info["color_endpoint_modes"]) == pc
        assert info["color_quant_level"] >= 6
        assert info["weight_quant_level"] >= 2
        assert len(info["partition_assignment"]) == 16
        assert len(info["color_values"]) == pc
        for p, f in enumerate(info["color_endpoint_modes"]):
            assert len(info["color_values"][p]) == ((f >> 2) + 1) * 2
        assert len(info["color_endpoints"]) == pc
        ep0, ep1 = info["color_endpoints"][0]
        assert len(ep0) == 4 and len(ep1) == 4
        assert all(0.0 <= v <= 1.0 for v in ep0 + ep1)
        if info["block_is_dual_plane"]:
            assert 0 <= info["dual_plane_component"] <= 3
        if pc > 1:
            saw_multi = True
            assert max(info["partition_assignment"]) == pc - 1
    assert saw_multi, "test content should produce multi-partition blocks"
