"""Functional breadth tests, modeled on the reference behavioral spec.

Mirrors Test/astc_test_functional.py's coverage axes:
  - roundtrip of EVERY legal 2D and 3D block footprint (reference:
    astc_test_functional.py:607-661 test_valid_block_sizes)
  - tuning-flag observable-effect / quality-monotonicity tests
    (reference: astc_test_functional.py:1047 quality ladder asserts)
  - preset quality monotonicity (fastest <= ... <= medium)
  - negative config paths (illegal block sizes)

Encodes are tiny (a few blocks) so the axis being tested is breadth, not
throughput; each distinct (footprint | tuning value) is one XLA compile.
"""

import os

import numpy as np
import pytest

from astcenc_tpu import api
from astcenc_tpu.config import ConfigError, Profile, Quality
from astcenc_tpu.tables.percentile import LEGAL_2D_SIZES, LEGAL_3D_SIZES
from astcenc_tpu.utils import metrics

SMALL = "/root/reference/Test/Images/Small/LDR-RGB/ldr-rgb-00.png"


def _image_2d(w, h, seed=7):
    """Natural-ish test content: real image crop when available, else a
    smooth gradient + structured noise (never pure noise — monotonicity
    asserts need compressible content)."""
    if os.path.exists(SMALL):
        from PIL import Image
        img = Image.open(SMALL).convert("RGBA")
        if img.size[0] >= w and img.size[1] >= h:
            return np.asarray(img.crop((0, 0, w, h)))
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([
        (xx * 255 / max(w - 1, 1)),
        (yy * 255 / max(h - 1, 1)),
        ((xx + yy) * 127 / max(w + h - 2, 1)),
        np.full_like(xx, 255),
    ], axis=-1).astype(np.float32)
    noise = rng.randint(-12, 13, base.shape).astype(np.float32)
    noise[..., 3] = 0
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _image_3d(w, h, d, seed=11):
    rng = np.random.RandomState(seed)
    zz, yy, xx = np.mgrid[0:d, 0:h, 0:w]
    base = np.stack([
        xx * 255 / max(w - 1, 1),
        yy * 255 / max(h - 1, 1),
        zz * 255 / max(d - 1, 1),
        np.full_like(xx, 255),
    ], axis=-1).astype(np.float32)
    noise = rng.randint(-10, 11, base.shape).astype(np.float32)
    noise[..., 3] = 0
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _psnr_for(cfg, img, dims):
    ctx = api.context_alloc(cfg)
    blocks = api.compress_image(ctx, img)
    w, h = dims[0], dims[1]
    z = dims[2] if len(dims) > 2 else 1
    out = api.decompress_image(ctx, blocks, w, h, z, out_type="u8")
    if z == 1:
        out = out[0]
        ref = img
    else:
        ref = img
    # metrics.psnr treats float input as [0,1]; keep uint8 so the 255 peak
    # is normalized correctly.
    return metrics.psnr(np.asarray(ref, np.uint8), np.asarray(out, np.uint8))


# ---------------------------------------------------------------------------
# Every legal block footprint roundtrips at -fastest
# (reference: astc_test_functional.py:607-631)
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("bx,by", LEGAL_2D_SIZES,
                         ids=[f"{x}x{y}" for x, y in LEGAL_2D_SIZES])
def test_roundtrip_every_2d_footprint(bx, by):
    w, h = bx * 2, by * 2
    img = _image_2d(w, h)
    cfg = api.config_init(Profile.LDR, bx, by, 1, Quality.FASTEST, 0)
    p = _psnr_for(cfg, img, (w, h))
    # Sanity floor: decodes to recognizably the same content. The real
    # quality bar is the corpus gate (tools/quality_regression.py).
    assert p > 18.0, (bx, by, p)


@pytest.mark.slow
@pytest.mark.parametrize("bx,by,bz", LEGAL_3D_SIZES,
                         ids=[f"{x}x{y}x{z}" for x, y, z in LEGAL_3D_SIZES])
def test_roundtrip_every_3d_footprint(bx, by, bz):
    w, h, d = bx * 2, by * 2, bz * 2
    img = _image_3d(w, h, d)
    cfg = api.config_init(Profile.LDR, bx, by, bz, Quality.FASTEST, 0)
    p = _psnr_for(cfg, img, (w, h, d))
    assert p > 18.0, (bx, by, bz, p)


# ---------------------------------------------------------------------------
# Tuning flags have their documented observable effect
# (reference: astc_test_functional.py:1047 ladder asserts)
# ---------------------------------------------------------------------------

_TOL_DB = 0.05  # ladders may tie; they must not regress beyond noise


def _tuned_psnr(img, dims, **overrides):
    cfg = api.config_init(Profile.LDR, 6, 6, 1, Quality.FAST, 0)
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return _psnr_for(cfg, img, dims)


@pytest.fixture(scope="module")
def ladder_img():
    return _image_2d(48, 48)


@pytest.mark.slow
def test_partition_count_limit_monotonic(ladder_img):
    p1 = _tuned_psnr(ladder_img, (48, 48), tune_partition_count_limit=1)
    p2 = _tuned_psnr(ladder_img, (48, 48), tune_partition_count_limit=2)
    assert p2 >= p1 - _TOL_DB, (p1, p2)


@pytest.mark.slow
def test_refinement_limit_monotonic(ladder_img):
    p1 = _tuned_psnr(ladder_img, (48, 48), tune_refinement_limit=1)
    p3 = _tuned_psnr(ladder_img, (48, 48), tune_refinement_limit=3)
    assert p3 >= p1 - _TOL_DB, (p1, p3)


@pytest.mark.slow
def test_candidate_limit_monotonic(ladder_img):
    p1 = _tuned_psnr(ladder_img, (48, 48), tune_candidate_limit=1)
    p3 = _tuned_psnr(ladder_img, (48, 48), tune_candidate_limit=3)
    assert p3 >= p1 - _TOL_DB, (p1, p3)


@pytest.mark.slow
def test_block_mode_limit_effect(ladder_img):
    """-blockmodelimit shrinks the searched mode set via the percentile
    tables; quality must not improve when modes are removed."""
    cfg_lo = api.config_init(Profile.LDR, 6, 6, 1, Quality.FAST, 0)
    cfg_lo.tune_block_mode_limit = 5
    cfg_hi = api.config_init(Profile.LDR, 6, 6, 1, Quality.FAST, 0)
    cfg_hi.tune_block_mode_limit = 100
    p_lo = _psnr_for(cfg_lo, ladder_img, (48, 48))
    p_hi = _psnr_for(cfg_hi, ladder_img, (48, 48))
    assert p_hi >= p_lo - _TOL_DB, (p_lo, p_hi)


@pytest.mark.slow
def test_preset_quality_monotonic(ladder_img):
    """fastest <= fast <= medium decoded PSNR (within tolerance), the
    contract the reference's preset ladder guarantees on natural images
    (reference: Test/astc_test_functional.py quality ladder)."""
    ps = []
    for q in (Quality.FASTEST, Quality.FAST, Quality.MEDIUM):
        cfg = api.config_init(Profile.LDR, 6, 6, 1, q, 0)
        ps.append(_psnr_for(cfg, ladder_img, (48, 48)))
    assert ps[1] >= ps[0] - _TOL_DB, ps
    assert ps[2] >= ps[1] - _TOL_DB, ps


# ---------------------------------------------------------------------------
# Negative paths (reference: astc_test_functional.py block-size rejects)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bad", [(3, 3, 1), (7, 7, 1), (4, 12, 1),
                                 (13, 13, 1), (2, 2, 2), (7, 7, 7),
                                 (6, 6, 4)])
def test_illegal_block_sizes_rejected(bad):
    with pytest.raises(ConfigError):
        api.config_init(Profile.LDR, bad[0], bad[1], bad[2],
                        Quality.FASTEST, 0)


def test_db_limit_converted_to_mse_space():
    """context_alloc converts the dB quality limit into per-texel MSE
    (reference: astcenc_context_alloc, astcenc_entry.cpp:809-821); the
    early-exit economics of the whole compressor ride on this."""
    cfg = api.config_init(Profile.LDR, 6, 6, 1, Quality.MEDIUM, 0)
    db = cfg.tune_db_limit
    assert 30.0 < db < 70.0          # config space: dB
    ctx = api.context_alloc(cfg)
    mse = ctx.config.tune_db_limit
    expect = float(np.float32(0.1) ** np.float32(db * 0.1)
                   * np.float32(65535.0) * np.float32(65535.0))
    assert mse == pytest.approx(expect, rel=1e-6)
    assert cfg.tune_db_limit == db   # caller's config untouched
