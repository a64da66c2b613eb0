"""Per-block alpha channel-weight scaling (USE_ALPHA_WEIGHT / -a).

Reference behavior (astcenc_entry.cpp:1016-1035): with the flag set, each
block's r/g/b channel error weights are scaled by the block's max alpha,
biasing quality toward opaque regions. These tests pin down:
  1. opaque content is bit-identical with the flag on/off (scale == 1);
  2. translucent content actually changes encodings;
  3. the -a CLI path matches the reference encoder's output quality on an
     alpha-gradient image (slow, oracle-gated).
"""

import os
import struct
import subprocess

import numpy as np
import pytest

from astcenc_tpu import api
from astcenc_tpu.config import Flags, Profile, Quality


def _img_opaque(seed=0, size=24):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (size, size, 4), np.uint8)
    img[..., 3] = 255
    return img


def _img_alpha_gradient(seed=1, size=24):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (size, size, 4), np.uint8)
    # Alpha ramps 0 -> 255 across x: blocks span opaque..transparent
    img[..., 3] = np.broadcast_to(
        np.linspace(0, 255, size).astype(np.uint8)[None, :], (size, size))
    return img


def _encode(img, flags=0, quality=Quality.FASTEST):
    cfg = api.config_init(Profile.LDR, 4, 4, 1, quality, flags)
    ctx = api.context_alloc(cfg)
    return np.asarray(api.compress_image(ctx, img))


def test_opaque_invariant_under_alpha_weight():
    img = _img_opaque()
    base = _encode(img, 0)
    aw = _encode(img, int(Flags.USE_ALPHA_WEIGHT))
    assert np.array_equal(base, aw), \
        "alpha weighting must be a no-op on fully opaque blocks (scale=1)"


def test_translucent_changes_encoding():
    img = _img_alpha_gradient()
    base = _encode(img, 0)
    aw = _encode(img, int(Flags.USE_ALPHA_WEIGHT))
    assert not np.array_equal(base, aw), \
        "alpha weighting should change encodings of translucent blocks"


def test_block_state_cw_scale():
    import jax.numpy as jnp
    from astcenc_tpu.codec import compress as cmod
    tex = jnp.zeros((2, 16, 4), jnp.float32)
    tex = tex.at[0, :, 3].set(65535.0)
    tex = tex.at[1, :, 3].set(32767.5)
    st = cmod.make_block_state(tex, (1, 1, 1, 1), alpha_weight=True)
    s = np.asarray(st["cw_scale"])
    assert s[0] == pytest.approx(1.0)
    assert s[1] == pytest.approx(0.5, abs=1e-4)
    st2 = cmod.make_block_state(tex, (1, 1, 1, 1), alpha_weight=False)
    assert "cw_scale" not in st2


@pytest.mark.slow
def test_alpha_weight_vs_reference(ref_binary, tmp_path):
    """Encode an alpha-gradient image at -a 1 here and in the reference;
    their alpha-weighted PSNRs must agree within the 0.05 dB gate
    (BASELINE.json contract; VERDICT r1 item 4)."""
    from PIL import Image
    from astcenc_tpu import cli
    from astcenc_tpu.io import astc_file, image_io
    from astcenc_tpu.utils import metrics

    img = _img_alpha_gradient(seed=7, size=48)
    src = str(tmp_path / "in.png")
    Image.fromarray(img, "RGBA").save(src)

    # Ours
    ours_astc = str(tmp_path / "ours.astc")
    rc = cli.main(["-cl", src, ours_astc, "4x4", "-medium", "-a", "1",
                   "-silent"])
    assert rc in (0, None)
    # Reference
    ref_astc = str(tmp_path / "ref.astc")
    subprocess.run([ref_binary, "-cl", src, ref_astc, "4x4", "-medium",
                    "-a", "1", "-silent", "-j", "1"], check=True,
                   capture_output=True)

    # Decode BOTH via the reference binary (neutral decoder)
    def ref_decode(astc):
        png = astc + ".png"
        subprocess.run([ref_binary, "-dl", astc, png, "-silent"],
                       check=True, capture_output=True)
        return np.asarray(Image.open(png).convert("RGBA"))

    d_ours = ref_decode(ours_astc)
    d_ref = ref_decode(ref_astc)
    m_ours = metrics.compute_error_metrics(img, d_ours, 4)
    m_ref = metrics.compute_error_metrics(img, d_ref, 4)
    assert m_ours["alpha_psnr"] >= m_ref["alpha_psnr"] - 0.05, \
        (m_ours, m_ref)
    assert m_ours["psnr"] >= m_ref["psnr"] - 0.05, (m_ours, m_ref)
