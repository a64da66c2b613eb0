"""Encoder NaN/Inf input sanitization, per profile.

Float inputs containing NaN/Inf must compress to decodable output, never
propagate NaN into the search (reference: encode_texel_unorm /
float_to_lns clamping, astcenc_image.cpp:129-159; behavioral spec
UnitTest/test_encode.cpp:152-296).

Kept in its own file (small number of compiled programs, one context per
profile) — the XLA:CPU AOT loader segfaults in processes holding many
executables on this host (see tests/conftest.py).
"""

import numpy as np
import pytest

from astcenc_tpu import api
from astcenc_tpu.config import Profile, Quality


@pytest.mark.parametrize("profile", [Profile.LDR, Profile.HDR,
                                     Profile.HDR_RGB_LDR_A])
def test_encode_nan_inf_input(profile):
    cfg = api.config_init(profile, 4, 4, 1, Quality.FASTEST, 0)
    ctx = api.context_alloc(cfg)
    for bad in (np.nan, np.inf, -np.inf):
        for chan in range(4):
            img = np.full((4, 4, 4), 0.5, np.float32)
            img[0, 0, chan] = bad
            blocks = api.compress_image(ctx, img)
            assert blocks.shape == (1, 16)
            out = api.decompress_image(ctx, blocks, 4, 4, 1, out_type="f32")
            assert np.isfinite(out).all(), (profile, bad, chan)
            # The untouched texels must still decode close to 0.5
            assert abs(float(out[0, 3, 3, 1]) - 0.5) < 0.1
