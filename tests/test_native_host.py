"""Native host runtime (native/astc_host.cpp) vs the numpy formulation.

Builds the shared object on demand (g++ is part of the toolchain); skips
when no compiler is available.
"""

import os
import subprocess

import numpy as np
import pytest

from astcenc_tpu.utils import native_host

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def lib():
    so = os.path.join(ROOT, "native", "libastc_host.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["sh", os.path.join(ROOT, "native", "build.sh")],
                           check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            pytest.skip("no native toolchain")
    native_host._TRIED = False
    native_host._LIB = None
    if native_host._load() is None:
        pytest.skip("libastc_host.so unavailable")
    return True


@pytest.mark.parametrize("hw,block", [((17, 23), (6, 6)), ((64, 64), (4, 4)),
                                      ((33, 95), (12, 12)),
                                      ((5, 5), (8, 8))])
def test_blockify_matches_numpy(lib, hw, block):
    H, W = hw
    bx, by = block
    rng = np.random.RandomState(H * W)
    img = rng.randint(0, 256, (H, W, 4), np.uint8)

    out = native_host.blockify_2d_u8(img, bx, by)
    assert out is not None

    nx = (W + bx - 1) // bx
    ny = (H + by - 1) // by
    idx_x = np.minimum(np.arange(nx * bx), W - 1)
    idx_y = np.minimum(np.arange(ny * by), H - 1)
    padded = (img[np.ix_(idx_y, idx_x)].astype(np.float32)
              * (65535.0 / 255.0))
    ref = padded.reshape(ny, by, nx, bx, 4).transpose(0, 2, 1, 3, 4)
    ref = ref.reshape(ny * nx, by * bx, 4)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("hw,block", [((17, 23), (6, 6)), ((48, 32), (8, 8))])
def test_deblockify_roundtrip(lib, hw, block):
    H, W = hw
    bx, by = block
    nx = (W + bx - 1) // bx
    ny = (H + by - 1) // by
    rng = np.random.RandomState(3)
    blocks = rng.randint(0, 256, (ny * nx, by * bx, 4), np.uint8)
    out = native_host.deblockify_2d_u8(blocks, H, W, bx, by)
    assert out is not None
    grid = blocks.reshape(ny, nx, by, bx, 4)
    ref = grid.transpose(0, 2, 1, 3, 4).reshape(ny * by, nx * bx, 4)
    np.testing.assert_array_equal(out, ref[:H, :W])
