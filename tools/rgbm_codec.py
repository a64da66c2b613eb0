#!/usr/bin/env python3
"""RGBM pre/post processor: HDR <-> RGBM corpus preparation utility.

Encodes an HDR image into an RGBM-encoded LDR PNG (RGB scaled into the
shared per-pixel multiplier M stored in alpha), or decodes an RGBM PNG
back to HDR. Vectorized equivalent of the reference utility
(/root/reference/Utils/astc_rgbm_codec.cpp).

Usage: python tools/rgbm_codec.py [-ch|-dh] <M> <low_clamp> <source> <dest>
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def rgbm_encode(hdr: np.ndarray, m_mult: float, low_clamp: float
                ) -> np.ndarray:
    """HDR float (H, W, >=3) -> RGBM uint8 (H, W, 4).

    Per pixel: scale RGB by 1/M, round the max channel UP to the next
    representable M step (so decode never undershoots), clamp M well above
    zero to avoid compressor clamps (reference: astc_rgbm_codec.cpp:88-117).
    """
    rgb = hdr[..., :3].astype(np.float32) / float(m_mult)
    max_rgb = rgb.max(axis=-1)
    m_scale = np.minimum(1.0, np.ceil(max_rgb * 255.0) / 255.0)
    m_scale = np.maximum(m_scale, float(low_clamp) / 255.0)
    scale = np.minimum(1.0, rgb / m_scale[..., None])
    out = np.empty(hdr.shape[:2] + (4,), np.uint8)
    # Truncating u8 conversion, matching the reference's (uint8_t) casts
    out[..., :3] = (scale * 255.0).astype(np.uint8)
    out[..., 3] = (m_scale * 255.0).astype(np.uint8)
    return out


def rgbm_decode(rgbm: np.ndarray, m_mult: float) -> np.ndarray:
    """RGBM uint8 (H, W, 4) -> HDR float32 (H, W, 4), alpha=1
    (reference: astc_rgbm_codec.cpp:139-168)."""
    f = rgbm.astype(np.float32) / 255.0
    out = np.empty(rgbm.shape[:2] + (4,), np.float32)
    out[..., :3] = f[..., :3] * (f[..., 3:4] * float(m_mult))
    out[..., 3] = 1.0
    return out


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 5 or argv[0] not in ("-ch", "-dh"):
        print("Usage: rgbm_codec.py [-ch|-dh] <M> <low_clamp> "
              "<source> <dest>")
        return 1
    mode, m_mult, low_clamp = argv[0], float(argv[1]), float(argv[2])
    src, dst = argv[3], argv[4]

    from astcenc_tpu.io import image_io

    data, _, _ = image_io.load_image(src)
    if mode == "-ch":
        if data.dtype == np.uint8:
            data = data.astype(np.float32) / 255.0
        if data.shape[-1] < 3:
            data = np.repeat(data[..., :1], 3, axis=-1)
        image_io.save_image(dst, rgbm_encode(data, m_mult, low_clamp))
    else:
        if data.dtype != np.uint8:
            data = np.clip(data * 255.0, 0, 255).astype(np.uint8)
        if data.shape[-1] != 4:
            print("ERROR: RGBM input must have 4 components")
            return 1
        image_io.save_image(dst, rgbm_decode(data, m_mult))
    return 0


if __name__ == "__main__":
    sys.exit(main())
