"""Image quality metrics.

Mirrors the reference CLI's compute_error_metrics
(reference: Source/astcenccli_error_metrics.cpp:110-413): PSNR, alpha PSNR,
luminance PSNR, normal-map angular PSNR, log-RMSE and mPSNR for HDR.
"""

from __future__ import annotations

import math

import numpy as np


def psnr(img_a: np.ndarray, img_b: np.ndarray, channels: int = 3) -> float:
    """Peak signal-to-noise ratio over the first `channels` channels.

    Inputs are float arrays in [0,1] or uint8.
    """
    a = _norm(img_a)[..., :channels].astype(np.float64)
    b = _norm(img_b)[..., :channels].astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse <= 0:
        return 999.0
    return 10.0 * math.log10(1.0 / mse)


def alpha_psnr(img_a, img_b) -> float:
    return psnr(_norm(img_a)[..., 3:4], _norm(img_b)[..., 3:4], channels=1)


def luma_psnr(img_a, img_b) -> float:
    wa = _norm(img_a)
    wb = _norm(img_b)
    la = wa[..., 0] * 0.2126 + wa[..., 1] * 0.7152 + wa[..., 2] * 0.0722
    lb = wb[..., 0] * 0.2126 + wb[..., 1] * 0.7152 + wb[..., 2] * 0.0722
    return psnr(la[..., None], lb[..., None], channels=1)


def normal_angular_psnr(img_a, img_b) -> float:
    """Mean angular error PSNR for normal maps (X in R, Y in A)."""
    def vecs(img):
        w = _norm(img)
        x = w[..., 0] * 2.0 - 1.0
        y = w[..., 3] * 2.0 - 1.0
        z = np.sqrt(np.maximum(1.0 - x * x - y * y, 0.0))
        v = np.stack([x, y, z], -1)
        n = np.linalg.norm(v, axis=-1, keepdims=True)
        return v / np.maximum(n, 1e-10)
    va, vb = vecs(img_a), vecs(img_b)
    cosang = np.clip(np.sum(va * vb, -1), -1.0, 1.0)
    ang = np.arccos(cosang) / math.pi  # normalized 0..1
    mse = np.mean(ang ** 2)
    if mse <= 0:
        return 999.0
    return 10.0 * math.log10(1.0 / mse)


def log_rmse(img_a, img_b) -> float:
    a = np.maximum(_norm(img_a)[..., :3].astype(np.float64), 0)
    b = np.maximum(_norm(img_b)[..., :3].astype(np.float64), 0)
    return float(np.sqrt(np.mean((np.log(a + 1e-6) - np.log(b + 1e-6)) ** 2)))


def mpsnr(img_a, img_b, fstop_lo: int = -10, fstop_hi: int = 10) -> float:
    """Multi-exposure PSNR for HDR content (reference: :48-108)."""
    a = _norm(img_a)[..., :3].astype(np.float64)
    b = _norm(img_b)[..., :3].astype(np.float64)
    total = 0.0
    count = 0
    for fstop in range(fstop_lo, fstop_hi + 1):
        mul = 2.0 ** fstop
        ta = _tonemap(a * mul)
        tb = _tonemap(b * mul)
        total += np.sum((ta - tb) ** 2)
        count += a.size
    mse = total / count
    if mse <= 0:
        return 999.0
    return 10.0 * math.log10(255.0 * 255.0 / mse)


def _tonemap(x):
    x = np.clip(x, 0.0, 1.0)
    srgb = np.where(x <= 0.0031308, 12.92 * x,
                    1.055 * np.power(x, 1.0 / 2.4) - 0.055)
    return np.floor(srgb * 255.0 + 0.5)


def _norm(img):
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32)
