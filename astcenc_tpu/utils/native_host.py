"""ctypes bridge to the native host runtime (native/astc_host.cpp).

Loads native/libastc_host.so when present (build with native/build.sh) and
exposes the host-side block reorder fast paths; callers fall back to their
numpy formulations when the library is absent or shapes are unsupported.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(root, "native", "libastc_host.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.blockify_2d_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int, f32p]
        lib.blockify_2d_u8.restype = None
        lib.deblockify_2d_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int, u8p]
        lib.deblockify_2d_u8.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def blockify_2d_u8(img: np.ndarray, bx: int, by: int):
    """(H, W, 4) u8 -> (ny*nx, by*bx, 4) f32 in [0, 65535], or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None or img.dtype != np.uint8 or img.ndim != 3 \
            or img.shape[2] != 4:
        return None
    img = np.ascontiguousarray(img)
    H, W, _ = img.shape
    nx = (W + bx - 1) // bx
    ny = (H + by - 1) // by
    out = np.empty((ny * nx, by * bx, 4), np.float32)
    lib.blockify_2d_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W, bx, by,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def deblockify_2d_u8(blocks: np.ndarray, H: int, W: int, bx: int, by: int):
    """(ny*nx, by*bx, 4) u8 -> (H, W, 4) u8, or None if unavailable."""
    lib = _load()
    if lib is None or blocks.dtype != np.uint8:
        return None
    blocks = np.ascontiguousarray(blocks)
    out = np.empty((H, W, 4), np.uint8)
    lib.deblockify_2d_u8(
        blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W, bx, by,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
