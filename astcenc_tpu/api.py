"""Public API mirroring the reference's astcenc.h surface.

    config = config_init(profile, block_x, block_y, block_z, quality, flags)
    ctx = context_alloc(config)
    blocks = compress_image(ctx, image)          # (N, 16) uint8
    texels = decompress_image(ctx, blocks, ...)  # image array

Reference: Source/astcenc.h:725-894 (astcenc_config_init,
astcenc_context_alloc, astcenc_compress_image, astcenc_decompress_image,
astcenc_get_block_info, astcenc_context_free, astcenc_get_error_string).
The TPU design replaces the caller-owned thread pool with batched jit
execution; `thread_count` is accepted for API compatibility and ignored.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .codec import decode_tables, decompress
from .config import (PRESET_MAX, ASTCConfig, ConfigError, Error, Flags,
                     Profile, Quality, Swizzle, config_init, error_string,
                     validate_config)
from .tables.bsd import build_bsd

__all__ = [
    "Profile", "Quality", "Flags", "Swizzle", "ASTCConfig", "Error",
    "ConfigError", "config_init", "context_alloc", "compress_image",
    "decompress_image", "get_error_string", "Context",
]


@dataclasses.dataclass
class Context:
    """Compression/decompression context: config + derived device tables.

    TPU analog of astcenc_context (reference: astcenc_internal_entry.h): the
    block size descriptor becomes device-resident constant tensors; the
    working buffers become jit-cached compiled functions.
    """

    config: ASTCConfig
    bsd: object
    dtables: object
    _dtables_key: object

    @property
    def block_dims(self):
        return (self.config.block_x, self.config.block_y, self.config.block_z)


# Derived-table cache keyed by BSD identity. build_bsd is functools.cached
# by its config parameters, so two contexts with the same (block size,
# quality-derived cutoffs) share one BSD object — and through this cache
# they then share the SAME DecodeTables / TablesKey / EncKey objects.
# Those keys are static jit arguments hashed by identity, so sharing them
# is what makes the jit cache hit across context_alloc calls: without it,
# every new context recompiled the entire pipeline per image (the
# "per-image recompile chasm"). Reference analog: parent/child contexts
# sharing one read-only block_size_descriptor (astcenc_entry.cpp:784-807).
_derived_cache: dict = {}


def _derived_tables(bsd):
    ent = _derived_cache.get(id(bsd))
    if ent is None:
        dt = decode_tables.build_decode_tables(bsd)
        ent = {"dt": dt, "dtables_key": decompress.TablesKey(dt)}
        _derived_cache[id(bsd)] = ent
    return ent


def _enc_key(bsd):
    """Shared encoder-tables key for a (cached) BSD; built lazily because
    decompress-only contexts never need the encoder tables."""
    ent = _derived_cache[id(bsd)]
    if "enc_key" not in ent:
        from .codec import compress as compress_mod
        from .codec.trial import build_encoder_tables
        ent["enc_key"] = compress_mod.EncKey(build_encoder_tables(bsd), bsd)
    return ent["enc_key"]


def context_alloc(config: ASTCConfig, thread_count: int = 0) -> Context:
    """Build a context (reference: astcenc_context_alloc, astcenc_entry.cpp:726)."""
    del thread_count  # batched execution replaces the caller thread pool
    validate_config(config)

    decompress_only = bool(config.flags & Flags.DECOMPRESS_ONLY)
    self_decompress = bool(config.flags & Flags.SELF_DECOMPRESS_ONLY)
    can_omit = self_decompress and not decompress_only

    # The context owns a converted copy of the config: the dB quality limit
    # becomes a per-texel MSE threshold in the 0..65535 texel domain so the
    # compressor's early exits compare raw squared error directly
    # (reference: astcenc_context_alloc, astcenc_entry.cpp:809-821).
    config = dataclasses.replace(config)
    if not decompress_only:
        if int(config.profile) in (int(Profile.LDR), int(Profile.LDR_SRGB)):
            config.tune_db_limit = float(
                np.float32(0.1) ** np.float32(config.tune_db_limit * 0.1)
                * np.float32(65535.0) * np.float32(65535.0))
        else:
            config.tune_db_limit = 0.0

    bsd = build_bsd(config.block_x, config.block_y, config.block_z,
                    can_omit_modes=can_omit,
                    mode_cutoff=config.tune_block_mode_limit / 100.0,
                    partition_count_cutoff=config.tune_partition_count_limit)
    ent = _derived_tables(bsd)
    return Context(config=config, bsd=bsd, dtables=ent["dt"],
                   _dtables_key=ent["dtables_key"])


def decompress_blocks(ctx: Context, blocks: np.ndarray,
                      decode_unorm8: bool = False):
    """Decode raw (N, 16) blocks to (N, texels, 4) float32 texels."""
    blocks = np.ascontiguousarray(blocks, dtype=np.uint8)
    out = decompress.decompress_symbolic_batch(
        ctx._dtables_key, blocks, int(ctx.config.profile), bool(decode_unorm8))
    return np.asarray(out)


def decompress_image(ctx: Context, blocks: np.ndarray, dim_x: int, dim_y: int,
                     dim_z: int = 1, out_type: str = "u8",
                     swizzle: tuple = (0, 1, 2, 3)) -> np.ndarray:
    """Decode blocks to an image array.

    Args:
      ctx: context.
      blocks: (N, 16) uint8 physical blocks in raster order.
      dim_x/y/z: output image dimensions.
      out_type: "u8", "f16", or "f32".
      swizzle: output component swizzle (Swizzle values).

    Returns:
      (dim_z, dim_y, dim_x, 4) array: uint8, float16, or float32.

    Reference: astcenc_decompress_image (astcenc_entry.cpp:1274) +
    store_image_block (astcenc_image.cpp:345).
    """
    bx, by, bz = ctx.block_dims
    nx = (dim_x + bx - 1) // bx
    ny = (dim_y + by - 1) // by
    nz = (dim_z + bz - 1) // bz
    n = nx * ny * nz
    if blocks.shape[0] < n:
        raise ValueError(f"expected {n} blocks, got {blocks.shape[0]}")

    decode_unorm8 = (out_type == "u8")
    texels = decompress_blocks(ctx, blocks[:n], decode_unorm8)  # (N, T, 4) f32

    # Scatter blocks into the padded image, then crop
    img = texels.reshape(nz, ny, nx, bz, by, bx, 4)
    img = img.transpose(0, 3, 1, 4, 2, 5, 6).reshape(nz * bz, ny * by, nx * bx, 4)
    img = img[:dim_z, :dim_y, :dim_x]

    img = _apply_store_swizzle(img, swizzle, out_type)

    if out_type == "u8":
        nan = np.isnan(img[..., 0:1])
        u8 = np.clip(img, 0.0, 1.0) * 255.0
        u8 = np.floor(np.nan_to_num(u8) + 0.5).astype(np.uint8)
        # NaN error texels decode to magenta (reference: astcenc_image.cpp:437-446)
        u8 = np.where(nan, np.array([255, 0, 255, 255], np.uint8), u8)
        return u8
    if out_type == "f16":
        return img.astype(np.float16)
    return img.astype(np.float32)


def _apply_store_swizzle(img, swizzle, out_type):
    if tuple(swizzle) == (0, 1, 2, 3):
        return img
    chans = {
        0: img[..., 0], 1: img[..., 1], 2: img[..., 2], 3: img[..., 3],
        4: np.zeros_like(img[..., 0]), 5: np.ones_like(img[..., 0]),
    }
    if 6 in swizzle:
        # Normal-map Z reconstruction (reference: astcenc_image.cpp:420-429)
        xn = img[..., 0] * 2.0 - 1.0
        yn = img[..., 3] * 2.0 - 1.0
        zn = np.maximum(1.0 - xn * xn - yn * yn, 0.0)
        chans[6] = np.minimum(np.sqrt(zn) * 0.5 + 0.5, 1.0)
    return np.stack([chans[s] for s in swizzle], axis=-1)


def compress_image(ctx: Context, image: np.ndarray, swizzle=(0, 1, 2, 3),
                   progress_callback=None, tracer=None):
    """Compress an image to (N, 16) blocks. Implemented in codec.compress.

    progress_callback, if given, is invoked with a float in [0, 100] after
    each compressed chunk (the batched analog of the reference's throttled
    progress callbacks, astcenc.h:320-322). tracer, if given, captures the
    block/pass/candidate diagnostic tree (codec.trace.Tracer; the analog
    of the reference's ASTCENC_DIAGNOSTICS -dtrace build).
    """
    from .codec import compress as compress_mod
    return compress_mod.compress_image(ctx, image, swizzle,
                                       progress_callback=progress_callback,
                                       tracer=tracer)


def compress_reset(ctx: Context) -> None:
    """Re-arm a context between images.

    The reference re-arms its work-stealing scheduler here
    (astcenc_compress_reset, astcenc_entry.cpp:1231-1248); the batched
    pipeline is stateless between images, so this is a no-op provided for
    API compatibility.
    """


def compress_cancel(ctx: Context) -> None:
    """Request cancellation of an in-flight compression.

    Chunked host-side execution makes cancellation natural: setting the flag
    stops submission of further chunks (reference: astcenc_compress_cancel,
    astcenc_entry.cpp:1251-1271).
    """
    ctx._cancel_requested = True


def get_error_string(status) -> str | None:
    """Stable error-code string (reference: astcenc_get_error_string,
    astcenc_entry.cpp:1519-1558).

    Accepts an Error value, an int, or a raised ConfigError (whose .code is
    used). Out-of-enum values return None, matching the reference nullptr.
    """
    if isinstance(status, ConfigError):
        status = status.code
    return error_string(status)


def get_block_info(ctx: Context, block: np.ndarray) -> dict:
    """Decode the encoding metadata of one physical block.

    The batched analog of astcenc_get_block_info (reference:
    astcenc_entry.cpp:1401-1517), used by diagnostic tooling.
    """
    from .codec import block_info
    return block_info.get_block_info(ctx, np.asarray(block, np.uint8))
