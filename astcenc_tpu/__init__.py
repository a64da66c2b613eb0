"""astcenc_tpu: a TPU-native batched ASTC texture codec.

A ground-up JAX/XLA/Pallas reimplementation of the capabilities of the
ARM astc-encoder reference codec, redesigned for batched data-parallel
execution on TPU: per-block heuristic search becomes masked batched candidate
trials over thousands of blocks at once.

Public API mirrors the reference's astcenc.h surface:
  config_init / context_alloc / compress_image / decompress_image / ...
"""

__version__ = "0.1.0"
