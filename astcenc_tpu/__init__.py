"""astcenc_tpu: a TPU-native batched ASTC texture codec.

A ground-up JAX/XLA/Pallas reimplementation of the capabilities of the
ARM astc-encoder reference codec, redesigned for batched data-parallel
execution on TPU: per-block heuristic search becomes masked batched candidate
trials over thousands of blocks at once.

Public API mirrors the reference's astcenc.h surface:
  config_init / context_alloc / compress_image / decompress_image / ...
"""

__version__ = "0.1.0"

import os as _os

# On single-CPU hosts XLA:CPU's multi-threaded Eigen executor can deadlock
# waiting for a worker that never runs; force single-threaded execution
# there (no throughput cost with one core). Must be set before jax import.
if _os.cpu_count() == 1:
    _flags = _os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_multi_thread_eigen" not in _flags:
        _os.environ["XLA_FLAGS"] = (
            _flags + " --xla_cpu_multi_thread_eigen=false").strip()

import jax as _jax

# The batched codec graphs are large; persistent compilation caching is
# essential for interactive use. Opt out with ASTC_JAX_CACHE=none.
# CPU runs skip the on-disk cache BY DEFAULT: jax 0.9.0's XLA:CPU AOT
# loader segfaults on this host deserializing its own cache entries (see
# tests/conftest.py). TPU/axon runs keep it, and an explicit
# ASTC_JAX_CACHE=<dir> opts back in on any backend (the crash risk is
# then the caller's informed choice — needed for usable CPU iteration).
_cache = _os.environ.get("ASTC_JAX_CACHE")
_plat = _os.environ.get("JAX_PLATFORMS", "")
if _plat:
    # This jax build does not honor the JAX_PLATFORMS env var (observed:
    # JAX_PLATFORMS=cpu still initializes the axon TPU plugin and hangs
    # when the tunnel is down); mirror it into the config, which works.
    _jax.config.update("jax_platforms", _plat)
if _cache is None and "cpu" not in _plat.split(","):
    _cache = "/tmp/jax_cache"
if _cache and _cache != "none":
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
