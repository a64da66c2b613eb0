"""Wavefront-compacted runner parity with the monolithic pipeline.

The CompactRunner is the production TPU dispatch path (compress_image uses
it off-CPU; bench.py always): stage1 runs full width, then 2-plane /
multi-partition stages run only on unfinished lanes, gathered into
static-size slices and scattered back with donated (in-place) state
buffers. None of that re-ordering may change a single output bit vs the
monolithic single-jit formulation — the analog of the reference encoder
producing identical files at any thread count
(Test/astc_test_functional.py:1357-1380).
"""

import numpy as np
import pytest

import jax

from astcenc_tpu import api
from astcenc_tpu.codec import compress as cm
from astcenc_tpu.config import Profile, Quality


def _mixed_blocks(n, t, rng):
    """Content hitting every schedule path: const, gradient, two-material,
    decorrelated-alpha, and noise lanes."""
    tex = np.zeros((n, t, 4), np.float32)
    for i in range(n):
        k = i % 5
        if k == 0:
            tex[i] = rng.rand(4) * 65535
        elif k == 1:
            g = np.linspace(0, 1, t)[:, None]
            tex[i] = 10000 + 40000 * g * rng.rand(4)
        elif k == 2:
            m = (np.arange(t) >= t // 2).astype(np.float32)[:, None]
            tex[i] = m * (rng.rand(4) * 65535) + (1 - m) * (rng.rand(4)
                                                            * 65535)
        elif k == 3:
            g = np.linspace(0, 1, t)
            tex[i, :, :3] = (15000 + 30000 * g)[:, None]
            tex[i, :, 3] = 65535 * ((np.arange(t) * 7) % 3) / 2
        else:
            tex[i] = rng.rand(t, 4) * 65535
    return np.clip(tex, 0, 65535)


@pytest.mark.slow
def test_compact_equals_mono_4x4_fastest():
    cfg = api.config_init(Profile.LDR, 4, 4, 1, Quality.FASTEST, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = api._enc_key(ctx.bsd)
    cfgs = cm._CfgStatic(ctx.config)

    tex = _mixed_blocks(512, 16, np.random.RandomState(3))
    mono = np.asarray(cm.compress_symbolic_batch_mono(
        ctx._dtables_key, ctx._enc_key, cfgs, jax.device_put(tex)))

    runner = cm.CompactRunner(ctx._dtables_key, ctx._enc_key, cfgs)
    comp = runner.run(jax.device_put(tex))
    np.testing.assert_array_equal(mono, comp)

    # Donated state buffers must not leak across runs: a second pass over
    # the same input has to reproduce the same blocks.
    comp2 = runner.run(jax.device_put(tex))
    np.testing.assert_array_equal(comp, comp2)

    # Pipelined multi-chunk dispatch matches per-chunk serial runs.
    chunks = [jax.device_put(_mixed_blocks(256, 16,
                                           np.random.RandomState(10 + i)))
              for i in range(3)]
    piped = list(runner.pipeline(iter(chunks), depth=2))
    for ch, got in zip(chunks, piped):
        np.testing.assert_array_equal(runner.run(ch), got)
