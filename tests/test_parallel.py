"""Multi-device sharding tests (8-device virtual CPU mesh via conftest)."""

import numpy as np
import pytest

import jax


def test_mesh_construction():
    from astcenc_tpu.parallel import sharding
    mesh = sharding.make_mesh()
    assert mesh.devices.size == len(jax.devices())


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__
    n = min(8, len(jax.devices()))
    __graft_entry__.dryrun_multichip(n)


@pytest.mark.slow
def test_sharded_matches_single_device():
    """Sharding layout must not change encoded output (the TPU analog of the
    reference's thread-count invariance guarantee,
    astc_test_functional.py:1357)."""
    from astcenc_tpu import api
    from astcenc_tpu.codec import compress as compress_mod
    from astcenc_tpu.config import Profile, Quality
    from astcenc_tpu.parallel import sharding

    cfg = api.config_init(Profile.LDR, 4, 4, 1, Quality.FASTEST, 0)
    ctx = api.context_alloc(cfg)
    ctx._enc_key = api._enc_key(ctx.bsd)
    cfgs = compress_mod._CfgStatic(ctx.config)

    rng = np.random.RandomState(11)
    texels = (rng.rand(64, 16, 4).astype(np.float32) * 65535.0)

    single = np.asarray(compress_mod.compress_symbolic_batch(
        ctx._dtables_key, ctx._enc_key, cfgs, texels))

    mesh = sharding.make_mesh()
    sharded = sharding.compress_blocks_sharded(ctx, texels, mesh)
    np.testing.assert_array_equal(single, sharded)
