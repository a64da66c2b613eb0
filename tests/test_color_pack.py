"""Parity: phased (two-batched-lookup) LDR pack vs the straight-line
reference implementation it replaced.

The phased pack (color_pack.pack_color_endpoints_ldr) batches every
quantizer lookup of the whole pack into two QuantQ.lookup_many calls; it
must produce bit-identical formats and values to the original
per-call-site-lookup formulation (_pack_color_endpoints_ldr_ref), which
itself is validated by the encode goldens.
"""

import numpy as np
import jax.numpy as jnp

from astcenc_tpu.ops import color_pack as cp
from astcenc_tpu.ops import color_unquant as cuq


def _random_inputs(rng, n):
    ep0 = rng.uniform(-2000.0, 68000.0, (n, 4)).astype(np.float32)
    ep1 = rng.uniform(-2000.0, 68000.0, (n, 4)).astype(np.float32)
    # Include exact-tie and near-integer cases (residual branch boundaries)
    ep0[: n // 4] = np.round(ep0[: n // 4] / 257.0) * 257.0
    ep1[n // 4: n // 2] = ep0[n // 4: n // 2]
    rgbs = rng.uniform(0.0, 65535.0, (n, 4)).astype(np.float32)
    rgbs[:, 3] = rng.uniform(0.0, 1.0, n)
    fmts = np.array([cuq.FMT_RGB, cuq.FMT_RGBA, cuq.FMT_RGB_SCALE,
                     cuq.FMT_RGB_SCALE_ALPHA, cuq.FMT_LUMINANCE,
                     cuq.FMT_LUMINANCE_ALPHA], np.int32)
    req = fmts[rng.randint(0, len(fmts), n)]
    q = rng.randint(4, 21, n).astype(np.int32)
    return ep0, ep1, rgbs, req, q


def test_phased_pack_matches_reference():
    rng = np.random.RandomState(7)
    ep0, ep1, rgbs, req, q = _random_inputs(rng, 4096)
    args = tuple(jnp.asarray(a) for a in (ep0, ep1, rgbs, req, q))
    f_new, v_new = cp.pack_color_endpoints_ldr(*args)
    f_ref, v_ref = cp._pack_color_endpoints_ldr_ref(*args)
    np.testing.assert_array_equal(np.asarray(f_new), np.asarray(f_ref))
    np.testing.assert_array_equal(np.asarray(v_new), np.asarray(v_ref))


def test_lookup_many_matches_tables():
    rng = np.random.RandomState(3)
    n = 512
    qidx = rng.randint(0, 17, n).astype(np.int32)
    vals = rng.randint(-5, 300, (n, 9)).astype(np.int32)
    qq = cp.QuantQ(jnp.asarray(qidx))
    lo, hi = qq.lookup_many(jnp.asarray(vals))
    lo_t, hi_t = cp._quant_tables()
    v = np.clip(vals, 0, 255)
    np.testing.assert_array_equal(np.asarray(lo), lo_t[qidx[:, None], v])
    np.testing.assert_array_equal(np.asarray(hi), hi_t[qidx[:, None], v])
