"""Multi-chip execution: block-data-parallel sharding over a device mesh.

The ASTC codec is embarrassingly parallel over blocks — the TPU replacement
for the reference's ParallelManager work-stealing scheduler
(reference: Source/astcenc_internal_entry.h:97-324) is simply sharding the
(N, ...) block axis across chips with zero collectives in the hot loop
(SURVEY.md §2.4). ICI traffic is nil; DCN is only touched by host-side
image scatter/gather.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "blocks") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def shard_blocks(mesh: Mesh, array, axis_name: str = "blocks"):
    """Place a (N, ...) array with the N axis sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(array, sharding)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def compress_blocks_sharded(ctx, texels, mesh: Mesh | None = None):
    """Compress (N, T, 4) texel blocks sharded across a mesh.

    Pads N to a multiple of the mesh size, shards, runs the jitted batched
    compressor (which contains no cross-block communication), and gathers
    the (N, 16) result.
    """
    from ..codec import compress as compress_mod
    from ..codec.trial import build_encoder_tables

    if mesh is None:
        mesh = make_mesh()
    if not hasattr(ctx, "_enc_key"):
        ctx._enc_key = compress_mod.EncKey(build_encoder_tables(ctx.bsd),
                                           ctx.bsd)
    cfgs = compress_mod._CfgStatic(ctx.config)

    n = texels.shape[0]
    ndev = mesh.devices.size
    npad = pad_to_multiple(max(n, ndev), ndev)
    if npad != n:
        pad = np.broadcast_to(np.asarray(texels)[:1],
                              (npad - n,) + texels.shape[1:])
        texels = np.concatenate([np.asarray(texels), pad], axis=0)

    xs = shard_blocks(mesh, np.asarray(texels, np.float32))
    pcb = compress_mod.compress_symbolic_batch(ctx._dtables_key,
                                               ctx._enc_key, cfgs, xs)
    return np.asarray(pcb)[:n]


def decompress_blocks_sharded(ctx, blocks, mesh: Mesh | None = None,
                              decode_unorm8: bool = False):
    """Decompress (N, 16) blocks sharded across a mesh."""
    from ..codec import decompress as dec_mod

    if mesh is None:
        mesh = make_mesh()
    n = blocks.shape[0]
    ndev = mesh.devices.size
    npad = pad_to_multiple(max(n, ndev), ndev)
    if npad != n:
        pad = np.zeros((npad - n, 16), np.uint8)
        blocks = np.concatenate([np.asarray(blocks), pad], axis=0)

    xs = shard_blocks(mesh, np.asarray(blocks, np.uint8))
    out_sharding = NamedSharding(mesh, P("blocks"))
    fn = jax.jit(dec_mod.decompress_symbolic_batch,
                 static_argnums=(0, 2, 3), out_shardings=out_sharding)
    out = fn(ctx._dtables_key, xs, int(ctx.config.profile), decode_unorm8)
    return np.asarray(out)[:n]
