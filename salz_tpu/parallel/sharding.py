"""Data-parallel block encoding over a device mesh.

The salz codec is stateless across blocks (salz.c:777-823), which makes the
block axis the natural data-parallel dimension (SURVEY.md §2.4): each device
encodes its blocks fully locally (SA, ANSV, parse, emission are intra-block by
construction — factor offsets never cross a block), and only tiny statistics
(bytes in/out) are reduced globally with psum over ICI. Variable-length
encoded segments are returned padded with a length vector; the host trims and
concatenates in container order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from salz_tpu.ops.encoder import encode_blocks_device, out_capacity


def make_mesh(devices=None, axis: str = "blocks") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def sharded_encode_fn(mesh: Mesh, *, cap: int, parse: str = "chunked"):
    """Build a jitted sharded batch encoder + global stats reduction.

    The returned callable takes (blocks uint8[B, cap], lens int32[B]) with B a
    multiple of the mesh size, encodes each shard's blocks locally, and
    returns (outs, out_lens, salz_lens, stats) where stats = (total plain
    bytes, total encoded bytes) reduced across the mesh with psum.
    """
    axis = mesh.axis_names[0]

    def per_shard(blocks, lens):
        outs, out_lens, salz_lens = encode_blocks_device(
            blocks, lens, cap=cap, parse=parse
        )
        # int32 is fine for per-jit-call stats (< 2 GiB per shard batch);
        # cumulative corpus totals are accumulated host-side in Python ints.
        plain = jax.lax.psum(jnp.sum(lens), axis)
        coded = jax.lax.psum(jnp.sum(out_lens), axis)
        return outs, out_lens, salz_lens, (plain, coded)

    shard = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis), P(axis), (P(), P())),
        # pallas_call outputs (the TPU token-start kernels) cannot declare
        # varying-mesh-axes metadata, so the vma check must be off.
        check_vma=False,
    )
    return jax.jit(shard)


def pad_blocks(chunks: list[bytes], cap: int):
    """Host helper: pack variable-length blocks into a padded batch."""
    B = len(chunks)
    blocks = np.zeros((B, cap), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, c in enumerate(chunks):
        blocks[i, : len(c)] = np.frombuffer(c, np.uint8)
        lens[i] = len(c)
    return blocks, lens


def gather_segments(outs, out_lens) -> list[bytes]:
    """Host helper: trim padded outputs back to container-order segments."""
    outs = np.asarray(outs)
    out_lens = np.asarray(out_lens)
    return [bytes(outs[i, : int(out_lens[i])]) for i in range(outs.shape[0])]
