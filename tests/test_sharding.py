"""Distributed tier on the virtual 8-device CPU mesh (SURVEY.md §4):
batch/vmap equality, shard_map data parallelism, psum stats."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from salz_tpu.oracle import pycodec as oc
from salz_tpu.ops.encoder import encode_blocks_device
from salz_tpu.parallel.sharding import (
    gather_segments,
    make_mesh,
    pad_blocks,
    sharded_encode_fn,
)
from conftest import make_corpus

CAP = 1024


def _mk_blocks(count, seed=0):
    rng = np.random.default_rng(seed)
    kinds = ["text", "runs", "repetitive", "zeros"]
    return [
        make_corpus(kinds[i % len(kinds)], int(rng.integers(8, CAP + 1)), seed=i)
        for i in range(count)
    ]


def test_batch_encode_matches_oracle():
    chunks = _mk_blocks(6, seed=1)
    blocks, lens = pad_blocks(chunks, CAP)
    outs, out_lens, _ = encode_blocks_device(
        jnp.asarray(blocks), jnp.asarray(lens), cap=CAP
    )
    segs = gather_segments(outs, out_lens)
    for seg, chunk in zip(segs, chunks):
        assert seg == oc.encode_block(chunk)


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_sharded_encode_matches_oracle(ndev):
    devices = jax.devices()[:ndev]
    assert len(devices) == ndev, "conftest must provide 8 virtual CPU devices"
    mesh = make_mesh(devices)
    step = sharded_encode_fn(mesh, cap=CAP)
    chunks = _mk_blocks(2 * ndev, seed=ndev)
    blocks, lens = pad_blocks(chunks, CAP)
    outs, out_lens, salz_lens, (plain, coded) = step(
        jnp.asarray(blocks), jnp.asarray(lens)
    )
    segs = gather_segments(outs, out_lens)
    for seg, chunk in zip(segs, chunks):
        assert seg == oc.encode_block(chunk)
    assert int(plain) == sum(len(c) for c in chunks)
    assert int(coded) == sum(len(s) for s in segs)


def test_sharded_results_identical_across_mesh_sizes():
    chunks = _mk_blocks(8, seed=42)
    blocks, lens = pad_blocks(chunks, CAP)
    results = []
    for ndev in (1, 2, 4, 8):
        mesh = make_mesh(jax.devices()[:ndev])
        step = sharded_encode_fn(mesh, cap=CAP)
        outs, out_lens, _, _ = step(jnp.asarray(blocks), jnp.asarray(lens))
        results.append(gather_segments(outs, out_lens))
    assert results[0] == results[1] == results[2] == results[3]
