"""Multi-host runtime: single-process degenerate path + shard logic.

The real multi-process path runs the same code over
jax.experimental.multihost_utils; block sharding, ordering, and container
assembly are all exercised here, and the collectives are the standard JAX
primitives covered by the sharding tests.
"""

import io

import numpy as np
import pytest

from conftest import make_corpus
from salz_tpu import container, format as fmt
from salz_tpu.oracle import pycodec as oc
from salz_tpu.parallel import multihost


def test_shard_blocks_strided_and_complete():
    data = bytes(range(10)) * 1000  # 10 KB
    bs = 1 << 10
    seen = {}
    for pid in range(3):
        nblocks, mine = multihost._shard_blocks(data, bs, pid, 3)
        assert nblocks == 10
        for i, blk in mine:
            assert i % 3 == pid
            assert blk == data[i * bs : (i + 1) * bs]
            seen[i] = blk
    assert sorted(seen) == list(range(10))


def test_single_process_container_matches_cli_path():
    data = make_corpus("text", 200000, seed=5)
    level = 0  # 32 KiB blocks -> several blocks
    payload, stats = multihost.compress_bytes_multihost(data, level=level)
    assert payload is not None
    # Must equal the regular single-stream container byte for byte.
    ref = io.BytesIO()
    codec = container.get_codec("python", fmt.block_size_for_level(level))
    container.compress_stream(
        io.BytesIO(data), ref, fmt.block_size_for_level(level), codec
    )
    assert payload == ref.getvalue()
    assert stats.plain_bytes == len(data)
    assert stats.coded_bytes == len(payload) - 8 - 4 * stats.num_blocks
    # and it roundtrips
    out = io.BytesIO()
    container.decompress_stream(
        io.BytesIO(payload), out,
        container.get_codec("python", fmt.block_size_for_level(level)),
    )
    assert out.getvalue() == data


def test_short_trailing_block_error_parity():
    bs = fmt.block_size_for_level(0)
    data = make_corpus("text", bs, seed=6) + b"abc"  # 3-byte trailing block
    with pytest.raises(ValueError):
        multihost.compress_bytes_multihost(data, level=0)
