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


def test_shard_blocks_strided_and_complete(tmp_path):
    data = bytes(range(10)) * 1000  # 10 KB
    bs = 1 << 10
    path = tmp_path / "f.bin"
    path.write_bytes(data)
    seen = {}
    for pid in range(3):
        nblocks, mine = multihost._shard_blocks_from_bytes(data, bs, pid, 3)
        nblocks_f, mine_f = multihost._shard_blocks_from_file(
            str(path), bs, pid, 3
        )
        assert nblocks == nblocks_f == 10
        assert mine == mine_f  # seek-based reads == byte-slice reads
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


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_cpu(tmp_path):
    """REAL nproc=2 jax.distributed run over localhost: strided per-process
    file reads, socket gather-to-0, container byte-identical to the oracle's
    single-stream output (SURVEY.md §2.4 P3/P4)."""
    import subprocess
    import sys as _sys

    data = make_corpus("text", 3 * (1 << 15) + 12345, seed=11)  # 4 blocks @ L0
    inpath = tmp_path / "input.bin"
    inpath.write_bytes(data)
    worker = str(
        (__import__("pathlib").Path(__file__).parent / "_mh_worker.py")
    )
    coord, gather = _free_port(), _free_port()
    env = dict(__import__("os").environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [_sys.executable, worker, str(pid), "2", str(coord), str(gather),
             str(inpath), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=840) for p in procs]
    rcs = [p.returncode for p in procs]
    if 17 in rcs:
        # The skip must not silently mask a regression (round-2 advisor
        # note): only skip when the IMAGE genuinely lacks a working
        # jax.distributed — probed with a 1-process init in a subprocess.
        probe = subprocess.run(
            [_sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms', 'cpu');"
             "jax.distributed.initialize('127.0.0.1:%d', 1, 0);"
             "print('ok')" % _free_port()],
            capture_output=True, timeout=300,
        )
        if b"ok" in probe.stdout:
            pytest.fail(
                "worker reported jax.distributed unavailable (rc 17) but a "
                "1-process init works: "
                + outs[rcs.index(17)][1].decode()[-2000:]
            )
        pytest.skip("jax.distributed unavailable in this environment")
    assert rcs == [0, 0], [o[1].decode()[-2000:] for o in outs]

    got = (tmp_path / "container.salz").read_bytes()
    ref = io.BytesIO()
    bs = fmt.block_size_for_level(0)
    container.compress_stream(
        io.BytesIO(data), ref, bs, container.get_codec("python", bs)
    )
    assert got == ref.getvalue()
    # global stats agree on both processes
    s0 = (tmp_path / "stats_0.txt").read_text().split()
    s1 = (tmp_path / "stats_1.txt").read_text().split()
    assert s0 == s1
    assert int(s0[0]) == len(data)
