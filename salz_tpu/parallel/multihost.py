"""Multi-host data-parallel compression runtime (SURVEY.md §2.4 P4).

The reference is single-process (no NCCL/MPI anywhere in its tree); this is
the TPU-native scale-out layer built on `jax.distributed` + a global device
mesh. The salz container's independent length-prefixed segments
(salzcli.c:163-179) make the mapping embarrassingly parallel and restartable:

  * every process ingests its own strided shard of the file's blocks
    (block i belongs to process i % num_processes),
  * each process encodes its blocks locally (the whole per-block pipeline is
    intra-block by construction — factor offsets never cross a block,
    salz.c:555-558),
  * per-process (bytes in, bytes out) stats are psum-reduced over the global
    mesh via `process_allgather`,
  * process 0 gathers the variable-length segments (padded device buffers +
    a length vector) and assembles the container in block order.

Single-process degenerates to the local batched path, so the whole module is
exercised by the regular test suite; on a pod slice, call
`initialize_distributed()` first (standard JAX multi-process bootstrap).
"""

from __future__ import annotations

import io
from dataclasses import dataclass
from typing import BinaryIO

import numpy as np

from salz_tpu import container
from salz_tpu import format as fmt


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up jax.distributed (no-op if already initialized or 1 process).

    With no arguments JAX auto-detects the TPU pod environment
    (megascale/TPU metadata); arguments are for explicit bootstrap.
    """
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # Single-process environment (or already initialized): fine.
        pass


@dataclass
class ShardStats:
    plain_bytes: int
    coded_bytes: int
    num_blocks: int

    @property
    def ratio(self) -> float:
        return self.plain_bytes / self.coded_bytes if self.coded_bytes else 0.0


def _shard_blocks(data: bytes, block_size: int, pid: int, nproc: int):
    """Strided block shard for process `pid` (block i -> process i % nproc)."""
    nblocks = max(1, -(-len(data) // block_size))
    mine = []
    for i in range(pid, nblocks, nproc):
        mine.append((i, data[i * block_size : (i + 1) * block_size]))
    return nblocks, mine


def compress_bytes_multihost(
    data: bytes, level: int = fmt.DEFAULT_LEVEL, batch: int = 8
) -> tuple[bytes | None, ShardStats]:
    """Compress `data` data-parallel across all JAX processes.

    Every process must call this with the SAME data (each then encodes only
    its strided shard). Returns (container bytes on process 0, None
    elsewhere; global stats on every process).
    """
    import jax
    from jax.experimental import multihost_utils

    from salz_tpu.ops.encoder import BatchBlockEncoder

    pid = jax.process_index()
    nproc = jax.process_count()
    block_size = fmt.block_size_for_level(level)
    dst_cap = fmt.encoded_len_max(block_size)
    if len(data) % block_size == 0:
        # Reference parity: the read loop surfaces a trailing zero-length
        # block which fails to encode (salzcli.c:148-160, salz.c:197).
        raise ValueError("trailing zero-length block fails to encode")
    nblocks, mine = _shard_blocks(data, block_size, pid, nproc)

    enc = BatchBlockEncoder(block_size, batch=batch)
    local_segs: dict[int, bytes] = {}
    good = [(i, b) for i, b in mine if len(b) >= 8]
    if good:
        segs = enc.encode_many([b for _, b in good], dst_cap)
        for (i, _), seg in zip(good, segs):
            local_segs[i] = seg
    for i, b in mine:
        if len(b) < 8:
            # Reference parity: the trailing short/empty block fails to
            # encode (salz.c:197 underflow -> error); surface it here.
            raise ValueError(f"block {i} too short to encode ({len(b)} < 8)")

    plain_local = sum(len(b) for _, b in mine)
    coded_local = sum(len(s) for s in local_segs.values())

    if nproc == 1:
        out = io.BytesIO()
        container.write_file_header(out, block_size)
        for i in range(nblocks):
            container.write_segment(out, local_segs[i])
        stats = ShardStats(plain_local, coded_local, nblocks)
        return out.getvalue(), stats

    # ---- global stats: one small all-gather over DCN/ICI.
    stats_vec = multihost_utils.process_allgather(
        np.array([plain_local, coded_local], np.int64)
    )
    plain_total = int(stats_vec[:, 0].sum())
    coded_total = int(stats_vec[:, 1].sum())

    # ---- segment exchange: pad to the worst-case segment size, all-gather
    # (segments per process x max size), trim on process 0.
    max_mine = max(len(m) for m in _counts(nblocks, nproc))
    seg_buf = np.zeros((max_mine, dst_cap), np.uint8)
    seg_len = np.zeros(max_mine, np.int64)
    for j, i in enumerate(sorted(local_segs)):
        s = local_segs[i]
        seg_buf[j, : len(s)] = np.frombuffer(s, np.uint8)
        seg_len[j] = len(s)
    all_bufs = multihost_utils.process_allgather(seg_buf)
    all_lens = multihost_utils.process_allgather(seg_len)

    stats = ShardStats(plain_total, coded_total, nblocks)
    if pid != 0:
        return None, stats
    out = io.BytesIO()
    container.write_file_header(out, block_size)
    for i in range(nblocks):
        p, j = i % nproc, i // nproc
        container.write_segment(
            out, bytes(all_bufs[p, j, : int(all_lens[p, j])])
        )
    return out.getvalue(), stats


def _counts(nblocks: int, nproc: int) -> list[range]:
    return [range(p, nblocks, nproc) for p in range(nproc)]


def compress_file_multihost(
    inpath: str,
    out: BinaryIO | None,
    level: int = fmt.DEFAULT_LEVEL,
    batch: int = 8,
) -> ShardStats:
    """Compress a file across all processes; process 0 writes the container."""
    with open(inpath, "rb") as f:
        data = f.read()
    payload, stats = compress_bytes_multihost(data, level=level, batch=batch)
    if payload is not None and out is not None:
        out.write(payload)
    return stats
