"""Multi-host data-parallel compression runtime (SURVEY.md §2.4 P3/P4).

The reference is single-process (no NCCL/MPI anywhere in its tree); this is
the TPU-native scale-out layer built on `jax.distributed` + a global device
mesh. The salz container's independent length-prefixed segments
(salzcli.c:163-179) make the mapping embarrassingly parallel and restartable:

  * every process reads ONLY its own strided shard of the file's blocks
    (block i belongs to process i % num_processes; seek-based reads, no
    whole-file ingestion anywhere),
  * each process encodes its blocks locally (the whole per-block pipeline is
    intra-block by construction — factor offsets never cross a block,
    salz.c:555-558) with per-block error status,
  * per-process (bytes in, bytes out) stats are reduced over the global mesh
    via one small `process_allgather`,
  * the variable-length segments are gathered TO PROCESS 0 ONLY: a small
    size exchange, then length-prefixed payload transfer over a host TCP
    socket (traffic O(total encoded bytes) to process 0, not a padded
    allgather to every process). When no gather address is configured the
    fallback is a compact allgather of concatenated (not worst-case-padded)
    per-process payloads.

Single-process degenerates to the local batched path, so the whole module is
exercised by the regular test suite; tests/test_multihost.py additionally
runs a REAL 2-process `jax.distributed` CPU job over localhost. On a pod
slice, call `initialize_distributed()` first.
"""

from __future__ import annotations

import io
import os
import pickle
import socket
import struct
import time
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


def _shard_blocks_from_bytes(data: bytes, block_size: int, pid: int, nproc: int):
    """Strided block shard for process `pid` (block i -> process i % nproc)."""
    nblocks = max(1, -(-len(data) // block_size))
    mine = []
    for i in range(pid, nblocks, nproc):
        mine.append((i, data[i * block_size : (i + 1) * block_size]))
    return nblocks, mine


def _shard_blocks_from_file(path: str, block_size: int, pid: int, nproc: int):
    """Seek-based strided shard read: each process touches ONLY its blocks'
    byte ranges (SURVEY.md §2.4 P4 per-host file-shard ingestion)."""
    size = os.stat(path).st_size
    nblocks = max(1, -(-size // block_size))
    mine = []
    with open(path, "rb") as f:
        for i in range(pid, nblocks, nproc):
            f.seek(i * block_size)
            mine.append((i, f.read(block_size)))
    return nblocks, mine


# ---------------------------------------------------------------------------
# segment gather: to process 0 only
# ---------------------------------------------------------------------------


def _gather_socket(local_segs: dict[int, bytes], pid: int, nproc: int, addr: str):
    """Length-prefixed TCP gather to process 0 (traffic O(total bytes))."""
    host, port_s = addr.rsplit(":", 1)
    port = int(port_s)
    if pid == 0:
        merged = dict(local_segs)
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen(nproc)
        for _ in range(nproc - 1):
            conn, _peer = srv.accept()
            with conn:
                (ln,) = struct.unpack("<Q", _recv_exact(conn, 8))
                merged.update(pickle.loads(_recv_exact(conn, ln)))
        srv.close()
        return merged
    payload = pickle.dumps(local_segs, protocol=pickle.HIGHEST_PROTOCOL)
    last_err = None
    for _ in range(150):  # retry while process 0 brings the listener up
        try:
            with socket.create_connection((host, port), timeout=30) as c:
                c.sendall(struct.pack("<Q", len(payload)))
                c.sendall(payload)
            return None
        except OSError as e:  # pragma: no cover - timing dependent
            last_err = e
            time.sleep(0.2)
    raise RuntimeError(f"segment gather to process 0 failed: {last_err}")


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise RuntimeError("gather connection closed early")
        buf += chunk
    return bytes(buf)


def _gather_allgather(local_segs: dict[int, bytes], pid: int, nproc: int):
    """Fallback without a gather address: allgather of COMPACT concatenated
    payloads (padded to the max per-process total, not nblocks x worst-case
    segment size)."""
    from jax.experimental import multihost_utils

    keys = sorted(local_segs)
    sizes = np.zeros(2 + 2 * len(keys), np.int64)
    sizes[0] = len(keys)
    for j, i in enumerate(keys):
        sizes[2 + 2 * j] = i
        sizes[3 + 2 * j] = len(local_segs[i])
    max_entries = int(
        multihost_utils.process_allgather(np.array([len(sizes)], np.int64)).max()
    )
    sizes_pad = np.zeros(max_entries, np.int64)
    sizes_pad[: len(sizes)] = sizes
    all_sizes = multihost_utils.process_allgather(sizes_pad)

    payload = b"".join(local_segs[i] for i in keys)
    max_total = int(
        multihost_utils.process_allgather(np.array([len(payload)], np.int64)).max()
    )
    buf = np.zeros(max(max_total, 1), np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    all_bufs = multihost_utils.process_allgather(buf)

    if pid != 0:
        return None
    merged = dict(local_segs)
    for p in range(nproc):
        if p == pid:
            continue
        row = all_sizes[p]
        cnt = int(row[0])
        off = 0
        for j in range(cnt):
            i = int(row[2 + 2 * j])
            ln = int(row[3 + 2 * j])
            merged[i] = bytes(all_bufs[p, off : off + ln])
            off += ln
    return merged


def _gather_segments(local_segs: dict[int, bytes], pid: int, nproc: int):
    addr = os.environ.get("SALZ_GATHER_ADDR")
    if addr:
        return _gather_socket(local_segs, pid, nproc, addr)
    return _gather_allgather(local_segs, pid, nproc)


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------


def _compress_sharded(
    nblocks: int,
    mine: list[tuple[int, bytes]],
    block_size: int,
    batch: int,
) -> tuple[bytes | None, ShardStats]:
    import jax

    from salz_tpu.ops.encoder import BatchBlockEncoder

    pid = jax.process_index()
    nproc = jax.process_count()
    dst_cap = fmt.encoded_len_max(block_size)

    for i, b in mine:
        if len(b) < 8:
            # Reference parity: the trailing short/empty block fails to
            # encode (salz.c:197 underflow -> error); surface it here.
            raise ValueError(f"block {i} too short to encode ({len(b)} < 8)")

    enc = BatchBlockEncoder(block_size, batch=batch)
    segs, status = enc.encode_many_status([b for _, b in mine], dst_cap)
    local_segs: dict[int, bytes] = {}
    for (i, _), seg, st in zip(mine, segs, status):
        if st != 0:
            raise ValueError(f"block {i} failed to encode (status {st})")
        local_segs[i] = seg

    plain_local = sum(len(b) for _, b in mine)
    coded_local = sum(len(s) for s in local_segs.values())

    if nproc == 1:
        out = io.BytesIO()
        container.write_file_header(out, block_size)
        for i in range(nblocks):
            container.write_segment(out, local_segs[i])
        return out.getvalue(), ShardStats(plain_local, coded_local, nblocks)

    # ---- global stats: one small all-gather over DCN/ICI.
    from jax.experimental import multihost_utils

    stats_vec = multihost_utils.process_allgather(
        np.array([plain_local, coded_local], np.int64)
    )
    stats = ShardStats(
        int(stats_vec[:, 0].sum()), int(stats_vec[:, 1].sum()), nblocks
    )

    merged = _gather_segments(local_segs, pid, nproc)
    if pid != 0:
        return None, stats
    out = io.BytesIO()
    container.write_file_header(out, block_size)
    for i in range(nblocks):
        container.write_segment(out, merged[i])
    return out.getvalue(), stats


def compress_bytes_multihost(
    data: bytes, level: int = fmt.DEFAULT_LEVEL, batch: int = 8
) -> tuple[bytes | None, ShardStats]:
    """Compress `data` data-parallel across all JAX processes.

    Every process must call this with the SAME data (each then encodes only
    its strided shard). Returns (container bytes on process 0, None
    elsewhere; global stats on every process).
    """
    import jax

    block_size = fmt.block_size_for_level(level)
    if len(data) % block_size == 0:
        # Reference parity: the read loop surfaces a trailing zero-length
        # block which fails to encode (salzcli.c:148-160, salz.c:197).
        raise ValueError("trailing zero-length block fails to encode")
    nblocks, mine = _shard_blocks_from_bytes(
        data, block_size, jax.process_index(), jax.process_count()
    )
    return _compress_sharded(nblocks, mine, block_size, batch)


def compress_file_multihost(
    inpath: str,
    out: BinaryIO | None,
    level: int = fmt.DEFAULT_LEVEL,
    batch: int = 8,
) -> ShardStats:
    """Compress a file across all processes; every process reads only its
    strided block shard (seek-based); process 0 writes the container."""
    import jax

    block_size = fmt.block_size_for_level(level)
    if os.stat(inpath).st_size % block_size == 0:
        raise ValueError("trailing zero-length block fails to encode")
    nblocks, mine = _shard_blocks_from_file(
        inpath, block_size, jax.process_index(), jax.process_count()
    )
    payload, stats = _compress_sharded(nblocks, mine, block_size, batch)
    if payload is not None and out is not None:
        out.write(payload)
    return stats
