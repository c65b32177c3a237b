"""Structured metrics & stage tracing (SURVEY.md §5: tracing / observability).

The reference's only instrumentation is a monotonic-clock bracket around each
file operation plus a ratio log line (common.h:28-38, salzcli.c:331-369).
This module is the framework's structured replacement:

  * `StageTimer` — named wall-clock stages with device-sync-aware timing
    (device_get of one element; `block_until_ready` alone does not reliably
    block through remote-device tunnels).
  * `CompressionStats` — per-file and aggregate (bytes in/out, ratio, MB/s),
    mergeable across files and across processes (`merge`, `from_psum`).
  * `trace()` — optional `jax.profiler` trace context for deep dives.

All output is machine-readable (`as_dict` / one-line JSON) so harnesses can
scrape it; the CLI's human log lines stay reference-identical.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


def sync(tree) -> None:
    """Force device completion of every leaf (honest timing boundary)."""
    import jax
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


class StageTimer:
    """Accumulating named wall-clock stages.

    >>> t = StageTimer()
    >>> with t.stage("suffix_array"):
    ...     out = run()  # doctest: +SKIP
    >>> t.as_dict()  # doctest: +SKIP
    {'suffix_array': {'seconds': ..., 'calls': 1}}
    """

    def __init__(self) -> None:
        self.seconds: dict[str, float] = {}
        self.calls: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_tree=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_tree is not None:
                sync(sync_tree)
            dt = time.perf_counter() - t0
            self.seconds[name] = self.seconds.get(name, 0.0) + dt
            self.calls[name] = self.calls.get(name, 0) + 1

    def as_dict(self) -> dict:
        return {
            k: {"seconds": round(v, 6), "calls": self.calls[k]}
            for k, v in self.seconds.items()
        }

    def report(self) -> str:
        total = sum(self.seconds.values()) or 1.0
        lines = [
            f"{k:24s} {v*1e3:9.1f} ms  {100*v/total:5.1f}%"
            for k, v in sorted(
                self.seconds.items(), key=lambda kv: -kv[1]
            )
        ]
        return "\n".join(lines)


@dataclass
class CompressionStats:
    """Aggregate compression statistics (mergeable across files/processes)."""

    plain_bytes: int = 0
    coded_bytes: int = 0
    num_blocks: int = 0
    num_files: int = 0
    seconds: float = 0.0
    extra: dict = field(default_factory=dict)

    @property
    def ratio(self) -> float:
        return self.plain_bytes / self.coded_bytes if self.coded_bytes else 0.0

    @property
    def mb_per_s(self) -> float:
        return self.plain_bytes / self.seconds / 1e6 if self.seconds else 0.0

    def add_file(
        self, plain: int, coded: int, blocks: int, seconds: float
    ) -> None:
        self.plain_bytes += plain
        self.coded_bytes += coded
        self.num_blocks += blocks
        self.num_files += 1
        self.seconds += seconds

    def merge(self, other: "CompressionStats") -> "CompressionStats":
        return CompressionStats(
            self.plain_bytes + other.plain_bytes,
            self.coded_bytes + other.coded_bytes,
            self.num_blocks + other.num_blocks,
            self.num_files + other.num_files,
            max(self.seconds, other.seconds),  # wall clock overlaps
        )

    def as_dict(self) -> dict:
        return {
            "plain_bytes": self.plain_bytes,
            "coded_bytes": self.coded_bytes,
            "num_blocks": self.num_blocks,
            "num_files": self.num_files,
            "seconds": round(self.seconds, 6),
            "ratio": round(self.ratio, 6),
            "MB_s": round(self.mb_per_s, 6),
            **self.extra,
        }

    def json_line(self) -> str:
        return json.dumps(self.as_dict())


@contextlib.contextmanager
def trace(logdir: str | None):
    """`jax.profiler` trace context when logdir is set, no-op otherwise."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
