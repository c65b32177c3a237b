"""One configuration dataclass for the whole framework (SURVEY.md §5).

The reference's runtime knobs are getopt flags plus one derived parameter
(`plain_len = 1 << (15 + level)`, salzcli.c:109). This framework adds engine
selection, device batching, parse-strategy and decode-path choices, and mesh
shape — previously scattered across env vars (SALZ_ENGINE, SALZ_BATCH) and
constructor args. `SalzConfig` is the single source of truth, threaded
CLI -> container -> encoder/decoder; the env vars remain honored as DEFAULTS
for backward compatibility but every layer takes the dataclass.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace

from salz_tpu import format as fmt


@dataclass(frozen=True)
class SalzConfig:
    #: compression level 0-9; block size = 1 << (15 + level) (salzcli.c:109)
    level: int = fmt.DEFAULT_LEVEL
    #: codec backend: "jax" (TPU/device), "native" (C++), "python" (oracle)
    engine: str = field(
        default_factory=lambda: os.environ.get("SALZ_ENGINE", "jax")
    )
    #: blocks per device step for the jax engine (amortizes dispatch).
    #: None = auto: keep ~8 MiB of text per dispatch — 256 lanes at level 0
    #: down to 8 at the 1 MiB default block, halved per level above (device
    #: state is ~100-190 B per input byte, so 16 MiB level-9 blocks run
    #: 1 lane at a time to fit HBM). Constant bytes-per-dispatch keeps small
    #: levels off the ~28 ms per-dispatch overhead cliff (PERFORMANCE.md).
    batch: int | None = field(
        default_factory=lambda: (
            int(os.environ["SALZ_BATCH"]) if "SALZ_BATCH" in os.environ
            else None
        )
    )
    #: parse optimizer: "chunked" (TPU-native fixpoint) | "sequential"
    parse: str = "chunked"
    #: decode path: "native" (C++ scalar, the fast/production path),
    #: "python" (oracle), or "jax" (on-device lax.while_loop decoder)
    decode_engine: str = field(
        default_factory=lambda: os.environ.get("SALZ_DECODE", "native")
    )
    #: number of mesh devices for the sharded path (None = all visible)
    mesh_devices: int | None = None

    @property
    def block_size(self) -> int:
        return fmt.block_size_for_level(self.level)

    def with_level(self, level: int) -> "SalzConfig":
        return replace(self, level=level)

    def validate(self) -> "SalzConfig":
        if not 0 <= self.level <= 9:
            raise ValueError(f"level must be 0..9, got {self.level}")
        if self.engine not in ("jax", "native", "python"):
            raise ValueError(f"unknown engine {self.engine!r}")
        if self.decode_engine not in ("jax", "native", "python"):
            raise ValueError(f"unknown decode engine {self.decode_engine!r}")
        if self.parse not in ("chunked", "sequential"):
            raise ValueError(f"unknown parse strategy {self.parse!r}")
        if self.batch is None:
            return replace(
                self, batch=max(1, (8 << 20) // fmt.block_size_for_level(self.level))
            )
        if self.batch < 1:
            raise ValueError("batch must be >= 1")
        return self
