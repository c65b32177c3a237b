#!/usr/bin/env python3
"""Pre-populate the persistent XLA compile cache for chosen levels.

Cold-compiling the fused encode program takes minutes per (cap, batch)
shape (VERDICT.md round-1 item 8); the persistent cache
(salz_tpu/utils/jaxcache.py) makes every later process start hot. This
build step compiles the standard shapes ahead of time:

  python scripts/prewarm.py            # default level 5
  python scripts/prewarm.py 0 1 2 3    # specific levels
  python scripts/prewarm.py all        # levels 0-9

Uses AOT lowering (jit(...).lower(...).compile()) so nothing executes on
the device; only compiled executables are written to the cache directory.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from salz_tpu.utils import jaxcache

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from salz_tpu.config import SalzConfig  # noqa: E402
from salz_tpu.ops.encoder import encode_blocks_device  # noqa: E402


def prewarm(level: int) -> None:
    cfg = SalzConfig(level=level).validate()
    cap, B = cfg.block_size, cfg.batch
    blocks = jax.ShapeDtypeStruct((B, cap), jnp.uint8)
    lens = jax.ShapeDtypeStruct((B,), jnp.int32)
    t0 = time.perf_counter()
    jax.jit(
        lambda b, l: encode_blocks_device(b, l, cap=cap, parse=cfg.parse)
    ).lower(blocks, lens).compile()
    print(
        f"level {level} (cap {cap}, batch {B}): "
        f"{time.perf_counter() - t0:.1f}s",
        flush=True,
    )


def main() -> None:
    args = sys.argv[1:]
    levels = (
        list(range(10))
        if args == ["all"]
        else [int(a) for a in args] or [SalzConfig().level]
    )
    print(f"devices: {jax.devices()}  cache: {jaxcache.cache_dir()}", flush=True)
    for level in levels:
        prewarm(level)


if __name__ == "__main__":
    main()
