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



def prewarm(level: int) -> None:
    """Compile (and once-run) the STAGED pipeline for a level's shapes.

    The staged path is what BatchBlockEncoder/the CLI dispatch; compiling
    the fused program instead would hit the superlinear whole-module XLA
    compile (>40 min at 1 MiB, PERFORMANCE.md round-4 finding 2)."""
    import numpy as np

    from salz_tpu.ops.encoder import encode_blocks_device_staged

    cfg = SalzConfig(level=level).validate()
    cap, B = cfg.block_size, cfg.batch
    rng = np.random.default_rng(level)
    base = rng.integers(0, 8, size=257, dtype=np.uint8).tobytes()
    blk = (base * (cap // len(base) + 1))[:cap]
    blocks = jnp.asarray(
        np.frombuffer(blk * B, np.uint8).reshape(B, cap)
    )
    lens = jnp.full((B,), cap, jnp.int32)
    t0 = time.perf_counter()
    out, out_len, _ = encode_blocks_device_staged(
        blocks, lens, cap=cap, parse=cfg.parse
    )
    np.asarray(out_len)
    print(
        f"level {level} (cap {cap}, batch {B}): "
        f"{time.perf_counter() - t0:.1f}s",
        flush=True,
    )


def prewarm_entry() -> None:
    """Compile the driver's __graft_entry__ shape (fused, 64 KiB, B=1)."""
    import __graft_entry__ as ge
    import numpy as np

    fn, ex = ge.entry()
    t0 = time.perf_counter()
    out = fn(*ex)
    np.asarray(out[1])
    print(f"entry() 64 KiB fused: {time.perf_counter() - t0:.1f}s", flush=True)


def main() -> None:
    args = sys.argv[1:]
    if args == ["entry"]:
        print(
            f"devices: {jax.devices()}  cache: {jaxcache.cache_dir()}",
            flush=True,
        )
        prewarm_entry()
        return
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
