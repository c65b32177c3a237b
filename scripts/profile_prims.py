"""Microbenchmarks of the XLA/TPU primitives the pipeline leans on."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = int(os.environ.get("N", str(1 << 20)))


def timeit(name, fn, *args, reps=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:9.2f} ms  ({N/dt/1e6:9.1f} Melem/s)", flush=True)


def main():
    print(f"devices: {jax.devices()}  N={N}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, N, size=N).astype(np.int32))
    y = jnp.asarray(rng.integers(0, N, size=N).astype(np.int32))
    v = jnp.asarray(rng.integers(0, 1 << 30, size=N).astype(np.int32))

    timeit("elementwise add", lambda a, b: a + b, v, v)
    timeit("cumsum", lambda a: jnp.cumsum(a), v)
    timeit("cummin", lambda a: jax.lax.cummin(a), v)
    timeit("gather (take)", lambda t, i: t[i], v, x)
    timeit("scatter set", lambda t, i, w: t.at[i].set(w), v, x, v)
    timeit("scatter add drop", lambda t, i, w: t.at[i].add(w, mode="drop"), v, x, v)
    timeit("scatter max", lambda t, i, w: t.at[i].max(w), v, x, v)
    timeit("sort 1 key", lambda a: jax.lax.sort(a), v)
    timeit("sort k+v", lambda a, b: jax.lax.sort((a, b), num_keys=1), v, x)
    timeit("sort 2keys+v", lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2), v, y, x)
    timeit("argsort", lambda a: jnp.argsort(a), v)
    timeit("searchsorted", lambda a, b: jnp.searchsorted(jnp.sort(a), b), v, x)
    timeit("roll", lambda a: jnp.roll(a, 1), v)
    timeit("where", lambda a, b: jnp.where(a > 0, a, b), v, v)


if __name__ == "__main__":
    main()
