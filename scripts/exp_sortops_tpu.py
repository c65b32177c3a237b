"""TPU microbench: sortops.sort_rows vs lax.sort on big-cap shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salz_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from salz_tpu.ops import sortops


def _sync(out):
    first = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(first.ravel()[:1]))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1000:9.1f} ms", flush=True)
    return out


def main():
    N = 8 << 20
    rng = np.random.default_rng(0)
    shapes = [(1, N), (2, N // 2), (4, N // 4)]
    for B, L in shapes:
        keys = rng.integers(0, 1 << 30, (B, L), dtype=np.int32)
        pay = np.tile(np.arange(L, dtype=np.int32), (B, 1))
        k = jnp.asarray(keys)
        p = jnp.asarray(pay)
        lax1 = jax.jit(
            lambda a, b: jax.lax.sort((a, b), num_keys=1, dimension=1)
        )
        new1 = jax.jit(lambda a, b: sortops.sort_rows([a, b], 1))
        timeit(f"lax.sort ({B},{L//1024}K) 1key+1pay", lax1, k, p)
        o = timeit(f"sort_rows ({B},{L//1024}K) 1key+1pay", new1, k, p)
        ref = lax1(k, p)
        ok = all(
            bool(jnp.array_equal(a, b)) for a, b in zip(o, ref)
        )
        print(f"  identical: {ok}", flush=True)

    # 3key+1pay at (1, 8M) — the SA round shape at level 8
    B, L = 1, N
    ks = [
        jnp.asarray(rng.integers(0, 1 << 30, (B, L), dtype=np.int32))
        for _ in range(3)
    ]
    p = jnp.asarray(np.tile(np.arange(L, dtype=np.int32), (B, 1)))
    lax3 = jax.jit(
        lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=3, dimension=1)
    )
    new3 = jax.jit(lambda a, b, c, d: sortops.sort_rows([a, b, c, d], 3))
    timeit("lax.sort (1,8M) 3key+1pay", lax3, *ks, p)
    o = timeit("sort_rows (1,8M) 3key+1pay", new3, *ks, p)
    ref = lax3(*ks, p)
    print(
        "  identical:",
        all(bool(jnp.array_equal(a, b)) for a, b in zip(o, ref)),
        flush=True,
    )

    # unique-key variant (e.g. the SA invert sort: rank is a permutation)
    perm = rng.permutation(N).astype(np.int32)[None, :]
    kperm = jnp.asarray(perm)
    newu = jax.jit(lambda a, b: sortops.sort_rows([a, b], 1, unique=True))
    timeit("sort_rows (1,8M) unique 1key+1pay", newu, kperm, p)
    o = newu(kperm, p)
    ref = lax1(kperm, p)
    print(
        "  identical:",
        all(bool(jnp.array_equal(a, b)) for a, b in zip(o, ref)),
        flush=True,
    )


if __name__ == "__main__":
    main()
