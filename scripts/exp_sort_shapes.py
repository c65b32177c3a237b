"""Probe: lax.sort cost vs row shape, and a reshape-based bitonic merge.

Hypothesis (round 5): sorting ONE long row costs ~3-4x per element vs 8
shorter rows of the same total (bitonic stage count is log^2(n)/2, and XLA
fuses long-row stages worse). If true, a (1, N) sort is better served by
sorting (R, N/R) rows and merging the R sorted runs with reshape-based
compare-exchange stages (every bitonic-merge stage at distance d is an
elementwise min/max between halves of a (N/2d, 2, d) view — no gathers).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salz_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp


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
    print(f"{name:40s} {dt*1000:9.1f} ms", flush=True)
    return out


def merge_rows(key, pay, R):
    """key, pay: (R, C) with each row sorted ascending. Returns (N,) fully
    sorted key + payload via log2(R) bitonic merge levels, each a chain of
    reshape + elementwise compare-exchange stages."""
    N = key.size
    k = key.reshape(-1)
    p = pay.reshape(-1)
    run = key.shape[1]
    while run < N:
        L = 2 * run
        # make each length-L group bitonic: reverse the second half
        k2 = k.reshape(-1, 2, run)
        p2 = p.reshape(-1, 2, run)
        k = jnp.concatenate([k2[:, 0], k2[:, 1, ::-1]], axis=1).reshape(-1)
        p = jnp.concatenate([p2[:, 0], p2[:, 1, ::-1]], axis=1).reshape(-1)
        d = run
        while d >= 1:
            kv = k.reshape(-1, 2, d)
            pv = p.reshape(-1, 2, d)
            a, b = kv[:, 0], kv[:, 1]
            sw = a > b
            k = jnp.concatenate(
                [jnp.where(sw, b, a)[:, None], jnp.where(sw, a, b)[:, None]],
                axis=1,
            ).reshape(-1)
            p = jnp.concatenate(
                [jnp.where(sw, pv[:, 1], pv[:, 0])[:, None],
                 jnp.where(sw, pv[:, 0], pv[:, 1])[:, None]],
                axis=1,
            ).reshape(-1)
            d //= 2
        run = L
    return k, p


def main():
    N = int(os.environ.get("N", str(8 << 20)))
    rng = np.random.default_rng(0)
    key_np = rng.integers(0, 1 << 30, N, dtype=np.int32)
    pay_np = np.arange(N, dtype=np.int32)

    key1 = jnp.asarray(key_np)[None, :]
    pay1 = jnp.asarray(pay_np)[None, :]
    key8 = jnp.asarray(key_np.reshape(8, -1))
    pay8 = jnp.asarray(pay_np.reshape(8, -1))
    key64 = jnp.asarray(key_np.reshape(64, -1))
    pay64 = jnp.asarray(pay_np.reshape(64, -1))

    sort2 = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1, dimension=1))
    timeit("lax.sort (1, 8M) 1key+1pay", sort2, key1, pay1)
    timeit("lax.sort (8, 1M) 1key+1pay", sort2, key8, pay8)
    timeit("lax.sort (64, 128K) 1key+1pay", sort2, key64, pay64)

    @jax.jit
    def rows_then_merge8(k, p):
        ks, ps = jax.lax.sort((k, p), num_keys=1, dimension=1)
        return merge_rows(ks, ps, 8)

    @jax.jit
    def rows_then_merge64(k, p):
        ks, ps = jax.lax.sort((k, p), num_keys=1, dimension=1)
        return merge_rows(ks, ps, 64)

    mk, mp = timeit("(8,1M) rowsort + merge8", rows_then_merge8, key8, pay8)
    timeit("(64,128K) rowsort + merge64", rows_then_merge64, key64, pay64)

    # correctness vs single sort
    ref_k, ref_p = sort2(key1, pay1)
    ok_k = bool(jnp.array_equal(ref_k[0], mk))
    print("merge key == lax.sort key:", ok_k)
    # payload equality only holds where keys are unique; check sorted pairs
    ok_pair = bool(
        jnp.array_equal(
            jnp.sort(mk.astype(jnp.int64) << 23 | mp.astype(jnp.int64)),
            jnp.sort(
                ref_k[0].astype(jnp.int64) << 23 | ref_p[0].astype(jnp.int64)
            ),
        )
    )
    print("merge (key,pay) multiset ==:", ok_pair)

    # 4-key variant cost probe: sort 3 packed keys + idx, merge with 3 keys
    kA = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32).reshape(8, -1))
    kB = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32).reshape(8, -1))
    kC = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32).reshape(8, -1))
    sortm = jax.jit(
        lambda a, b, c, p: jax.lax.sort((a, b, c, p), num_keys=3, dimension=1)
    )
    timeit("lax.sort (8,1M) 3key+1pay", sortm, kA, kB, kC, pay8)
    timeit(
        "lax.sort (1,8M) 3key+1pay",
        sortm,
        kA.reshape(1, -1), kB.reshape(1, -1), kC.reshape(1, -1), pay1,
    )


if __name__ == "__main__":
    main()
