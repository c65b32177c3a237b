#!/usr/bin/env python3
"""Time the suffix-array sub-stages on the bench corpus (CAP, B knobs)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salz_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

CAP = int(os.environ.get("CAP", str(1 << 20)))
B = int(os.environ.get("B", "8"))


def sync(out):
    first = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(first.ravel()[:1]))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:30s} {dt*1000:8.1f} ms", flush=True)
    return out


def main():
    from bench import make_corpus
    from salz_tpu.ops import suffix_array as sam

    data = make_corpus(B * CAP)
    blocks = jnp.asarray(np.frombuffer(data, np.uint8).reshape(B, CAP))
    ns = jnp.full((B,), CAP - 8, jnp.int32)
    print(f"devices: {jax.devices()}  cap={CAP} B={B}", flush=True)

    full = jax.jit(
        jax.vmap(lambda b, n: sam.suffix_array_prefixes(b, n, cap=CAP))
    )
    out = timeit("suffix_array_prefixes", full, blocks, ns)
    print(f"  levels filled: {np.asarray(out[2])[:4]}", flush=True)

    idx = jnp.arange(CAP, dtype=jnp.int32)

    def initial_ranks(text, n):
        in_text = idx < n
        byte = jnp.where(in_text, text.astype(jnp.int32), 0)

        def _sym(k):
            s = jnp.concatenate([byte[k:], jnp.zeros(k, jnp.int32)]) + 1
            return jnp.where(idx + k < n, s, 0)

        keyA = (_sym(0) << 9) | _sym(1)
        keyA = jnp.where(in_text, keyA, (1 << 18) + idx)
        keyB = jnp.where(in_text, (_sym(2) << 9) | _sym(3), 0)
        keyC = jnp.where(in_text, (_sym(4) << 9) | _sym(5), 0)
        keyD = jnp.where(in_text, (_sym(6) << 9) | _sym(7), 0)
        k1, k2, k3, k4, perm = jax.lax.sort(
            (keyA, keyB, keyC, keyD, idx), num_keys=4
        )
        changed = jnp.concatenate(
            [
                jnp.zeros((1,), jnp.int32),
                (
                    (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
                    | (k3[1:] != k3[:-1]) | (k4[1:] != k4[:-1])
                ).astype(jnp.int32),
            ]
        )
        rank8_sorted = jnp.cumsum(changed, dtype=jnp.int32)
        _, rank8 = jax.lax.sort((perm, rank8_sorted), num_keys=1)
        return rank8

    timeit(
        "initial 4-key sort + invert",
        jax.jit(jax.vmap(initial_ranks)), blocks, ns,
    )

    def one_round(text, n):
        rank = initial_ranks(text, n)
        h = jnp.int32(16)
        rank_padded = jnp.concatenate([rank, jnp.full(CAP, -1, jnp.int32)])
        rank2 = jax.lax.dynamic_slice(rank_padded, (h,), (CAP,))
        rank2 = jnp.where(idx + h < n, rank2, jnp.int32(-1))
        k1, k2, perm = jax.lax.sort((rank, rank2, idx), num_keys=2)
        changed = jnp.concatenate(
            [
                jnp.zeros((1,), jnp.int32),
                ((k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])).astype(jnp.int32),
            ]
        )
        nr = jnp.cumsum(changed, dtype=jnp.int32)
        _, new_rank = jax.lax.sort((perm, nr), num_keys=1)
        return new_rank

    timeit(
        "initial + 1 doubling round",
        jax.jit(jax.vmap(one_round)), blocks, ns,
    )

    def final_sort(text, n):
        rank = initial_ranks(text, n)
        packs = sam.packed_prefixes(text, n, cap=CAP)
        sorted_out = jax.lax.sort((rank, idx, *packs), num_keys=1)
        return sorted_out[1]

    timeit(
        "initial + final 10-operand sort",
        jax.jit(jax.vmap(final_sort)), blocks, ns,
    )

    def final_sort_1payload(text, n):
        rank = initial_ranks(text, n)
        sorted_out = jax.lax.sort((rank, idx), num_keys=1)
        return sorted_out[1]

    timeit(
        "initial + final 2-operand sort",
        jax.jit(jax.vmap(final_sort_1payload)), blocks, ns,
    )


if __name__ == "__main__":
    main()
