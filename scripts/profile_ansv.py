#!/usr/bin/env python3
"""Time the ANSV sub-stages on realistic SA inputs (CAP, B knobs)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salz_tpu.utils import jaxcache

jaxcache.enable()

import functools

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
    print(f"{name:28s} {dt*1000:8.1f} ms", flush=True)
    return out


def main():
    from bench import make_corpus
    from salz_tpu.ops import ansv_tpu as at
    from salz_tpu.ops.suffix_array import suffix_array_prefixes

    cache = f"/tmp/ansv_inputs_{CAP}_{B}.npz"
    if os.path.exists(cache):
        vals_np = np.load(cache)["vals"]
    else:
        data = make_corpus(B * CAP)
        blocks = jnp.asarray(np.frombuffer(data, np.uint8).reshape(B, CAP))
        ns = jnp.full((B,), CAP - 8, jnp.int32)
        sa = jax.jit(
            jax.vmap(lambda b, n: suffix_array_prefixes(b, n, cap=CAP)[0])
        )(blocks, ns)
        idx = jnp.arange(CAP, dtype=jnp.int32)[None, :]
        vals_np = np.asarray(
            jnp.where(idx < ns[:, None], sa, jnp.int32(2**31 - 1))
        )
        np.savez(cache, vals=vals_np)
    vals = jnp.asarray(vals_np)
    n = jnp.full((B,), CAP - 8, jnp.int32)
    print(f"devices: {jax.devices()}  cap={CAP} B={B}", flush=True)

    # full ANSV
    full = jax.jit(functools.partial(at.ansv_slots_vals_tpu_batch, cap=CAP))
    out = timeit("ansv_full", full, vals, n)
    ls = np.asarray(out[0])
    crossing = ((ls >= 0) & ((ls >> 7) != (np.arange(CAP)[None, :] >> 7))).sum()
    print(f"  (left crossing answers: {crossing} = "
          f"{crossing / (B * CAP) * 100:.1f}%)", flush=True)

    # tables alone
    @jax.jit
    def tables_only(vals):
        tabs, L = at._full_tables_batch(vals, CAP)
        return tabs[-1]

    timeit("full_tables", tables_only, vals)

    # descent alone at the small-rung width (M per side)
    M = max(CAP // 64, 512)

    @jax.jit
    def descent(vals):
        tabs, L = at._full_tables_batch(vals, CAP)
        q = jnp.broadcast_to(
            jnp.arange(2 * M, dtype=jnp.int32)[None, :] * 7 % CAP, (B, 2 * M)
        )
        side = jnp.concatenate(
            [jnp.ones((B, M), jnp.bool_), jnp.zeros((B, M), jnp.bool_)], axis=1
        )
        return at._descend_batch(tabs, L, vals, q, side, CAP)

    timeit(f"tables+descent(2x{M})", descent, vals)

    # compaction sorts alone (fused single-key)
    @jax.jit
    def sorts(vals):
        idx = jnp.arange(CAP, dtype=jnp.int32)[None, :]
        need = vals < 2**29
        slot_iota = jnp.broadcast_to(idx, (B, CAP)) + (vals - vals)
        flagbit = jnp.int32(1 << 26)
        (a,) = jax.lax.sort(
            (jnp.where(need, slot_iota, slot_iota | flagbit),),
            num_keys=1, dimension=1,
        )
        (b,) = jax.lax.sort(
            (jnp.where(~need, slot_iota, slot_iota | flagbit),),
            num_keys=1, dimension=1,
        )
        return a, b

    timeit("compaction sorts x2", sorts, vals)


if __name__ == "__main__":
    main()
