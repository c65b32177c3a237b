"""Microbenchmarks of candidate gather/scatter/sort primitives on TPU.

Honest timing: every measurement ends with a 1-element device_get so the axon
tunnel cannot hide async dispatch.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("N", str(1 << 20)))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    first = out[0] if isinstance(out, (tuple, list)) else out
    _ = np.asarray(jax.device_get(first.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        _ = np.asarray(jax.device_get(first.ravel()[:1]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:36s} {dt*1e3:9.3f} ms  ({N/dt/1e6:9.1f} Melem/s)", flush=True)
    return out


def main():
    print(f"devices: {jax.devices()}  N={N}", flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
    idx_sorted = jnp.asarray(np.sort(np.asarray(idx)))
    vals = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))

    # --- XLA baselines
    timeit("xla gather random", jax.jit(lambda t, i: t[i]), table, idx)
    timeit("xla gather sorted", jax.jit(
        lambda t, i: jnp.take(t, i, indices_are_sorted=True)), table, idx_sorted)
    timeit("xla scatter perm .at[].set", jax.jit(
        lambda t, i, v: t.at[i].set(v)), table, perm, vals)
    timeit("xla sort 1key+payload", jax.jit(
        lambda k, v: jax.lax.sort((k, v), num_keys=1)), table, vals)
    timeit("xla sort 2key+payload", jax.jit(
        lambda k, k2, v: jax.lax.sort((k, k2, v), num_keys=2)), table, idx, vals)
    timeit("xla cumsum", jax.jit(lambda v: jnp.cumsum(v)), vals)
    timeit("xla cummin", jax.jit(lambda v: jax.lax.cummin(v)), vals)
    timeit("xla argsort_u32(perm-scatter)", jax.jit(
        lambda i, v: jax.lax.sort((i, v), num_keys=1)[1]), perm, vals)

    # --- Pallas: vectorized dynamic gather from VMEM (2D formulation)
    R = N // 128

    def pallas_gather2d(table, idx):
        def kern(t_ref, i_ref, o_ref):
            t = t_ref[:]
            ii = i_ref[:]
            o_ref[:] = jnp.take(t.reshape(-1), ii.reshape(-1)).reshape(ii.shape)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table.reshape(R, 128), idx.reshape(R, 128))

    try:
        out = timeit("pallas take VMEM (flat)", jax.jit(pallas_gather2d), table, idx)
        ok = bool(jnp.all(out.reshape(-1) == table[idx]))
        print(f"  pallas take correct: {ok}", flush=True)
    except Exception as e:
        print(f"  pallas take failed: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # --- Pallas: per-row gather where idx within row (lane shuffle form)
    def pallas_gather_rows(table, idx):
        def kern(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table.reshape(R, 128), idx.reshape(R, 128) % 128)

    try:
        out = timeit("pallas take_along lane", jax.jit(pallas_gather_rows), table, idx)
        ref = jnp.take_along_axis(table.reshape(R, 128), idx.reshape(R, 128) % 128, axis=1)
        print(f"  pallas lane take correct: {bool(jnp.all(out == ref))}", flush=True)
    except Exception as e:
        print(f"  pallas lane take failed: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # --- one-hot matmul in-chunk gather (512-chunk, batched over all chunks)
    C = 512
    NC = N // C

    def onehot_gather(table, idx):
        t = table.reshape(NC, C).astype(jnp.float32)
        i = idx.reshape(NC, C) % C
        oh = (i[:, :, None] == jnp.arange(C)[None, None, :]).astype(jnp.float32)
        return jnp.einsum("bqc,bc->bq", oh, t).astype(jnp.int32)

    timeit("onehot-matmul in-chunk (b=2048)", jax.jit(onehot_gather), table, idx)

    # --- XLA gather but only in-chunk (locality test)
    def chunked_gather(table, idx):
        t = table.reshape(NC, C)
        i = idx.reshape(NC, C) % C
        return jnp.take_along_axis(t, i, axis=1)

    timeit("xla take_along in-chunk", jax.jit(chunked_gather), table, idx)


if __name__ == "__main__":
    main()
