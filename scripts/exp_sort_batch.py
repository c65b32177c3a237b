#!/usr/bin/env python3
"""Probe: lax.sort marginal cost vs shape, dispatch-free (chained calls, one sync)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from salz_tpu.utils import jaxcache
jaxcache.enable()
import jax, jax.numpy as jnp

def sync(o):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))

rng = np.random.default_rng(0)
REPS = 10

def probe(name, B, L, nkeys, nops, dtype=np.int32, hi=None):
    hi = hi or (1 << 30 if dtype == np.int32 else (1 << 14))
    x = [jnp.asarray(rng.integers(0, hi, (B, L), dtype=dtype)) for _ in range(nops)]

    @jax.jit
    def chain(xs):
        for _ in range(REPS):
            xs = jax.lax.sort(tuple(xs), num_keys=nkeys, dimension=1)
            # perturb so XLA can't CSE the loop away
            xs = [xs[0] ^ 1, *xs[1:]]
        return xs
    o = chain(x); sync(o)
    t0 = time.perf_counter(); o = chain(x); sync(o)
    dt = (time.perf_counter() - t0) / REPS
    n = B * L
    print(f"{name:36s} {dt*1e3:8.2f} ms  {dt/n*1e9:6.2f} ns/elem", flush=True)

for B, L in [(8, 1<<20), (32, 1<<20), (4, 1<<20), (1, 1<<20), (256, 1<<15), (1024, 1<<15), (256, 1<<17), (64, 1<<15), (1024, 1<<13)]:
    probe(f"3key+idx ({B},{L})", B, L, 3, 4)
probe("1key+1pay (8,1M)", 8, 1<<20, 1, 2)
probe("1key+1pay (256,32K)", 256, 1<<15, 1, 2)
probe("5key+idx (8,1M)", 8, 1<<20, 5, 6)
probe("5key+idx (256,32K)", 256, 1<<15, 5, 6)
probe("1key+8pay (8,1M)", 8, 1<<20, 1, 9)
