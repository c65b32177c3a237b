#!/usr/bin/env python3
"""Gather cost vs table size, index sortedness, and 2-D layout."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from salz_tpu.utils import jaxcache
jaxcache.enable()
import jax, jax.numpy as jnp

def sync(o):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))

rng = np.random.default_rng(0)
REPS = 8

def t(name, fn, *a):
    f = jax.jit(fn)
    o = f(*a); sync(o)
    t0 = time.perf_counter(); o = f(*a); sync(o)
    print(f"{name:44s} {(time.perf_counter()-t0)*1e3/REPS:8.2f} ms/iter", flush=True)

def chain(fn):
    def run(*a):
        x = a
        for _ in range(REPS):
            x = fn(*x)
        return x
    return run

M = 1 << 20
for TN in (1 << 20, 1 << 23, 1 << 25):
    table = jnp.asarray(rng.integers(0, 1 << 20, TN, dtype=np.int32))
    idxs = jnp.asarray(rng.integers(0, TN, M, dtype=np.int32))
    t(f"random gather 1M from {TN>>20}M-elem", chain(lambda i, tb=table: (tb[i] ^ 1,)), idxs)
    si = jnp.asarray(np.sort(rng.integers(0, TN, M).astype(np.int32)))
    t(f"sorted gather 1M from {TN>>20}M-elem", chain(lambda i, tb=table: (tb[i] ^ 1,)), si)

# 3 gathers at offsets from same sorted base (the radix-4 pool pattern, pos-sorted)
table = jnp.asarray(rng.integers(0, 1 << 20, 8 << 20, dtype=np.int32))
si = jnp.asarray(np.sort(rng.integers(0, (8 << 20) - (3 << 14), M).astype(np.int32)))
def tri(i, tb=table):
    m = jnp.int32(1 << 14)
    return ((tb[i] ^ tb[i + m] ^ tb[i + 2 * m]) ^ 1,)
t("3x offset gathers, sorted base, 8M table", chain(tri), si)
ri = jnp.asarray(rng.integers(0, (8 << 20) - (3 << 14), M, dtype=np.int32))
t("3x offset gathers, random base, 8M table", chain(tri), ri)

# take_along_axis on (B,cap) rows: per-row gather
tb2 = jnp.asarray(rng.integers(0, 1 << 20, (8, 1 << 20), dtype=np.int32))
ix2 = jnp.asarray(rng.integers(0, 1 << 20, (8, 1 << 17), dtype=np.int32))
t("take_along_axis (8,1M)->(8,128K)", chain(lambda i, tb=tb2: (jnp.take_along_axis(tb, i, axis=1) ^ 1,)), ix2)
