#!/usr/bin/env python3
"""Cost of each pooled-round piece at MG=1M (dispatch-free, chained)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from salz_tpu.utils import jaxcache
jaxcache.enable()
import jax, jax.numpy as jnp

def sync(o):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))

MG = 1 << 20
N = 8 << 20
rng = np.random.default_rng(0)
idxs = jnp.asarray(rng.integers(0, N, MG, dtype=np.int32))
table = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
vals = jnp.asarray(rng.integers(0, N, MG, dtype=np.int32))
col = jnp.arange(MG, dtype=jnp.int32)

def t(name, fn, *a, reps=8):
    f = jax.jit(fn)
    o = f(*a); sync(o)
    t0 = time.perf_counter(); o = f(*a); sync(o)
    dt = (time.perf_counter() - t0)
    print(f"{name:40s} {dt*1e3/reps:8.2f} ms/iter", flush=True)

REPS = 8
def chain(fn):
    def run(*a):
        x = a
        for _ in range(REPS):
            x = fn(*x)
        return x
    return run

t("gather 1M from 8M (x1)", chain(lambda i, tb: ((table[i] ^ 1), tb)), idxs, table)
t("scatter 1M into 8M (x1)", chain(lambda tb, v: (tb.at[idxs].set(v), v ^ 1)), table, vals)
t("cummax (MG,) 1-D", chain(lambda v: (jax.lax.cummax(v) ^ 1,)), vals)
t("cummax (128,8192) 2-D rows", chain(lambda v: (jax.lax.cummax(v.reshape(128, 8192), axis=1).reshape(-1) ^ 1,)), vals)
t("5op rows sort (128,8192)", chain(lambda a, b: tuple(x.reshape(-1) for x in jax.lax.sort(tuple(y.reshape(128,8192) for y in (a,b,b,b,b)), num_keys=4, dimension=1)[:2])), vals, idxs)
t("5op giant sort (1,MG)", chain(lambda a, b: tuple(x[0] for x in jax.lax.sort(tuple(y[None] for y in (a,b,b,b,b)), num_keys=4, dimension=1)[:2])), vals, idxs)
t("elementwise x10 (MG,)", chain(lambda v: ((((v+1)^3)*5+v//3+(v&7)+(v>>2)+(v*3)^v) ,)), vals)
