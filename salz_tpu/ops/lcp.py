"""Arbitrary-pair LCP queries from doubling-rank checkpoints.

TPU-parallel replacement for the reference's sequential seeded LCP scan
(salz.c:492-514 + the prev_len-1 skip at salz.c:524,530): with the rank
checkpoints produced during suffix-array doubling, the LCP of any two suffixes
is computed by a binary descent — add 2^k to the running match length whenever
the level-k ranks agree and both blocks fit in the text. All queries run as
log(n) rounds of dense gathers, independent per position.

The result equals the reference's value exactly: its seeded compare returns the
true LCP capped at n - max(i, j) (the KKP skip never changes the outcome, see
FORMAT.md §1.7), and the binary descent computes precisely that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("cap",))
def pair_lcp(ckpt: jax.Array, n: jax.Array, i: jax.Array, j: jax.Array, *, cap: int):
    """LCP of suffix pairs (i[k], j[k]) of text[:n].

    Args:
      ckpt: int32[L, cap] rank checkpoints (suffix_array_with_ranks output).
      i, j: int32[cap] suffix start positions; entries with i<0 or j<0 yield 0.
    Returns:
      int32[cap] match lengths (capped at n - max(i, j) by construction).
    """
    L = int(ckpt.shape[0])
    valid = (i >= 0) & (j >= 0)
    iv = jnp.clip(i, 0, cap - 1)
    jv = jnp.clip(j, 0, cap - 1)
    l = jnp.zeros(i.shape, jnp.int32)
    for k in range(L - 1, -1, -1):
        h = jnp.int32(1 << k)
        a = iv + l
        b = jv + l
        fits = (a + h <= n) & (b + h <= n)
        ra = ckpt[k][jnp.clip(a, 0, cap - 1)]
        rb = ckpt[k][jnp.clip(b, 0, cap - 1)]
        l = jnp.where(valid & fits & (ra == rb), l + h, l)
    return jnp.where(valid, l, 0)
