"""All-Nearest-Smaller-Values over the suffix array — parallel PSV/NSV.

Replaces the reference's sequential KKP stack scan (salz.c:471-490) with a
fully vectorized formulation: build a min sparse table over the SA values and,
for every slot, binary-jump left (PSV) and right (NSV) to the nearest strictly
smaller value. All log(n) rounds are dense vector ops + gathers — no data
dependent control flow, so XLA maps them straight onto the VPU.

Semantics match the stack scan exactly: values are text positions (all
distinct), -1 means "no smaller value on that side" (the reference's -1
sentinels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.int32(2**31 - 1)


def _levels(cap: int) -> int:
    return max(1, (cap - 1).bit_length())


@functools.partial(jax.jit, static_argnames=("cap",))
def psv_nsv(sa: jax.Array, n: jax.Array, *, cap: int):
    """Text-order PSV/NSV positions for the suffix array prefix sa[:n].

    Args:
      sa: int32[cap]; sa[:n] is the suffix array (a permutation of [0, n)).
      n: dynamic valid length.
    Returns:
      (psv, nsv): int32[cap] in TEXT order; entries >= n are undefined.
    """
    L = _levels(cap)
    idx = jnp.arange(cap, dtype=jnp.int32)
    vals = jnp.where(idx < n, sa, _INF)

    # Sparse table: table[l][k] = min(vals[k : k + 2^l]) (out of range -> INF).
    tables = [vals]
    t = vals
    for l in range(1, L + 1):
        h = 1 << (l - 1)
        shifted = jnp.concatenate([t[h:], jnp.full((h,), _INF, jnp.int32)])
        t = jnp.minimum(t, shifted)
        tables.append(t)

    def nearest_smaller_left(x):
        # Largest k' < k with vals[k'] < x[k]; returns SA-slot index or -1.
        pos = idx  # exclusive right end of the unexplored region
        for l in range(L, -1, -1):
            h = 1 << l
            cand = pos - h
            ok = cand >= 0
            window_min = tables[l][jnp.clip(cand, 0, cap - 1)]
            pos = jnp.where(ok & (window_min >= x), cand, pos)
        return pos - 1

    def nearest_smaller_right(x):
        pos = idx + 1  # inclusive left end of the unexplored region
        for l in range(L, -1, -1):
            h = 1 << l
            window_min = tables[l][jnp.clip(pos, 0, cap - 1)]
            ok = pos + h <= cap
            pos = jnp.where(ok & (window_min >= x), pos + h, pos)
        return jnp.where(pos < cap, pos, -1)

    left_slot = nearest_smaller_left(vals)
    right_slot = nearest_smaller_right(vals)

    psv_val = jnp.where(left_slot >= 0, vals[jnp.clip(left_slot, 0, cap - 1)], -1)
    nsv_val = jnp.where(right_slot >= 0, vals[jnp.clip(right_slot, 0, cap - 1)], -1)
    nsv_val = jnp.where(nsv_val == _INF, -1, nsv_val)

    # Scatter from SA order to text order (padded slots -> index cap: dropped).
    dest = jnp.where(idx < n, vals, cap)
    psv = jnp.zeros(cap, jnp.int32).at[dest].set(psv_val, mode="drop")
    nsv = jnp.zeros(cap, jnp.int32).at[dest].set(nsv_val, mode="drop")
    return psv, nsv
