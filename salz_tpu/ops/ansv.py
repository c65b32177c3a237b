"""All-Nearest-Smaller-Values over the suffix array — parallel PSV/NSV.

Replaces the reference's sequential KKP stack scan (salz.c:471-490) with a
fully vectorized two-phase formulation tuned for TPU's cost model (1-D random
gathers are ~3x the cost of a full sort, while shifted slices are free):

  Phase A (gather-free): for every SA slot, find its "resolve level" — the
  smallest l such that the 2^l-window adjacent to the slot contains a strictly
  smaller value. All window minima at fixed distances are shifted slices of
  the sparse table, so this phase is pure elementwise work that XLA fuses.

  Phase B (dynamic-depth descent): the classic binary descent for the exact
  slot, started at each query's resolve level and iterated only
  max(resolve level) times (a dynamic trip count — typically far fewer than
  log2(n) rounds). Left and right queries share each level's gather.

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


def _sparse_table(vals, cap: int):
    """tables[l][k] = min(vals[k : k + 2^l]) (out of range -> INF), stacked."""
    L = _levels(cap)
    tables = [vals]
    t = vals
    for l in range(1, L + 1):
        h = 1 << (l - 1)
        shifted = jnp.concatenate([t[h:], jnp.full((h,), _INF, jnp.int32)])
        t = jnp.minimum(t, shifted)
        tables.append(t)
    return jnp.stack(tables), L


def _ansv_slots(vals, n, *, cap: int):
    """Nearest-smaller slots (left, right) per SA slot, -1 when absent."""
    L = _levels(cap)
    idx = jnp.arange(cap, dtype=jnp.int32)
    table, _ = _sparse_table(vals, cap)
    x = vals

    # Exclusive prefix min (min over vals[0:k]) and inclusive suffix min
    # (min over vals[k:]) for the clamped boundary windows.
    pmin_excl = jnp.concatenate(
        [jnp.full((1,), _INF, jnp.int32), jax.lax.cummin(vals)[:-1]]
    )
    smin_incl = jnp.concatenate(
        [jax.lax.cummin(vals, reverse=True)[1:], jnp.full((1,), _INF, jnp.int32)]
    )  # smin_incl[k] = min(vals[k+1:]) via shift

    # ---- Phase A: resolve levels (shifted slices only; XLA fuses the loop).
    rL = jnp.full(cap, L + 1, jnp.int32)
    rR = jnp.full(cap, L + 1, jnp.int32)
    foundL = jnp.zeros(cap, jnp.bool_)
    foundR = jnp.zeros(cap, jnp.bool_)
    for l in range(L + 1):
        h = 1 << l
        # Left window [k-2^l, k): table[l][k-h] when in range, else prefix min.
        if h < cap:
            wl = jnp.concatenate(
                [jnp.full((h,), _INF, jnp.int32), table[l][: cap - h]]
            )
        else:
            wl = jnp.full((cap,), _INF, jnp.int32)
        hasL = jnp.where(idx - h >= 0, wl < x, pmin_excl < x)
        # Right window [k+1, k+1+2^l): table[l][k+1] when it fits, else
        # suffix min.
        wr = jnp.concatenate(
            [table[l][1:], jnp.full((1,), _INF, jnp.int32)]
        )
        hasR = jnp.where(idx + 1 + h <= cap, wr < x, smin_incl < x)
        rL = jnp.where(~foundL & hasL, l, rL)
        rR = jnp.where(~foundR & hasR, l, rR)
        foundL |= hasL
        foundR |= hasR

    # ---- Phase B: exact-slot descent from each query's resolve level.
    jmax = jnp.max(
        jnp.maximum(jnp.where(foundL, rL, 0), jnp.where(foundR, rR, 0))
    )
    flat = table.reshape(-1)

    def body(t, state):
        posL, posR = state
        l = jmax - 1 - t
        h = jnp.int32(1) << l
        candL = posL - h
        okL = (candL >= 0) & (l < rL) & foundL
        okR = (posR + h <= cap) & (l < rR) & foundR
        q = jnp.concatenate(
            [
                l * cap + jnp.clip(candL, 0, cap - 1),
                l * cap + jnp.clip(posR, 0, cap - 1),
            ]
        )
        g = flat[q]
        wminL, wminR = g[:cap], g[cap:]
        posL = jnp.where(okL & (wminL >= x), candL, posL)
        posR = jnp.where(okR & (wminR >= x), posR + h, posR)
        return posL, posR

    # Derive the init carries from `vals` so they carry the same varying
    # manual axes as the body outputs under shard_map (zero-cost: x - x).
    vzero = vals - vals
    posL0 = idx + vzero
    posR0 = idx + 1 + vzero
    posL, posR = jax.lax.fori_loop(0, jmax, body, (posL0, posR0))
    left_slot = jnp.where(foundL, posL - 1, -1)
    right_slot = jnp.where(foundR, posR, -1)
    return left_slot, right_slot


@functools.partial(jax.jit, static_argnames=("cap",))
def psv_nsv_full(sa: jax.Array, n: jax.Array, *, cap: int):
    """PSV/NSV positions, slots, and ranks, all in TEXT order.

    Args:
      sa: int32[cap]; sa[:n] is the suffix array (a permutation of [0, n)).
      n: dynamic valid length.
    Returns:
      (psv, nsv, left_slot, right_slot, rank): int32[cap] each, TEXT order;
      entries >= n are undefined. psv/nsv are text positions (-1 = absent);
      left_slot/right_slot are SA-slot indices of those candidates (-1 =
      absent); rank[i] is the SA slot of suffix i.
    """
    idx = jnp.arange(cap, dtype=jnp.int32)
    vals = jnp.where(idx < n, sa, _INF)
    left_slot, right_slot = _ansv_slots(vals, n, cap=cap)

    # Candidate VALUES: one fused gather for both sides.
    q = jnp.concatenate(
        [jnp.clip(left_slot, 0, cap - 1), jnp.clip(right_slot, 0, cap - 1)]
    )
    g = vals[q]
    psv_val = jnp.where(left_slot >= 0, g[:cap], -1)
    nsv_val = jnp.where((right_slot >= 0) & (g[cap:] != _INF), g[cap:], -1)

    # Scatter everything from SA order to text order with ONE stable sort
    # keyed by the text position (sorts beat 1-D scatters on TPU). Padded
    # slots get key cap and land past every valid position.
    dest = jnp.where(idx < n, vals, cap)
    _, psv, nsv, lslot, rslot, rank = jax.lax.sort(
        (dest, psv_val, nsv_val, left_slot, right_slot, idx), num_keys=1
    )
    return psv, nsv, lslot, rslot, rank


@functools.partial(jax.jit, static_argnames=("cap",))
def psv_nsv(sa: jax.Array, n: jax.Array, *, cap: int):
    """Text-order PSV/NSV positions for the suffix array prefix sa[:n].

    Args:
      sa: int32[cap]; sa[:n] is the suffix array (a permutation of [0, n)).
      n: dynamic valid length.
    Returns:
      (psv, nsv): int32[cap] in TEXT order; entries >= n are undefined.
    """
    psv, nsv, _, _, _ = psv_nsv_full(sa, n, cap=cap)
    return psv, nsv
