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
  max(resolve level) times (a dynamic trip count). Left and right queries
  share each level's gather.

On TPU the slot search dispatches to the Pallas in-row kernel + compacted
descent in salz_tpu/ops/ansv_tpu.py instead.

Everything is BATCH-NATIVE: (B, cap) arrays, flat 1-D gathers with per-block
base offsets, batch-level conds — vmapped gathers and vmapped lax.cond (which
executes both branches) are an order of magnitude slower on TPU.

Semantics match the stack scan exactly: values are text positions (all
distinct), -1 means "no smaller value on that side" (the reference's -1
sentinels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INF = np.int32(2**31 - 1)  # np, not jnp: device-array consts cost ~24 s/lowering via axon


def _levels(cap: int) -> int:
    return max(1, (cap - 1).bit_length())


def _sparse_table_batch(vals, cap: int):
    """tables[:, l, k] = min(vals[:, k : k + 2^l]) (out of range -> INF)."""
    L = _levels(cap)
    B = vals.shape[0]
    tables = [vals]
    t = vals
    for l in range(1, L + 1):
        h = 1 << (l - 1)
        shifted = jnp.concatenate(
            [t[:, h:], jnp.full((B, h), _INF, jnp.int32)], axis=1
        )
        t = jnp.minimum(t, shifted)
        tables.append(t)
    return jnp.stack(tables, axis=1), L  # (B, L+1, cap)


def _ansv_slots_batch(vals, n, *, cap: int):
    """Nearest-smaller slots (left, right) per SA slot, -1 when absent."""
    L = _levels(cap)
    B = vals.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    table, _ = _sparse_table_batch(vals, cap)
    flat = table.reshape(-1)
    brow = (jnp.arange(B, dtype=jnp.int32) * (L + 1) * cap)[:, None]
    x = vals

    # Exclusive prefix min and after-suffix min for clamped boundary windows.
    pmin_excl = jnp.concatenate(
        [
            jnp.full((B, 1), _INF, jnp.int32),
            jax.lax.cummin(vals, axis=1)[:, :-1],
        ],
        axis=1,
    )
    smin_after = jnp.concatenate(
        [
            jax.lax.cummin(vals, axis=1, reverse=True)[:, 1:],
            jnp.full((B, 1), _INF, jnp.int32),
        ],
        axis=1,
    )

    # ---- Phase A: resolve levels (shifted slices only; XLA fuses the loop).
    rL = jnp.full((B, cap), L + 1, jnp.int32)
    rR = jnp.full((B, cap), L + 1, jnp.int32)
    foundL = jnp.zeros((B, cap), jnp.bool_)
    foundR = jnp.zeros((B, cap), jnp.bool_)
    for l in range(L + 1):
        h = 1 << l
        tl = table[:, l, :]
        if h < cap:
            wl = jnp.concatenate(
                [jnp.full((B, h), _INF, jnp.int32), tl[:, : cap - h]], axis=1
            )
        else:
            wl = jnp.full((B, cap), _INF, jnp.int32)
        hasL = jnp.where(idx - h >= 0, wl < x, pmin_excl < x)
        wr = jnp.concatenate(
            [tl[:, 1:], jnp.full((B, 1), _INF, jnp.int32)], axis=1
        )
        hasR = jnp.where(idx + 1 + h <= cap, wr < x, smin_after < x)
        rL = jnp.where(~foundL & hasL, l, rL)
        rR = jnp.where(~foundR & hasR, l, rR)
        foundL |= hasL
        foundR |= hasR

    # ---- Phase B: exact-slot descent from each query's resolve level.
    jmax = jnp.max(
        jnp.maximum(jnp.where(foundL, rL, 0), jnp.where(foundR, rR, 0))
    )

    def body(t, state):
        posL, posR = state
        l = jmax - 1 - t
        h = jnp.int32(1) << l
        candL = posL - h
        okL = (candL >= 0) & (l < rL) & foundL
        okR = (posR + h <= cap) & (l < rR) & foundR
        qL = brow + l * cap + jnp.clip(candL, 0, cap - 1)
        qR = brow + l * cap + jnp.clip(posR, 0, cap - 1)
        g = flat[jnp.concatenate([qL, qR], axis=1)]
        wminL, wminR = g[:, :cap], g[:, cap:]
        posL = jnp.where(okL & (wminL >= x), candL, posL)
        posR = jnp.where(okR & (wminR >= x), posR + h, posR)
        return posL, posR

    vzero = vals - vals  # varying-axes-preserving zero (shard_map)
    posL0 = idx + vzero
    posR0 = idx + 1 + vzero
    posL, posR = jax.lax.fori_loop(0, jmax, body, (posL0, posR0))
    left_slot = jnp.where(foundL, posL - 1, -1)
    right_slot = jnp.where(foundR, posR, -1)
    return left_slot, right_slot


@functools.partial(jax.jit, static_argnames=("cap", "with_buckets"))
def ansv_slots_vals_batch(
    vals: jax.Array, n: jax.Array, *, cap: int, with_buckets: bool = False
):
    """Nearest-smaller (slot, value) per SA slot, both sides, SLOT order.

    Args:
      vals: int32[B, cap]; SA values with padded slots set to INF.
      n: int32[B] dynamic valid lengths.
      with_buckets: additionally return the TPU path's compacted crossing
        buckets (qpos_l, count_l, qpos_r, count_r), or None on the XLA path
        — the range-min stage reuses them to skip its own compaction sorts.
    Returns:
      (lslot, psv_val, rslot, nsv_val): int32[B, cap] each, slot order;
      slots/values are -1 where no smaller value exists on that side.
      With with_buckets: ((lslot, psv_val, rslot, nsv_val), buckets).
    """
    B = vals.shape[0]
    buckets = None
    if jax.default_backend() == "tpu" and cap % 1024 == 0:
        from salz_tpu.ops.ansv_tpu import ansv_slots_vals_tpu_batch

        if with_buckets:
            (left_slot, lval, right_slot, rval), buckets = (
                ansv_slots_vals_tpu_batch(vals, n, cap=cap, with_buckets=True)
            )
        else:
            left_slot, lval, right_slot, rval = ansv_slots_vals_tpu_batch(
                vals, n, cap=cap
            )
        psv_val = jnp.where(left_slot >= 0, lval, -1)
        nsv_val = jnp.where(right_slot >= 0, rval, -1)
    else:
        left_slot, right_slot = _ansv_slots_batch(vals, n, cap=cap)
        # Candidate VALUES: one fused flat gather for both sides.
        brow = (jnp.arange(B, dtype=jnp.int32) * cap)[:, None]
        q = jnp.concatenate(
            [
                brow + jnp.clip(left_slot, 0, cap - 1),
                brow + jnp.clip(right_slot, 0, cap - 1),
            ],
            axis=1,
        )
        g = vals.reshape(-1)[q]
        psv_val = jnp.where(left_slot >= 0, g[:, :cap], -1)
        nsv_val = jnp.where(
            (right_slot >= 0) & (g[:, cap:] != _INF), g[:, cap:], -1
        )
    if with_buckets:
        return (left_slot, psv_val, right_slot, nsv_val), buckets
    return left_slot, psv_val, right_slot, nsv_val


@functools.partial(jax.jit, static_argnames=("cap",))
def psv_nsv_full_batch(sa: jax.Array, n: jax.Array, *, cap: int):
    """PSV/NSV positions, slots, and ranks in TEXT order, batched.

    Args:
      sa: int32[B, cap]; sa[b, :n[b]] is the suffix array of block b.
      n: int32[B] dynamic valid lengths.
    Returns:
      (psv, nsv, left_slot, right_slot, rank): int32[B, cap] each, TEXT
      order; entries >= n are undefined. psv/nsv are text positions (-1 =
      absent); left_slot/right_slot are SA-slot indices of those candidates
      (-1 = absent); rank is the SA slot of each text position.
    """
    B = sa.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    valid = idx < n[:, None]
    vals = jnp.where(valid, sa, _INF)
    left_slot, psv_val, right_slot, nsv_val = ansv_slots_vals_batch(
        vals, n, cap=cap
    )

    # Scatter everything from SA order to text order with ONE stable sort
    # per block keyed by the text position (sorts beat 1-D scatters on TPU).
    # Padded slots get key cap and land past every valid position.
    dest = jnp.where(valid, vals, cap)
    slot_iota = jnp.broadcast_to(idx, (B, cap)) + (vals - vals)
    _, psv, nsv, lslot, rslot, rank = jax.lax.sort(
        (dest, psv_val, nsv_val, left_slot, right_slot, slot_iota),
        num_keys=1,
        dimension=1,
    )
    return psv, nsv, lslot, rslot, rank


@functools.partial(jax.jit, static_argnames=("cap",))
def psv_nsv_full(sa: jax.Array, n: jax.Array, *, cap: int):
    """Single-block wrapper over psv_nsv_full_batch."""
    out = psv_nsv_full_batch(sa[None], jnp.asarray(n)[None], cap=cap)
    return tuple(o[0] for o in out)


@functools.partial(jax.jit, static_argnames=("cap",))
def psv_nsv(sa: jax.Array, n: jax.Array, *, cap: int):
    """Text-order PSV/NSV positions for the suffix array prefix sa[:n]."""
    psv, nsv, _, _, _ = psv_nsv_full(sa, n, cap=cap)
    return psv, nsv
