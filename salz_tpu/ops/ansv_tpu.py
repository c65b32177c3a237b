"""TPU Pallas path for ANSV: in-row resolution + compacted global descent.

The XLA path (salz_tpu/ops/ansv.py) pays ~log(n) full-size random gathers in
its exact-slot descent. On TPU the only fast random-access primitive is the
Mosaic lane gather (within rows of 128), so this path splits the problem:

  1. A Pallas kernel resolves every query whose nearest smaller value lies
     WITHIN its own 128-slot row: row-local sparse tables from lane rolls,
     binary descent with lane gathers, and the answer VALUE read off the
     level-0 table. For a random permutation the expected number of
     row-crossing queries is ~n*H(128)/128 ~ n/24 per side.

  2. Row-crossing queries are compacted (one per-block sort) into a static
     bucket of cap/8 and run through the classic full descent on 8x smaller
     arrays. If any block's bucket overflows (adversarial inputs), a
     batch-level lax.cond falls back to the full-size descent — exactness
     always. (The cond is batch-level on purpose: under vmap a cond becomes
     a select and BOTH branches execute.)

Batch-native throughout: (B, cap) arrays and flat 1-D gathers with per-block
base offsets (vmapped gathers are an order of magnitude slower on TPU).

Equivalence with the stack scan (salz.c:471-490): the nearest smaller value
within the row IS the global nearest when one exists in-row; otherwise the
bucket/fallback descent computes it from scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 2**31 - 1  # plain int: jnp scalars become captured consts in kernels
_C = 128
_LOGC = 7


def _shift_left(a, h, fill):
    """out[j] = a[j+h] along lanes (row-local), fill past the end."""
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    rolled = pltpu.roll(a, shift=_C - h, axis=1)
    return jnp.where(lane < _C - h, rolled, fill)


def _shift_right(a, h, fill):
    """out[j] = a[j-h] along lanes (row-local), fill before the start."""
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    rolled = pltpu.roll(a, shift=h, axis=1)
    return jnp.where(lane >= h, rolled, fill)


def _inrow_kernel(vals_ref, lslot_ref, lval_ref, rslot_ref, rval_ref, *, R):
    """R = rows per block; the slot base wraps at block boundaries."""
    br = vals_ref.shape[0]
    r0 = pl.program_id(0) * br
    x = vals_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, _C), 1)
    grow = jax.lax.broadcasted_iota(jnp.int32, (br, _C), 0) + r0
    base = (grow % R) * _C

    # Row-local sparse tables: tabs[l][j] = min(x[j : j+2^l]) within the row.
    tabs = [x]
    t = x
    for l in range(1, _LOGC + 1):
        t = jnp.minimum(t, _shift_left(t, 1 << (l - 1), _INF))
        tabs.append(t)

    # Row-local prefix-exclusive and suffix-after minima (log-scans).
    pm = x
    sm = x
    for h in (1, 2, 4, 8, 16, 32, 64):
        pm = jnp.minimum(pm, _shift_right(pm, h, _INF))
        sm = jnp.minimum(sm, _shift_left(sm, h, _INF))
    pmin_excl = _shift_right(pm, 1, _INF)
    smin_after = _shift_left(sm, 1, _INF)

    found_l = pmin_excl < x
    found_r = smin_after < x

    # Binary descent, both sides, all lane gathers.
    pos_l = lane
    pos_r = lane + 1
    for l in range(_LOGC - 1, -1, -1):
        h = 1 << l
        tab = tabs[l]
        cand = pos_l - h
        wmin = jnp.take_along_axis(tab, jnp.clip(cand, 0, _C - 1), axis=1)
        pos_l = jnp.where((cand >= 0) & (wmin >= x), cand, pos_l)
        wmin_r = jnp.take_along_axis(tab, jnp.clip(pos_r, 0, _C - 1), axis=1)
        pos_r = jnp.where((pos_r + h <= _C) & (wmin_r >= x), pos_r + h, pos_r)

    ans_l = jnp.clip(pos_l - 1, 0, _C - 1)
    ans_r = jnp.clip(pos_r, 0, _C - 1)
    lslot_ref[:] = jnp.where(found_l, base + ans_l, -1)
    lval_ref[:] = jnp.where(found_l, jnp.take_along_axis(x, ans_l, axis=1), -1)
    rslot_ref[:] = jnp.where(found_r, base + ans_r, -1)
    rval_ref[:] = jnp.where(found_r, jnp.take_along_axis(x, ans_r, axis=1), -1)


def _full_tables_batch(vals, cap: int):
    L = max(1, (cap - 1).bit_length())
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
    return tables, L  # per-level (B, cap) arrays


def _max_resolve_level(tables, L, vals, need_l, need_r, cap: int):
    """Smallest descent start level covering every masked query: the max over
    queries of the first level whose adjacent 2^l window holds a smaller
    value. Pure shifted slices — no gathers; XLA fuses the level loop."""
    B = vals.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    x = vals
    jmax = jnp.int32(0)
    unresL = need_l
    unresR = need_r
    for l in range(L + 1):
        h = 1 << l
        tl = tables[l]
        if h < cap:
            wl = jnp.concatenate(
                [jnp.full((B, h), _INF, jnp.int32), tl[:, : cap - h]], axis=1
            )
        else:
            wl = jnp.full((B, cap), _INF, jnp.int32)
        wr = jnp.concatenate(
            [tl[:, 1:], jnp.full((B, 1), _INF, jnp.int32)], axis=1
        )
        hitL = unresL & (idx - h >= 0) & (wl < x)
        hitR = unresR & (idx + 1 + h <= cap) & (wr < x)
        any_hit = jnp.any(hitL | hitR)
        jmax = jnp.where(any_hit, jnp.int32(l), jmax)
        unresL = unresL & ~hitL
        unresR = unresR & ~hitR
    return jmax


def _descend_batch(tabstack, jmax, vals, q, side_left, cap: int):
    """Binary descent for queries q (B, m) with a DYNAMIC start level jmax
    (the max resolve level — existence presumed; callers mask absent). Each
    level reads its (B, cap) slice out of the stacked table, staying under
    TPU's ~128MB gather-throughput cliff."""
    B, m = q.shape
    vrow = (jnp.arange(B, dtype=jnp.int32) * cap)[:, None]
    x = vals.reshape(-1)[vrow + jnp.clip(q, 0, cap - 1)]
    pos0 = jnp.where(side_left, q, q + 1)

    def body(t, pos):
        l = jmax - t
        tab = jax.lax.dynamic_slice(
            tabstack, (0, l, 0), (B, 1, cap)
        ).reshape(-1)
        h = jnp.int32(1) << l
        cand = jnp.where(side_left, pos - h, pos)
        ok = jnp.where(side_left, cand >= 0, pos + h <= cap)
        wmin = tab[vrow + jnp.clip(cand, 0, cap - 1)]
        step = ok & (wmin >= x)
        return jnp.where(step, jnp.where(side_left, cand, pos + h), pos)

    pos = jax.lax.fori_loop(0, jmax + 1, body, pos0)
    slot = jnp.clip(jnp.where(side_left, pos - 1, pos), 0, cap - 1)
    return slot, vals.reshape(-1)[vrow + slot]


@functools.partial(jax.jit, static_argnames=("cap",))
def ansv_slots_vals_tpu_batch(vals: jax.Array, n: jax.Array, *, cap: int):
    """(lslot, lval, rslot, rval) per SA slot, (B, cap) each; -1 = absent."""
    B = vals.shape[0]
    R = cap // _C
    rows = B * R
    # R is a power of two (cap % 1024 == 0 gate); pick the largest block
    # height <= 512 that divides the total row count.
    br = R
    while br < 512 and rows % (2 * br) == 0:
        br *= 2
    br = min(br, 512)
    assert rows % br == 0
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]

    kern = functools.partial(_inrow_kernel, R=R)
    lslot, lval, rslot, rval = pl.pallas_call(
        kern,
        grid=(rows // br,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, _C), jnp.int32) for _ in range(4)
        ),
        in_specs=[
            pl.BlockSpec((br, _C), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=tuple(
            pl.BlockSpec((br, _C), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
    )(vals.reshape(rows, _C))
    lslot = lslot.reshape(B, cap)
    lval = lval.reshape(B, cap)
    rslot = rslot.reshape(B, cap)
    rval = rval.reshape(B, cap)

    # Global absence tests (one cummin each). Padded slots are excluded so
    # they cannot flood the bucket.
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
    x = vals
    real = idx < n[:, None]
    need_l = (lslot < 0) & (pmin_excl < x) & real
    need_r = (rslot < 0) & (smin_after < x) & real
    lslot = jnp.where(real & ~need_l, lslot, -1)
    rslot = jnp.where(real & ~need_r, rslot, -1)

    # Compact row-crossing queries into two half-buckets (left-side queries
    # then right-side queries) so ONE descent with a per-entry side flag
    # covers everything.
    M = max(cap // 16, 1024)  # per side
    count_l = jnp.sum(need_l.astype(jnp.int32), axis=1)  # (B,)
    count_r = jnp.sum(need_r.astype(jnp.int32), axis=1)
    slot_iota = jnp.broadcast_to(idx, (B, cap)) + (vals - vals)
    _, qpos_l = jax.lax.sort(
        (jnp.where(need_l, 0, 1).astype(jnp.int32), slot_iota),
        num_keys=1,
        dimension=1,
    )
    _, qpos_r = jax.lax.sort(
        (jnp.where(need_r, 0, 1).astype(jnp.int32), slot_iota),
        num_keys=1,
        dimension=1,
    )

    frow = (jnp.arange(B, dtype=jnp.int32) * cap)[:, None]
    sentinel = B * cap

    def scat(arr, mask, qk, val):
        flat_idx = jnp.where(mask, frow + qk, sentinel)
        return (
            arr.reshape(-1)
            .at[flat_idx.reshape(-1)]
            .set(val.reshape(-1), mode="drop")
            .reshape(B, cap)
        )

    def bucket_path(_):
        tabs, L = _full_tables_batch(vals, cap)
        jmax = _max_resolve_level(tabs, L, vals, need_l, need_r, cap)
        stack = jnp.stack(tabs, axis=1)  # (B, L+1, cap)
        qk = jnp.clip(
            jnp.concatenate([qpos_l[:, :M], qpos_r[:, :M]], axis=1),
            0,
            cap - 1,
        )
        mid = jnp.arange(M, dtype=jnp.int32)[None, :]
        valid_l = mid < count_l[:, None]
        valid_r = mid < count_r[:, None]
        side = jnp.concatenate(
            [jnp.ones((B, M), jnp.bool_), jnp.zeros((B, M), jnp.bool_)],
            axis=1,
        )
        s, v = _descend_batch(stack, jmax, vals, qk, side, cap)
        ls = scat(lslot, valid_l, qk[:, :M], s[:, :M])
        lv = scat(lval, valid_l, qk[:, :M], v[:, :M])
        rs = scat(rslot, valid_r, qk[:, M:], s[:, M:])
        rv = scat(rval, valid_r, qk[:, M:], v[:, M:])
        return ls, lv, rs, rv

    def full_path(_):
        tabs, L = _full_tables_batch(vals, cap)
        jmax = _max_resolve_level(tabs, L, vals, need_l, need_r, cap)
        stack = jnp.stack(tabs, axis=1)
        full_idx = jnp.broadcast_to(idx, (B, cap)) + (vals - vals)
        sl, vl = _descend_batch(
            stack, jmax, vals, full_idx, jnp.ones((B, cap), jnp.bool_), cap
        )
        sr, vr = _descend_batch(
            stack, jmax, vals, full_idx, jnp.zeros((B, cap), jnp.bool_), cap
        )
        ls = jnp.where(need_l, sl, lslot)
        lv = jnp.where(need_l, vl, lval)
        rs = jnp.where(need_r, sr, rslot)
        rv = jnp.where(need_r, vr, rval)
        return ls, lv, rs, rv

    fits = (jnp.max(count_l) <= M) & (jnp.max(count_r) <= M)
    return jax.lax.cond(fits, bucket_path, full_path, 0)
