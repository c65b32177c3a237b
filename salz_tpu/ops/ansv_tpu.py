"""TPU Pallas path for ANSV: wide in-row resolution + compacted global descent.

The XLA path (salz_tpu/ops/ansv.py) pays ~log(n) full-size random gathers in
its exact-slot descent. On TPU the only fast random-access primitive is the
Mosaic lane gather (within 128 lanes), so this path splits the problem:

  1. A Pallas kernel resolves every query whose nearest smaller value lies
     WITHIN its own 512-slot row: row-local sparse tables from lane rolls, a
     binary descent whose gathers are 4x4 tile-selected 128-lane gathers, and
     the answer VALUE read off the level-0 table. Rows are 512 wide (vs the
     naive 128) because in-VMEM vector work is ~50x cheaper than the HBM
     gathers of phase 2: for a random permutation the expected number of
     row-crossing queries drops from ~n*H(128)/128 ~ 4.2%/side to
     ~n*H(512)/512 ~ 1.3%/side, shrinking phase 2 by ~3x.

  2. Row-crossing queries are compacted (one per-block sort per side) into a
     static bucket and run through the classic full descent. The bucket width
     climbs a ladder (cap/64 -> cap/16 -> full) picked by a batch-level
     lax.cond on the actual counts, so the descent's gather volume tracks the
     data instead of the worst case. (Batch-level conds on purpose: under
     vmap a cond becomes a select and BOTH branches execute.)

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

from salz_tpu.ops.rowops import LOGW as _LOGW
from salz_tpu.ops.rowops import NT as _NT
from salz_tpu.ops.rowops import T as _T
from salz_tpu.ops.rowops import W as _W
from salz_tpu.ops.rowops import Row512, pick_br

_INF = 2**31 - 1  # plain int: jnp scalars become captured consts in kernels

#: test hook: run the Pallas kernel in interpret mode on CPU
_FORCE_INTERPRET = False


def _inrow_kernel(vals_ref, lslot_ref, lval_ref, rslot_ref, rval_ref, *, R):
    """In-row ANSV over 512-slot rows laid out as 4 consecutive 128-lane
    tiles (Mosaic's native shape — 512-wide vectors crash its layout pass).
    Cross-tile shifts are sublane rolls + lane rolls; wide gathers probe the
    7 possible tile offsets with rolled take_along_axis. R = 512-rows per
    block; the slot base wraps at block boundaries."""
    br = vals_ref.shape[0]  # 128-lane rows per step; multiple of _NT
    r0 = pl.program_id(0) * br
    x = vals_ref[:]  # (br, _T)
    ctx = Row512(br, r0)
    pos = ctx.pos
    base = (ctx.bigrow % R) * _W
    shift_left, shift_right, gather512 = (
        ctx.shift_left, ctx.shift_right, ctx.gather
    )

    # Row-local sparse tables: tabs[l][j] = min(x[j : j+2^l]) within the row.
    tabs = [x]
    t = x
    for l in range(1, _LOGW + 1):
        t = jnp.minimum(t, shift_left(t, 1 << (l - 1), _INF))
        tabs.append(t)

    # Row-local prefix-exclusive and suffix-after minima (log-scans).
    pm = x
    sm = x
    for l in range(_LOGW):
        h = 1 << l
        pm = jnp.minimum(pm, shift_right(pm, h, _INF))
        sm = jnp.minimum(sm, shift_left(sm, h, _INF))
    pmin_excl = shift_right(pm, 1, _INF)
    smin_after = shift_left(sm, 1, _INF)

    found_l = pmin_excl < x
    found_r = smin_after < x

    # Binary descent, both sides.
    pos_l = pos
    pos_r = pos + 1
    for l in range(_LOGW - 1, -1, -1):
        h = 1 << l
        tab = tabs[l]
        cand = pos_l - h
        wmin = gather512(tab, jnp.clip(cand, 0, _W - 1))
        pos_l = jnp.where((cand >= 0) & (wmin >= x), cand, pos_l)
        wmin_r = gather512(tab, jnp.clip(pos_r, 0, _W - 1))
        pos_r = jnp.where((pos_r + h <= _W) & (wmin_r >= x), pos_r + h, pos_r)

    ans_l = jnp.clip(pos_l - 1, 0, _W - 1)
    ans_r = jnp.clip(pos_r, 0, _W - 1)
    lslot_ref[:] = jnp.where(found_l, base + ans_l, -1)
    lval_ref[:] = jnp.where(found_l, gather512(x, ans_l), -1)
    rslot_ref[:] = jnp.where(found_r, base + ans_r, -1)
    rval_ref[:] = jnp.where(found_r, gather512(x, ans_r), -1)


def _full_tables_batch(vals, cap: int, levels: int | None = None):
    """Levels 0..L-1 (the descent's static top level is L-1: 2^L - 1 skip
    capacity >= cap - 1 covers any in-block distance). `levels` caps the
    stack for callers that only descend within a bounded distance."""
    L = max(1, (cap - 1).bit_length())
    if levels is not None:
        L = min(L, levels)
    B = vals.shape[0]
    tables = [vals]
    t = vals
    for l in range(1, L):
        h = 1 << (l - 1)
        shifted = jnp.concatenate(
            [t[:, h:], jnp.full((B, h), _INF, jnp.int32)], axis=1
        )
        t = jnp.minimum(t, shifted)
        tables.append(t)
    return tables, L  # per-level (B, cap) arrays


def _descend_batch(tables, L, vals, q, side_left, cap: int):
    """Binary descent for queries q (B, m) over the per-level tables
    (existence presumed; callers mask absent answers). The level loop is
    STATICALLY unrolled from the top so each level indexes its own (B, cap)
    table directly — no stacked-table materialization, no dynamic slices,
    and no max-resolve prepass; a handful of extra masked gather levels is
    cheaper than all three."""
    B, m = q.shape
    vrow = (jnp.arange(B, dtype=jnp.int32) * cap)[:, None]
    x = vals.reshape(-1)[vrow + jnp.clip(q, 0, cap - 1)]
    pos = jnp.where(side_left, q, q + 1)

    for l in range(L - 1, -1, -1):
        h = jnp.int32(1) << l
        tab = tables[l].reshape(-1)
        cand = jnp.where(side_left, pos - h, pos)
        ok = jnp.where(side_left, cand >= 0, pos + h <= cap)
        wmin = tab[vrow + jnp.clip(cand, 0, cap - 1)]
        step = ok & (wmin >= x)
        pos = jnp.where(step, jnp.where(side_left, cand, pos + h), pos)

    slot = jnp.clip(jnp.where(side_left, pos - 1, pos), 0, cap - 1)
    return slot, vals.reshape(-1)[vrow + slot]


def _row_tables(vals, cap: int):
    """Sparse min tables over 512-slot-row minima: LR levels of (B, R)."""
    B = vals.shape[0]
    R = cap // _W
    rowmin = vals.reshape(B, R, _W).min(axis=2)
    LR = max(1, (R - 1).bit_length())
    tabs = [rowmin]
    t = rowmin
    for l in range(1, LR):
        h = 1 << (l - 1)
        t = jnp.minimum(
            t,
            jnp.concatenate(
                [t[:, h:], jnp.full((B, h), _INF, jnp.int32)], axis=1
            ),
        )
        tabs.append(t)
    return tabs, LR, R


def _descend_two_level(tabs9, rowtabs, LR, vals, q, side_left, cap: int,
                       vrow=None, rrow=None):
    """Crossing-query descent: row-level NSV over (B, R) row minima (cheap
    small-operand gathers), then a <=512-distance descent inside the answer
    row over levels 0..8 only. Callers guarantee the answer exists OUTSIDE
    the query's own row (the in-row kernel already failed), which is exactly
    when the nearest qualifying row is a different row. Replaces the 20-level
    full descent: 9 full-size table builds + 9 big gathers instead of 20+20.

    vrow/rrow (element base offsets into the flattened value / row-minima
    tables) default to one block per batch row; the GLOBAL-POOL path passes
    per-element offsets so queries from many blocks share one compact
    bucket (q is then block-LOCAL slots)."""
    B, m = q.shape
    R = cap // _W
    if vrow is None:
        rrow = (jnp.arange(B, dtype=jnp.int32) * R)[:, None]
        vrow = (jnp.arange(B, dtype=jnp.int32) * cap)[:, None]
    x = vals.reshape(-1)[vrow + jnp.clip(q, 0, cap - 1)]
    rowq = jnp.clip(q, 0, cap - 1) >> _LOGW  # row of width _W = 2^_LOGW

    pos = jnp.where(side_left, rowq, rowq + 1)
    for l in range(LR - 1, -1, -1):
        h = jnp.int32(1) << l
        cand = jnp.where(side_left, pos - h, pos)
        ok = jnp.where(side_left, cand >= 0, pos + h <= R)
        wmin = rowtabs[l].reshape(-1)[rrow + jnp.clip(cand, 0, R - 1)]
        step = ok & (wmin >= x)
        pos = jnp.where(step, jnp.where(side_left, cand, pos + h), pos)
    row = jnp.clip(jnp.where(side_left, pos - 1, pos), 0, R - 1)

    lo_bound = row * _W
    hi_bound = lo_bound + _W
    p2 = jnp.where(side_left, hi_bound, lo_bound)
    for l in range(len(tabs9) - 1, -1, -1):
        h = jnp.int32(1) << l
        cand = jnp.where(side_left, p2 - h, p2)
        ok = jnp.where(side_left, cand >= lo_bound, p2 + h <= hi_bound)
        wmin = tabs9[l].reshape(-1)[vrow + jnp.clip(cand, 0, cap - 1)]
        step = ok & (wmin >= x)
        p2 = jnp.where(step, jnp.where(side_left, cand, p2 + h), p2)

    slot = jnp.clip(jnp.where(side_left, p2 - 1, p2), 0, cap - 1)
    return slot, vals.reshape(-1)[vrow + slot]


@functools.partial(jax.jit, static_argnames=("cap", "with_buckets"))
def ansv_slots_vals_tpu_batch(
    vals: jax.Array, n: jax.Array, *, cap: int, with_buckets: bool = False
):
    """(lslot, lval, rslot, rval) per SA slot, (B, cap) each; -1 = absent.

    with_buckets additionally returns (qpos_l, count_l, qpos_r, count_r):
    the compacted row-crossing slot buckets. The range-min stage reuses them
    as its crossing-query compaction (the crossing range-min set is a subset
    of these slots, and the boundary cases resolve exactly through its
    same-row/edge logic), saving two full-width sorts there."""
    B = vals.shape[0]
    R = cap // _W
    rows = B * cap // _T  # 128-lane rows
    # Pick the largest step height <= 256 that divides the row count and
    # keeps whole 4-row groups together (cap % 1024 == 0 gate => rows % 4
    # == 0... rows % _NT == 0 holds since cap >= 1024).
    br = pick_br(rows)
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]

    kern = functools.partial(_inrow_kernel, R=R)
    lslot, lval, rslot, rval = pl.pallas_call(
        kern,
        grid=(rows // br,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, _T), jnp.int32) for _ in range(4)
        ),
        in_specs=[
            pl.BlockSpec((br, _T), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=tuple(
            pl.BlockSpec((br, _T), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        interpret=_FORCE_INTERPRET,
    )(vals.reshape(rows, _T))
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

    # Compact row-crossing queries (one single-operand sort per side, shared
    # by every rung): key = flag*2^26 | slot keeps the needed slots first in
    # slot order, and a 1-operand sort is ~40% cheaper than key+payload.
    # (cap <= 2^24 always: the format's 24-bit length field.)
    count_l = jnp.sum(need_l.astype(jnp.int32), axis=1)  # (B,)
    count_r = jnp.sum(need_r.astype(jnp.int32), axis=1)
    slot_iota = jnp.broadcast_to(idx, (B, cap)) + (vals - vals)
    flagbit = jnp.int32(1 << 26)
    (fused_l,) = jax.lax.sort(
        (jnp.where(need_l, slot_iota, slot_iota | flagbit),),
        num_keys=1,
        dimension=1,
    )
    (fused_r,) = jax.lax.sort(
        (jnp.where(need_r, slot_iota, slot_iota | flagbit),),
        num_keys=1,
        dimension=1,
    )
    qpos_l = fused_l & (flagbit - 1)
    qpos_r = fused_r & (flagbit - 1)

    # The two-level descent tables are built UNCONDITIONALLY: they are pure
    # shifted-slice min chains XLA fuses (~1% of one bucket descent), and
    # hoisting them lets each side/rung branch skip straight to its descent.
    tabs9 = _full_tables_batch(vals, cap, levels=_LOGW)[0]
    rowtabs, LR, _R = _row_tables(vals, cap)

    # GLOBAL-POOL buckets (round 3): the descent's gather volume is rung *
    # levels, and a per-block rung must be sized for the WORST block — on
    # license text one block at 6.8% need_r forced a cap/4 rung while the
    # batch total was 2.6%, a ~10x gather waste. Instead the per-block
    # compacted prefixes are regathered into ONE cross-block pool sized by
    # the BATCH total (cumsum offsets + binary-searched block ids), so one
    # skewed block borrows headroom from the others.
    off_l = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(count_l)]
    )
    off_r = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(count_r)]
    )

    def make_pool_path(MG: int, left: bool):
        qpos, off = (qpos_l, off_l) if left else (qpos_r, off_r)
        slot0, val0 = (lslot, lval) if left else (rslot, rval)

        def path(_):
            g = jnp.arange(MG, dtype=jnp.int32)
            bq = jnp.clip(
                jnp.searchsorted(off[1:], g, side="right").astype(jnp.int32),
                0, B - 1,
            )
            li = g - off[bq]
            valid = g < off[B]
            q = jnp.clip(
                qpos.reshape(-1)[bq * cap + jnp.clip(li, 0, cap - 1)],
                0, cap - 1,
            )
            side = jnp.full((1, MG), left, jnp.bool_)
            s, v = _descend_two_level(
                tabs9, rowtabs, LR, vals, q[None, :], side, cap,
                vrow=(bq * cap)[None, :], rrow=(bq * _R)[None, :],
            )
            flat_idx = jnp.where(valid, bq * cap + q, B * cap)
            s_out = (
                slot0.reshape(-1).at[flat_idx].set(s[0], mode="drop")
                .reshape(B, cap)
            )
            v_out = (
                val0.reshape(-1).at[flat_idx].set(v[0], mode="drop")
                .reshape(B, cap)
            )
            return s_out, v_out

        return path

    def make_side_full(left: bool):
        """Full-width two-level descent (adversarial fallback; still ~2x
        cheaper than the 20-level flat descent it replaced)."""
        need = need_l if left else need_r
        slot0, val0 = (lslot, lval) if left else (rslot, rval)

        def path(_):
            full_idx = jnp.broadcast_to(idx, (B, cap)) + (vals - vals)
            side = jnp.full((B, cap), left, jnp.bool_)
            s, v = _descend_two_level(
                tabs9, rowtabs, LR, vals, full_idx, side, cap
            )
            return jnp.where(need, s, slot0), jnp.where(need, v, val0)

        return path

    # Pool rungs on the BATCH total: random-permutation crossing rate is
    # ~1.3%/side at _W = 512 (~cap/77), so B*cap/64 covers typical batches;
    # /32 and /8 absorb repeat-heavy corpora; adversarial inputs fall
    # through to the full-width two-level descent.
    G1 = max(B * cap // 64, 1024)
    G2 = max(B * cap // 32, 2048)
    G3 = max(B * cap // 8, 4096)

    def side_ladder(off, left):
        tot = off[B]
        return jax.lax.cond(
            tot <= G1,
            make_pool_path(G1, left),
            lambda _: jax.lax.cond(
                tot <= G2,
                make_pool_path(G2, left),
                lambda _: jax.lax.cond(
                    tot <= G3,
                    make_pool_path(G3, left),
                    make_side_full(left),
                    0,
                ),
                0,
            ),
            0,
        )

    ls, lv = side_ladder(off_l, True)
    rs, rv = side_ladder(off_r, False)
    out = (ls, lv, rs, rv)
    if with_buckets:
        return out, (qpos_l, count_l, qpos_r, count_r)
    return out
