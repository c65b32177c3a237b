"""Token-start selection via chunked pointer jumping (TPU Pallas path).

The chosen parse is the successor chain 0 -> len[0] -> ... -> n
(salz.c:701-729 walks it sequentially). The generic XLA path
(salz_tpu/ops/emit.py `token_starts`) squares the successor map with
full-array gathers+scatters — log2(cap) expensive 1-D random-access rounds.

This module exploits the one fast random-access primitive TPU has — the
Mosaic lane gather, which only works WITHIN rows of 128 lanes — by chunking
the chain into 128-position rows:

  Kernel A (rows independent, lane gathers only): per-chunk jump tables
    J_k = f^(2^k) restricted to the chunk, each chunk's first-exit map E128,
    and its composition E1024 up to 1024-aligned windows (sublane rolls +
    lane gathers).
  XLA walk: the chain visits each 1024-window once — a cap/1024-step scalar
    walk over E1024 collects each window's entry, then <= 8 tiny vector steps
    over E128 recover every 128-chunk entry.
  Kernel B (rows independent): materialize the in-chunk path from each
    chunk's entry by binary composition of the jump tables (s-th lane =
    position after s steps), yielding all chain positions.

One final scatter marks the positions. Exactness: pure pointer-jumping
identities, pinned against the XLA path by tests on random parses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOGC = 7
_C = 128  # chunk size = lane width (the only fast-gather window on TPU)


def _kernel_a(rows_ref, nxt_ref, jt_ref, e128_ref, e1024_ref):
    # rows comes in as data (NOT via pl.program_id: under jax.vmap the batch
    # dim is prepended to the grid, which silently renumbers program ids).
    br = nxt_ref.shape[0]
    rows = rows_ref[:]
    base = rows * _C
    e = nxt_ref[:] - base  # chunk-local successor; >= 128 means "exits chunk"
    for k in range(_LOGC):
        jt_ref[k] = e  # f^(2^k) restricted to the chunk
        g = jnp.take_along_axis(e, jnp.clip(e, 0, _C - 1), axis=1)
        e = jnp.where(e < _C, g, e)
    eg = e + base  # E128: first chain position >= own chunk end (global)
    e128_ref[:] = eg
    # Compose to 1024-aligned windows: E_{2w}[p] = E_w[E_w[p]] when E_w[p] is
    # still inside p's 2w-window. The looked-up row is 1..(2w/128 - 1) rows
    # below — reachable with sublane rolls + lane gathers.
    for m in range(3):  # w = 128*2^m -> windows 256, 512, 1024
        win = 256 << m
        end = (base // win + 1) * win
        q = eg
        inside = q < end
        lane = jnp.clip(q, 0, 2**30) & (_C - 1)
        acc = q
        for d in range(1, (win >> _LOGC)):
            # roll by br-d == roll by -d (pltpu.roll wants shift >= 0)
            rolled = pltpu.roll(eg, shift=br - d, axis=0)
            cand = jnp.take_along_axis(rolled, lane, axis=1)
            hit = inside & ((q >> _LOGC) - rows == d)
            acc = jnp.where(hit, cand, acc)
        eg = acc
    e1024_ref[:] = eg


def _kernel_b(rows_ref, ent_ref, jt_ref, out_ref):
    """Materialize each chunk's chain positions AND convert them to a lane
    membership mask in-VMEM: the chain positions are strictly increasing in
    the step count s, so lane i's membership is a 7-level binary search over
    the sorted row — this kills the cap-sized XLA marking scatter (the
    single most expensive op of the old formulation)."""
    br = ent_ref.shape[0]
    rows = rows_ref[:]
    base = rows * _C
    s = jax.lax.broadcasted_iota(jnp.int32, (br, _C), 1)  # step count
    ent = ent_ref[:]  # (br, 1) global chunk entry or -1
    has = ent >= 0
    pos = jnp.broadcast_to(ent, (br, _C)) - base  # local start for every s
    for k in range(_LOGC):
        jk = jt_ref[k]
        g = jnp.take_along_axis(jk, jnp.clip(pos, 0, _C - 1), axis=1)
        jump = ((s >> k) & 1) == 1
        pos = jnp.where(jump & (pos >= 0) & (pos < _C), g, pos)
    on_path = has & (pos >= 0) & (pos < _C)
    # Sorted row of local chain positions (ascending; _C past the chain end).
    chain = jnp.where(on_path, pos, _C)
    # lo = #entries < lane  (binary search; chain has no duplicates).
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, _C), 1)
    lo = jnp.zeros((br, _C), jnp.int32)
    for k in range(_LOGC - 1, -1, -1):
        cand = lo + (1 << k)
        g = jnp.take_along_axis(chain, jnp.clip(cand - 1, 0, _C - 1), axis=1)
        lo = jnp.where(g < lane, cand, lo)
    hit = jnp.take_along_axis(chain, jnp.clip(lo, 0, _C - 1), axis=1)
    out_ref[:] = ((lo < _C) & (hit == lane)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap",))
def token_starts_chunked(length: jax.Array, n: jax.Array, *, cap: int):
    """bool[cap]: which text positions start a token of the chosen parse."""
    assert cap % 1024 == 0
    R = cap // _C
    br = min(512, R)
    assert R % br == 0
    idx = jnp.arange(cap, dtype=jnp.int32)
    nxt = jnp.where(idx < n, idx + jnp.maximum(length, 1), cap)
    nxt = jnp.clip(nxt, 0, cap).reshape(R, _C)

    rows2d = jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[:, None], (R, _C)
    ) + (nxt - nxt)
    jt, e128, e1024 = pl.pallas_call(
        _kernel_a,
        grid=(R // br,),
        out_shape=(
            jax.ShapeDtypeStruct((_LOGC, R, _C), jnp.int32),
            jax.ShapeDtypeStruct((R, _C), jnp.int32),
            jax.ShapeDtypeStruct((R, _C), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((br, _C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, _C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (_LOGC, br, _C), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((br, _C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, _C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(rows2d, nxt)

    # ---- sequential walk over 1024-windows (each visited at most once)
    NS = cap // 1024
    e1024_flat = e1024.reshape(-1)
    ent1024_0 = jnp.full(NS, -1, jnp.int32) + jnp.min(length) * 0  # varying

    def walk_body(s, carry):
        cur, ent = carry
        in_win = (cur >> 10) == s
        ent = ent.at[s].set(jnp.where(in_win, cur, ent[s]))
        step = jax.lax.dynamic_slice(
            e1024_flat, (jnp.clip(cur, 0, cap - 1),), (1,)
        )[0]
        cur = jnp.where(in_win, step, cur)
        return cur, ent

    cur0 = jnp.where(n > 0, 0, cap) + jnp.min(length) * 0
    _, ent1024 = jax.lax.fori_loop(0, NS, walk_body, (cur0, ent1024_0))

    # ---- expand window entries to per-128-chunk entries (<= 8 steps each)
    e128_flat = e128.reshape(-1)
    win_end = (jnp.arange(NS, dtype=jnp.int32) + 1) * 1024
    ent128 = jnp.full(R, -1, jnp.int32) + jnp.min(length) * 0
    e = ent1024
    for _ in range(8):
        ok = (e >= 0) & (e < win_end)
        ent128 = ent128.at[jnp.where(ok, e >> _LOGC, R)].set(
            jnp.where(ok, e, -1), mode="drop"
        )
        e = jnp.where(ok, e128_flat[jnp.clip(e, 0, cap - 1)], e)

    # ---- materialize every in-chunk path; the kernel emits the membership
    # mask directly (no cap-sized scatter).
    mask = pl.pallas_call(
        _kernel_b,
        grid=(R // br,),
        out_shape=jax.ShapeDtypeStruct((R, _C), jnp.int32),
        in_specs=[
            pl.BlockSpec((br, _C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_LOGC, br, _C), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (br, _C), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(rows2d, ent128.reshape(R, 1), jt)

    return (mask.reshape(cap) > 0) & (idx < n)
