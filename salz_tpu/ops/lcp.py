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


@functools.partial(jax.jit, static_argnames=("cap",))
def candidate_lcps(
    ckpt: jax.Array,
    n_levels: jax.Array,
    n: jax.Array,
    sa: jax.Array,
    lslot: jax.Array,
    rslot: jax.Array,
    rank: jax.Array,
    *,
    cap: int,
):
    """PSV/NSV candidate match lengths via adjacent-LCP + RMQ (text order).

    TPU-optimized replacement for two full `pair_lcp` descents: the LCP of a
    suffix with its PSV/NSV candidate equals the range-min of the
    lexicographically-adjacent LCP array between their SA slots (the classic
    LCP-interval identity), so only ONE descent (for adjacent pairs, with a
    DYNAMIC level count — ranks at the last filled doubling level are all
    distinct, bounding every LCP by 2^(n_levels-1)) plus an RMQ sparse table
    built from shifted slices (no gathers) and one fused 4-way query gather
    are needed.

    Args:
      ckpt: int32[L, cap] rank checkpoints (suffix_array_with_ranks output).
      n_levels: dynamic number of filled checkpoint levels.
      sa: int32[cap] suffix array (slot order).
      lslot, rslot: int32[cap] PSV/NSV SA-slot indices in TEXT order (-1 =
        absent), from psv_nsv_full.
      rank: int32[cap] SA slot of each text position (text order).
    Returns:
      (psv_len, nsv_len): int32[cap] in text order; 0 where absent. Entries at
      text positions >= n are undefined.
    """
    idx = jnp.arange(cap, dtype=jnp.int32)
    flat_ckpt = ckpt.reshape(-1)

    # ---- adjacent-LCP descent: lcp_adj[k] = LCP(sa[k-1], sa[k]), k in [1, n)
    a_base = jnp.concatenate([jnp.zeros((1,), jnp.int32), sa[:-1]])
    b_base = sa
    valid_k = (idx >= 1) & (idx < n)
    n_desc = jnp.maximum(n_levels - 1, 0)

    def body(t, l):
        lev = n_desc - 1 - t
        h = jnp.int32(1) << lev
        a = a_base + l
        b = b_base + l
        fits = valid_k & (a + h <= n) & (b + h <= n)
        q = jnp.concatenate(
            [
                lev * cap + jnp.clip(a, 0, cap - 1),
                lev * cap + jnp.clip(b, 0, cap - 1),
            ]
        )
        g = flat_ckpt[q]
        return jnp.where(fits & (g[:cap] == g[cap:]), l + h, l)

    # sa - sa: zero-cost way to give the init carry the varying manual axes
    # of the body output under shard_map.
    lcp_adj = jax.lax.fori_loop(0, n_desc, body, sa - sa)
    lcp_adj = jnp.where(valid_k, lcp_adj, 0)

    # ---- RMQ sparse table over lcp_adj (shift+min only; stacked for the
    # per-query dynamic level gather).
    LR = max(1, (cap - 1).bit_length())
    tables = [lcp_adj]
    t = lcp_adj
    big = jnp.int32(2**30)
    for l in range(1, LR + 1):
        h = 1 << (l - 1)
        shifted = jnp.concatenate([t[h:], jnp.full((h,), big, jnp.int32)])
        t = jnp.minimum(t, shifted)
        tables.append(t)
    rmq = jnp.stack(tables).reshape(-1)

    # ---- queries (text order): psv range (lslot, rank] -> lcp_adj[lslot+1..
    # rank]; nsv range (rank, rslot] -> lcp_adj[rank+1..rslot].
    def range_min(lo_excl, hi_incl, present):
        lo = lo_excl + 1
        d = jnp.maximum(hi_incl - lo_excl, 1)  # range length
        j = 31 - jax.lax.clz(d)
        q = jnp.concatenate(
            [
                j * cap + jnp.clip(lo, 0, cap - 1),
                j * cap + jnp.clip(hi_incl - (1 << j) + 1, 0, cap - 1),
            ]
        )
        g = rmq[q]
        return jnp.where(present, jnp.minimum(g[:cap], g[cap:]), 0)

    psv_len = range_min(lslot, rank, lslot >= 0)
    nsv_len = range_min(rank, rslot, rslot >= 0)
    return psv_len, nsv_len
