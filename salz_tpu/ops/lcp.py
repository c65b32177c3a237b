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
def candidate_lcps_batch(
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
    """PSV/NSV candidate match lengths via adjacent-LCP + RMQ, batched.

    TPU-optimized replacement for two full `pair_lcp` descents: the LCP of a
    suffix with its PSV/NSV candidate equals the range-min of the
    lexicographically-adjacent LCP array between their SA slots (the classic
    LCP-interval identity), so only ONE descent (for adjacent pairs) plus an
    RMQ sparse table built from shifted slices (no gathers) and one fused
    query gather per side are needed.

    The adjacent-pair descent is further split into a CAPPED descent (levels
    <= 6, giving min(lcp, 127) for everyone) plus an exact descent for the
    few saturated pairs, compacted into a cap/32 bucket — most adjacent LCPs
    are short, so the expensive high-level full-size gathers would be wasted.
    A batch-level lax.cond falls back to the full-size descent if any block's
    bucket overflows (highly repetitive data) — exactness always.

    Batch-native: (B, ...) arrays, flat 1-D gathers with per-block offsets
    (vmapped gathers and vmapped cond are far slower on TPU).

    Args:
      ckpt: int32[B, L, cap] rank checkpoints (per block).
      n_levels: int32[B] filled checkpoint levels per block.
      n: int32[B] valid lengths.
      sa: int32[B, cap] suffix arrays (slot order).
      lslot, rslot, rank: int32[B, cap] from psv_nsv_full_batch (text order).
    Returns:
      (psv_len, nsv_len): int32[B, cap] in text order; 0 where absent.
      Entries at text positions >= n are undefined.
    """
    B = sa.shape[0]
    L = int(ckpt.shape[1])
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    nb = n[:, None]
    vrow = (jnp.arange(B, dtype=jnp.int32) * cap)[:, None]

    # ---- adjacent-LCP descent: lcp_adj[k] = LCP(sa[k-1], sa[k]), k in [1, n)
    a_base = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), sa[:, :-1]], axis=1)
    b_base = sa
    valid_k = (idx >= 1) & (idx < nb)
    n_desc = jnp.maximum(n_levels - 1, 0)[:, None]  # (B, 1)
    p1 = jnp.minimum(n_desc, 7)

    def descend(a_b, b_b, vmask, start, top: int, bottom: int = 0):
        """Descent with a STATIC unrolled level schedule (top-1 .. bottom) and
        a per-block active mask (lev < start). Gathering from the per-level
        (B, cap) slice keeps the operand under TPU's ~128MB gather-throughput
        cliff — the stacked (B, L, cap) table is ~1.6x slower per element."""
        m = a_b.shape[1]
        l = a_b - a_b
        for lev in range(top - 1, bottom - 1, -1):
            tab = ckpt[:, lev, :].reshape(-1)
            h = jnp.int32(1 << lev)
            a = a_b + l
            b = b_b + l
            fits = vmask & (lev < start) & (a + h <= nb) & (b + h <= nb)
            q = jnp.concatenate(
                [
                    vrow + jnp.clip(a, 0, cap - 1),
                    vrow + jnp.clip(b, 0, cap - 1),
                ],
                axis=1,
            )
            g = tab[q]
            l = jnp.where(fits & (g[:, :m] == g[:, m:]), l + h, l)
        return l

    # Capped descent, levels 6..3 only: the final 8 bytes are resolved by a
    # DIRECT text comparison (two big-endian u32 word probes per side from
    # small (B, cap) operands) — ground truth, so it needs no rank levels and
    # costs 4 probe-sets instead of the 6 that levels 2..0 would. The text
    # bytes come from checkpoint level 0 (= byte value for i < n).
    byte = jnp.where(idx < nb, ckpt[:, 0, :], 0) & 0xFF

    def _sh(k):
        return jnp.concatenate(
            [byte[:, k:], jnp.zeros((B, k), jnp.int32)], axis=1
        )

    t32a = (byte << 24) | (_sh(1) << 16) | (_sh(2) << 8) | _sh(3)
    t32b = (_sh(4) << 24) | (_sh(5) << 16) | (_sh(6) << 8) | _sh(7)

    def tail8(a_b, b_b, l, vmask):
        a = a_b + l
        b = b_b + l
        qa = jnp.concatenate(
            [vrow + jnp.clip(a, 0, cap - 1), vrow + jnp.clip(b, 0, cap - 1)],
            axis=1,
        )
        m = a_b.shape[1]
        ga = t32a.reshape(-1)[qa]
        gb = t32b.reshape(-1)[qa]
        xa = ga[:, :m] ^ ga[:, m:]
        xb = gb[:, :m] ^ gb[:, m:]
        ma = jax.lax.clz(xa) >> 3  # 4 when equal (clz(0) = 32)
        mb = jnp.minimum(jax.lax.clz(xb) >> 3, 4)
        match = ma + jnp.where(ma == 4, mb, 0)
        limit = nb - jnp.maximum(a, b)
        return jnp.where(
            vmask, jnp.clip(jnp.minimum(match, limit), 0, 8), 0
        )

    l_hi = descend(a_base, b_base, valid_k, p1, 7, bottom=3)
    lcp_capped = jnp.where(
        valid_k, l_hi + tail8(a_base, b_base, l_hi, valid_k), 0
    )

    saturated = valid_k & (lcp_capped == 128) & (n_desc > 7)
    count = jnp.sum(saturated.astype(jnp.int32), axis=1)  # (B,)
    M2 = max(cap // 32, 1024)
    key = jnp.where(saturated, 0, 1).astype(jnp.int32)
    slot_iota = jnp.broadcast_to(idx, (B, cap)) + (sa - sa)
    _, qk_all = jax.lax.sort((key, slot_iota), num_keys=1, dimension=1)

    def gat2(arr, q):
        return arr.reshape(-1)[vrow + q]

    def bucket_path(_):
        qk = jnp.clip(qk_all[:, :M2], 0, cap - 1)
        validb = jnp.arange(M2, dtype=jnp.int32)[None, :] < count[:, None]
        l2 = descend(gat2(a_base, qk), gat2(b_base, qk), validb, n_desc, L)
        flat_idx = jnp.where(validb, vrow + qk, B * cap)
        return (
            lcp_capped.reshape(-1)
            .at[flat_idx.reshape(-1)]
            .set(l2.reshape(-1), mode="drop")
            .reshape(B, cap)
        )

    def full_path(_):
        l2 = descend(a_base, b_base, valid_k, n_desc, L)
        return jnp.where(valid_k, l2, 0)

    lcp_adj = jax.lax.cond(jnp.max(count) <= M2, bucket_path, full_path, 0)

    # ---- RMQ sparse table over lcp_adj (shift+min only; stacked for the
    # per-query dynamic level gather — a masked "fast path" from a smaller
    # operand does NOT pay off: masked gathers still cost full per-element
    # price, so the plain 2-probe from the stacked table is optimal here).
    LR = max(1, (cap - 1).bit_length())
    tables = [lcp_adj]
    t = lcp_adj
    big = jnp.int32(2**30)
    for l in range(1, LR + 1):
        h = 1 << (l - 1)
        shifted = jnp.concatenate(
            [t[:, h:], jnp.full((B, h), big, jnp.int32)], axis=1
        )
        t = jnp.minimum(t, shifted)
        tables.append(t)
    rmq = jnp.stack(tables, axis=1).reshape(-1)
    rrow = (jnp.arange(B, dtype=jnp.int32) * (LR + 1) * cap)[:, None]

    # ---- queries (text order): psv range (lslot, rank] -> lcp_adj[lslot+1..
    # rank]; nsv range (rank, rslot] -> lcp_adj[rank+1..rslot].
    def range_min(lo_excl, hi_incl, present):
        lo = lo_excl + 1
        d = jnp.maximum(hi_incl - lo_excl, 1)  # range length
        j = 31 - jax.lax.clz(d)
        q = jnp.concatenate(
            [
                rrow + j * cap + jnp.clip(lo, 0, cap - 1),
                rrow + j * cap + jnp.clip(hi_incl - (1 << j) + 1, 0, cap - 1),
            ],
            axis=1,
        )
        g = rmq[q]
        return jnp.where(present, jnp.minimum(g[:, :cap], g[:, cap:]), 0)

    psv_len = range_min(lslot, rank, lslot >= 0)
    nsv_len = range_min(rank, rslot, rslot >= 0)
    return psv_len, nsv_len


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
    """Single-block wrapper over candidate_lcps_batch."""
    pl_, nl_ = candidate_lcps_batch(
        ckpt[None],
        jnp.asarray(n_levels)[None],
        jnp.asarray(n)[None],
        sa[None],
        lslot[None],
        rslot[None],
        rank[None],
        cap=cap,
    )
    return pl_[0], nl_[0]
