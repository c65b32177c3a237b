"""TPU-native suffix array construction: prefix doubling on jax.lax.sort.

Replaces the reference's libsais SA-IS (salz.c:463-469). The suffix array of a
text is unique, so this reproduces the reference SA exactly by correctness
alone. In addition to the SA we keep the per-round rank checkpoints, which give
O(log n) arbitrary-pair LCP queries downstream (salz_tpu/ops/lcp.py) — the
TPU-parallel replacement for the reference's sequential seeded LCP scan
(salz.c:492-514).

Shapes are static: the text lives in a fixed buffer of size `cap`, the valid
length `n` is dynamic. Padded positions get distinct sentinel keys larger than
any byte so they (a) sort after every real suffix and (b) never block the
all-ranks-distinct early exit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def num_levels(cap: int) -> int:
    """Number of doubling levels for a text buffer of size cap (>= 1)."""
    return max(1, (cap - 1).bit_length()) + 1


@functools.partial(jax.jit, static_argnames=("cap",))
def suffix_array_with_ranks(text: jax.Array, n: jax.Array, *, cap: int):
    """Build SA and rank checkpoints for text[:n] (text is uint8[cap]).

    Returns:
      sa:   int32[cap] — sa[:n] is the suffix array of text[:n]; the padded
            tail holds the sentinel suffixes in index order.
      ckpt: int32[L, cap] — ckpt[l][i] is an equality-preserving rank of the
            substring text[i : i+2^l] (truncated at n). Levels that were not
            reached (all ranks already distinct) hold all-distinct values, so
            equality tests at those levels are vacuously false — exactly what
            the LCP descent needs.
      n_levels: int32 — number of levels actually filled (informational).
    """
    L = num_levels(cap)
    idx = jnp.arange(cap, dtype=jnp.int32)
    in_text = idx < n
    # Distinct sentinel keys beyond any byte value keep padded positions inert.
    rank0 = jnp.where(in_text, text.astype(jnp.int32), 257 + idx)

    ckpt0 = jnp.broadcast_to(idx, (L, cap))
    ckpt0 = ckpt0.at[0].set(rank0)

    def all_distinct(rank):
        return jnp.max(rank) == cap - 1

    def round_body(state):
        rank, ckpt, level, _ = state
        h = jnp.int32(1) << (level - 1)  # current block half-length 2^(l-1)
        # rank2[i] = rank[i + h] (or -1 past the text) — a contiguous shifted
        # slice, NOT a gather: the index is iota + a dynamic scalar.
        rank_padded = jnp.concatenate([rank, jnp.full(cap, -1, jnp.int32)])
        rank2 = jax.lax.dynamic_slice(rank_padded, (h,), (cap,))
        rank2 = jnp.where(idx + h < n, rank2, jnp.int32(-1))
        # Sort (rank, rank2, index); ranks are dense so pairs identify blocks.
        k1, k2, perm = jax.lax.sort((rank, rank2, idx), num_keys=2)
        changed = jnp.concatenate(
            [
                jnp.zeros((1,), jnp.int32),
                ((k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])).astype(jnp.int32),
            ]
        )
        new_rank_sorted = jnp.cumsum(changed, dtype=jnp.int32)
        # Invert the permutation with a sort (cheaper than a 1-D scatter on
        # TPU): sorting (perm, new_rank_sorted) by perm lands every new rank
        # at its text position.
        _, new_rank = jax.lax.sort((perm, new_rank_sorted), num_keys=1)
        ckpt = ckpt.at[level].set(new_rank)
        return new_rank, ckpt, level + 1, all_distinct(new_rank)

    def cond(state):
        _, _, level, done = state
        return (~done) & (level < L)

    rank, ckpt, level, _ = jax.lax.while_loop(
        cond, round_body, (rank0, ckpt0, jnp.int32(1), all_distinct(rank0))
    )
    # rank is now a permutation of [0, cap); invert (via sort — cheaper than
    # a 1-D scatter on TPU) to get the suffix array.
    _, sa = jax.lax.sort((rank, idx), num_keys=1)
    return sa, ckpt, level


def suffix_array(text: jax.Array, n: jax.Array, *, cap: int) -> jax.Array:
    """Suffix array only (int32[cap]; valid prefix of length n)."""
    return suffix_array_with_ranks(text, n, cap=cap)[0]
