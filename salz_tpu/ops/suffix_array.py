"""TPU-native suffix array construction: prefix doubling on jax.lax.sort.

Replaces the reference's libsais SA-IS (salz.c:463-469). The suffix array of a
text is unique, so this reproduces the reference SA exactly by correctness
alone. In addition to the SA we keep the per-round rank checkpoints, which give
O(log n) arbitrary-pair LCP queries downstream (salz_tpu/ops/lcp.py) — the
TPU-parallel replacement for the reference's sequential seeded LCP scan
(salz.c:492-514).

Two TPU-cost-model tricks (PERFORMANCE.md):

* The first THREE doubling rounds are fused into one 2-key sort over packed
  9-bit byte symbols (4 bytes per position), saving two sort+invert rounds.
* The final rank->SA inversion sort carries the packed 8/16-byte text
  prefixes of every suffix as payloads, so downstream adjacent-suffix
  comparisons (the LCP stage) get the first 16 bytes of both suffixes from
  SHIFTED SLICES instead of random gathers.

Shapes are static: the text lives in a fixed buffer of size `cap`, the valid
length `n` is dynamic. Padded positions get distinct sentinel keys larger than
any real key so they (a) sort after every real suffix and (b) never block the
all-ranks-distinct early exit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def num_levels(cap: int) -> int:
    """Number of doubling levels for a text buffer of size cap (>= 1)."""
    return max(1, (cap - 1).bit_length()) + 1


def ckpt_rows(cap: int) -> int:
    """Rows of the stored checkpoint stack: levels 4..L-1 only (row r =
    level r+4). Levels 0-3 are never probed — the LCP descent stops at
    level 4 and finishes with a 16-byte text probe (ops/lcp.py) — so not
    storing them saves 4*cap*4 bytes per block lane (16 B/input byte),
    which is what makes level 8-9 blocks fit on one chip (VERDICT.md §2)."""
    return max(num_levels(cap) - 4, 1)


def packed_prefixes(text: jax.Array, n: jax.Array, *, cap: int):
    """Big-endian packed 4-byte windows of text[:n], zero past n.

    Returns a list of 8 int32[cap] arrays; the w-th has bytes i+4w .. i+4w+3
    at index i (the first 32 bytes of every suffix). The first four are the
    LCP tail-probe tables (FORMAT.md §1.7).
    """
    idx = jnp.arange(cap, dtype=jnp.int32)
    byte = jnp.where(idx < n, text.astype(jnp.int32), 0)

    def _sh(k):
        return jnp.concatenate([byte[k:], jnp.zeros(k, jnp.int32)])

    def _pack(k):
        return (_sh(k) << 24) | (_sh(k + 1) << 16) | (_sh(k + 2) << 8) | _sh(k + 3)

    return [_pack(4 * w) for w in range(8)]


@functools.partial(jax.jit, static_argnames=("cap",))
def suffix_array_prefixes(text: jax.Array, n: jax.Array, *, cap: int):
    """Build SA, rank checkpoints, and slot-order prefixes for text[:n].

    Returns:
      sa:   int32[cap] — sa[:n] is the suffix array of text[:n]; the padded
            tail holds the sentinel suffixes in index order.
      ckpt: int32[ckpt_rows(cap), cap] — ckpt[r][i] is an equality-preserving
            rank of the substring text[i : i+2^(r+4)] (truncated at n).
            Levels 0-3 are NOT stored (the LCP descent never probes below
            level 4; the sub-16-byte remainder is resolved by text probes).
            Levels that were not reached (all ranks already distinct) hold
            all-distinct values, so equality tests there are vacuously false —
            exactly what the LCP descent needs.
      n_levels: int32 — number of levels actually filled (informational).
      t32:  int32[4, cap] — text-order packed bytes i..i+3 / .. / i+12..i+15
            (the LCP tail-probe tables).
      p32:  int32[8, cap] — SLOT-order packed prefixes: p32[j][k] = bytes
            sa[k]+4j .. sa[k]+4j+3 — the first 32 bytes of every suffix in
            suffix-array order, for gather-free adjacent comparisons.
    """
    L = num_levels(cap)
    idx = jnp.arange(cap, dtype=jnp.int32)
    in_text = idx < n
    byte = jnp.where(in_text, text.astype(jnp.int32), 0)
    packs = packed_prefixes(text, n, cap=cap)

    # ---- fused initial rounds: 16-byte ranks (= level 4, ckpt row 0) from
    # ONE 6-key sort of 3-symbol-packed keys (27 bits each; symbol 16 alone
    # in the last key). 9-bit symbols (byte+1 in text, 0 past n) make a
    # shorter suffix sort strictly before any extension — the truncation
    # rule of the SA. This replaces the old 8-byte initial PLUS the first
    # doubling round (a 3-op sort + a 2-op inversion sort) with two extra
    # key operands in one sort.
    def _sym(k):
        if k >= cap:  # static shape guard for tiny test caps
            return jnp.zeros(cap, jnp.int32)
        s = jnp.concatenate([byte[k:], jnp.zeros(k, jnp.int32)]) + 1
        return jnp.where(idx + k < n, s, 0)

    def _pack3(k):
        return (_sym(k) << 18) | (_sym(k + 1) << 9) | _sym(k + 2)

    keyA = jnp.where(in_text, _pack3(0), (1 << 27) + idx)  # sentinels last
    keys_rest = [jnp.where(in_text, _pack3(k), 0) for k in (3, 6, 9, 12)]
    keyF = jnp.where(in_text, _sym(15), 0)
    sorted16 = jax.lax.sort(
        (keyA, *keys_rest, keyF, idx), num_keys=6
    )
    perm = sorted16[-1]
    changed = jnp.zeros((1,), jnp.int32)
    diff = jnp.zeros(cap - 1, jnp.bool_)
    for kk in sorted16[:-1]:
        diff = diff | (kk[1:] != kk[:-1])
    changed = jnp.concatenate([changed, diff.astype(jnp.int32)])
    rank16_sorted = jnp.cumsum(changed, dtype=jnp.int32)
    _, rank16 = jax.lax.sort((perm, rank16_sorted), num_keys=1)

    ckpt0 = jnp.broadcast_to(idx, (ckpt_rows(cap), cap))
    ckpt0 = ckpt0.at[0].set(rank16)  # row 0 = level 4 = 16-byte ranks

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
        ckpt = ckpt.at[level - 4].set(new_rank)
        return new_rank, ckpt, level + 1, all_distinct(new_rank)

    def cond(state):
        _, _, level, done = state
        return (~done) & (level < L)

    rank, ckpt, level, _ = jax.lax.while_loop(
        cond, round_body, (rank16, ckpt0, jnp.int32(5), all_distinct(rank16))
    )
    # rank is now a permutation of [0, cap); invert via sort, carrying the
    # packed 32-byte prefixes into slot order as payloads (sort payloads are
    # far cheaper than the equivalent post-hoc gathers).
    sorted_out = jax.lax.sort((rank, idx, *packs), num_keys=1)
    sa = sorted_out[1]
    t32 = jnp.stack(packs[:4])
    p32 = jnp.stack(sorted_out[2:])
    return sa, ckpt, level, t32, p32


@functools.partial(jax.jit, static_argnames=("cap",))
def suffix_array_with_ranks(text: jax.Array, n: jax.Array, *, cap: int):
    """(sa, ckpt, n_levels) — see suffix_array_prefixes."""
    sa, ckpt, n_levels, _, _ = suffix_array_prefixes(text, n, cap=cap)
    return sa, ckpt, n_levels


def suffix_array(text: jax.Array, n: jax.Array, *, cap: int) -> jax.Array:
    """Suffix array only (int32[cap]; valid prefix of length n)."""
    return suffix_array_with_ranks(text, n, cap=cap)[0]
