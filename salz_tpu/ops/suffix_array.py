"""TPU-native suffix array construction: prefix doubling on jax.lax.sort.

Replaces the reference's libsais SA-IS (salz.c:463-469). The suffix array of a
text is unique, so this reproduces the reference SA exactly by correctness
alone. In addition to the SA we keep the per-round rank checkpoints, which give
O(log n) arbitrary-pair LCP queries downstream (salz_tpu/ops/lcp.py) — the
TPU-parallel replacement for the reference's sequential seeded LCP scan
(salz.c:492-514).

TPU-cost-model tricks (PERFORMANCE.md):

* The first FOUR doubling levels are fused into one 6-key sort over packed
  9-bit byte symbols (16 bytes per position), saving three sort+invert rounds.
* RADIX-4 rounds: each subsequent round sorts FOUR rank keys (r@i, r@i+m,
  r@i+2m, r@i+3m), quadrupling the resolved prefix per round. Measured on
  v5e, a 4-key sort costs only ~1.35x a 2-key sort, so two doubling levels
  per round cut the full-width phase ~40% — decisive on long-repeat corpora
  where the active set stays large through level 15+ (license text measured
  30-80% active at level 15; see BIGCAP_TPU.md).
* Ranks are HEAD-INDEX ranks (the rank of a suffix is the SA slot of the
  first member of its equal-prefix group), not dense ranks. Equality is all
  the LCP descent needs, and head-index ranks make rounds IDEMPOTENT
  for already-resolved suffixes — which enables the active-set phase below.
* Two-phase processing: rounds run at full width only while the active set
  (suffixes in non-singleton rank groups) is large. Once it fits a static
  cap/8 rung, rounds sort only the compacted active set — two narrow sorts
  + three narrow gathers + one narrow scatter instead of two full sorts.
* The final rank->SA inversion sort carries the packed 8/16-byte text
  prefixes of every suffix as payloads, so downstream adjacent-suffix
  comparisons (the LCP stage) get the first 16 bytes of both suffixes from
  SHIFTED SLICES instead of random gathers.

Shapes are static: the text lives in a fixed buffer of size `cap`, the valid
length `n` is dynamic. Padded positions get distinct sentinel keys larger than
any real key so they (a) sort after every real suffix and (b) never block the
all-resolved early exit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.int32(1 << 26)  # np, not jnp: device-array consts cost ~24 s/lowering via axon  # sorts-last flag; ranks/positions < 2^24 <= cap


def ckpt_rows(cap: int) -> int:
    """Rows of the stored checkpoint ladder: row r holds head-index ranks of
    the prefix of length 16 * 4^r (= 2^(2r+4)); the top row's prefix covers
    >= cap, so its ranks are all-distinct whenever it was filled. Radix-4
    rows (even levels only) halve checkpoint memory vs one row per doubling
    level (16 B/input-byte at 1 MiB blocks) — the LCP descent compensates
    with up to THREE probes per row (ops/lcp.py ladder descent); sub-16
    remainders finish with a 16-byte text probe, so levels 0-3 are never
    stored."""
    bl = max((cap - 1).bit_length(), 4)
    return (bl - 4 + 1) // 2 + 1


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


def _packed_prefixes_batch(blocks: jax.Array, ns: jax.Array, *, cap: int):
    """Batch packed_prefixes: list of 8 int32[B, cap] arrays."""
    B = blocks.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    byte = jnp.where(idx < ns[:, None], blocks.astype(jnp.int32), 0)
    zeros = jnp.zeros((B, 32), jnp.int32)
    wide = jnp.concatenate([byte, zeros], axis=1)

    def _sh(k):
        return wide[:, k : k + cap]

    def _pack(k):
        return (_sh(k) << 24) | (_sh(k + 1) << 16) | (_sh(k + 2) << 8) | _sh(k + 3)

    return [_pack(4 * w) for w in range(8)]


def _pack_keys(ks, widths):
    """Pack non-negative fields (ks[i] < 2^widths[i]) into 30-bit words.

    The fields are concatenated MSB-first into one bitstring and split into
    30-bit chunks (int32-safe), so lexicographic order on the word tuple
    equals lexicographic order on the field tuple. Sort cost scales ~1 ns/
    elem per operand array, so fewer, denser keys are a direct win (a
    radix-4 round's 4 rank keys fit 3 words for caps <= 2 MiB; the initial
    16-byte sort's 6 symbol keys fit 5)."""
    total = sum(widths)
    nw = (total + 29) // 30
    offs = []
    o = 0
    for w in widths:
        offs.append(o)
        o += w
    out = []
    for w in range(nw):
        lo = 30 * w
        hi = lo + 30
        acc = None
        for i, k in enumerate(ks):
            s, e = offs[i], offs[i] + widths[i]
            ov_lo, ov_hi = max(lo, s), min(hi, e)
            if ov_lo >= ov_hi:
                continue
            field = (k >> (e - ov_hi)) & ((1 << (ov_hi - ov_lo)) - 1)
            piece = field << (hi - ov_hi)
            acc = piece if acc is None else acc | piece
        out.append(acc if acc is not None else jnp.zeros_like(ks[0]))
    return out


def _heads_to_rank(head: jax.Array) -> jax.Array:
    """Head-index rank per sorted slot: the slot of its run's first member."""
    B, cap = head.shape
    p = jnp.broadcast_to(jnp.arange(cap, dtype=jnp.int32)[None, :], (B, cap))
    return jax.lax.cummax(jnp.where(head, p, jnp.int32(-1)), axis=1)


@functools.partial(jax.jit, static_argnames=("cap",))
def suffix_array_prefixes_batch(blocks: jax.Array, ns: jax.Array, *, cap: int):
    """Build SA, rank checkpoints, and slot-order prefixes per block.

    Args:
      blocks: uint8[B, cap]; ns: int32[B] valid lengths.
    Returns:
      sa:   int32[B, cap] — sa[b, :ns[b]] is the suffix array of block b; the
            padded tail holds the sentinel suffixes in index order.
      ckpt: int32[B, ckpt_rows(cap), cap] — ckpt[b, r] is an
            equality-preserving rank of text[i : i+16*4^r] (truncated at n).
            Ranks are HEAD-INDEX ranks; only equality is meaningful.
            Rows that were not reached hold all-distinct values, so
            equality tests there are vacuously false.
      n_rows: int32[B] — ladder rows filled per block (informational; the
            LCP descent tops out at max(n_rows) - 1).
      t32:  int32[B, 4, cap] — text-order packed bytes i..i+3 / .. / +12..+15.
      p32:  int32[B, 8, cap] — SLOT-order packed prefixes: p32[b, j, k] =
            bytes sa[k]+4j .. sa[k]+4j+3.
    """
    B = blocks.shape[0]
    # Phase-2 flat keys are bq*cap + rank and must sort below the BIGG
    # (1<<29) dead-lane sentinel; a larger batch*cap would corrupt the SA
    # silently (ADVICE r4).
    if B * cap >= (1 << 29):
        raise ValueError(
            f"batch*cap = {B * cap} >= 2^29: flat phase-2 sort keys would "
            "collide with the dead-lane sentinel; use a smaller batch"
        )
    R = ckpt_rows(cap)
    idx1 = jnp.arange(cap, dtype=jnp.int32)
    idx = jnp.broadcast_to(idx1[None, :], (B, cap))
    nb = ns[:, None]
    in_text = idx < nb
    byte = jnp.where(in_text, blocks.astype(jnp.int32), 0)
    packs = _packed_prefixes_batch(blocks, ns, cap=cap)

    # ---- fused initial rounds: 16-byte ranks (= level 4, ckpt row 0) from
    # ONE 6-key sort of 3-symbol-packed keys (27 bits each; symbol 16 alone
    # in the last key). 9-bit symbols (byte+1 in text, 0 past n) make a
    # shorter suffix sort strictly before any extension — the truncation
    # rule of the SA.
    wide = jnp.concatenate([byte, jnp.zeros((B, 16), jnp.int32)], axis=1)

    def _sym(k):
        s = wide[:, k : k + cap] + 1
        return jnp.where(idx + k < nb, s, 0)

    def _pack3(k):
        return (_sym(k) << 18) | (_sym(k + 1) << 9) | _sym(k + 2)

    keyA = jnp.where(in_text, _pack3(0), (1 << 27) + idx)  # sentinels last
    keys_rest = [jnp.where(in_text, _pack3(k), 0) for k in (3, 6, 9, 12)]
    keyF = jnp.where(in_text, _sym(15), 0)
    # 145 key bits packed into five 30-bit words (one array fewer to sort).
    packed16 = _pack_keys(
        [keyA, *keys_rest, keyF], [28, 27, 27, 27, 27, 9]
    )
    sorted16 = jax.lax.sort(
        (*packed16, idx), num_keys=len(packed16), dimension=1
    )
    perm16 = sorted16[-1]
    eq = jnp.ones((B, cap - 1), jnp.bool_)
    for kk in sorted16[:-1]:
        eq = eq & (kk[:, 1:] == kk[:, :-1])
    head_s = jnp.concatenate([jnp.ones((B, 1), jnp.bool_), ~eq], axis=1)
    rank_s = _heads_to_rank(head_s)
    # active = member of a non-singleton 16-byte group (run length > 1)
    nxt_head = jnp.concatenate([head_s[:, 1:], jnp.ones((B, 1), jnp.bool_)], 1)
    act16_s = ~(head_s & nxt_head)  # SA order; the invert carries no flag
    _, rank16 = jax.lax.sort((perm16, rank_s), num_keys=1, dimension=1)

    ckpt0 = jnp.broadcast_to(idx1[None, None, :], (B, R, cap))
    ckpt0 = jax.lax.dynamic_update_slice(
        ckpt0, rank16[:, None, :], (0, 0, 0)
    )  # row 0 = 16-byte ranks

    mrow0 = jnp.sum(act16_s.astype(jnp.int32), axis=1)
    rows0 = jnp.where(mrow0 == 0, jnp.int32(1), jnp.int32(0))

    # Compacted-phase pool rungs: ONE cross-block pool sized by the BATCH
    # total, chain-narrowing by 4x (a per-block cap/8 rung paid B*cap/8
    # sort+gather lanes per round no matter the data; measured ELF-binary
    # blocks enter phase 2 at ~6.3% active and are ~1% two rounds later).
    MGs = []
    g = max(B * cap // 8, 1024)
    while g < B * cap and g >= 1024 and len(MGs) < 4:
        MGs.append(g)
        g //= 4
    # phase 1 runs down to the first rung, or (tiny pools) to completion
    thresh = MGs[0] if MGs else 0

    def _shifted_rank(rank, h):
        """rank[i + h] in text order (-1 past n), h dynamic up to 3*cap."""
        wide_r = jnp.concatenate([rank, jnp.full((B, cap), -1, jnp.int32)], 1)
        r2 = jax.lax.dynamic_slice(
            wide_r, (0, jnp.minimum(h, jnp.int32(cap))), (B, cap)
        )
        return jnp.where(idx + h < nb, r2, jnp.int32(-1))

    # ------- phase 1: full-width radix-4 rounds while max active > M -------
    # Round rd (rd >= 1) starts from ranks of prefix m = 4^rd * 4 = 2^(2rd+2)
    # and sorts (r@i, r@i+m, r@i+2m, r@i+3m): lexicographic comparison of
    # head-index ranks of the m-prefixes IS comparison of the 4m-prefix
    # (with -1 sentinels ordering truncated suffixes first). Result: ckpt
    # row rd = ranks of prefix 4m.
    KB = cap.bit_length()  # rank+1 in [0, cap]; 2^bit_length(cap) > cap

    def full_body(state):
        rank, ckpt, act_s, perm_s, mrow, rows_out, rd = state
        m = jnp.int32(1) << (2 * rd + 2)
        r2 = _shifted_rank(rank, m)
        r3 = _shifted_rank(rank, 2 * m)
        r4 = _shifted_rank(rank, 3 * m)
        if 4 * KB <= 90:  # 4 rank keys fit 3 packed words (caps <= 2 MiB)
            keys = _pack_keys(
                [rank + 1, r2 + 1, r3 + 1, r4 + 1], [KB] * 4
            )
        else:
            keys = [rank, r2, r3, r4]
        *ks, perm = jax.lax.sort(
            (*keys, idx), num_keys=len(keys), dimension=1
        )
        diff = jnp.zeros((B, cap - 1), jnp.bool_)
        for kk in ks:
            diff = diff | (kk[:, 1:] != kk[:, :-1])
        head = jnp.concatenate([jnp.ones((B, 1), jnp.bool_), diff], axis=1)
        new_rank_s = _heads_to_rank(head)
        nxt = jnp.concatenate([head[:, 1:], jnp.ones((B, 1), jnp.bool_)], 1)
        act_srt = ~(head & nxt)
        # Invert the permutation with a sort (cheaper than a 1-D scatter on
        # TPU): sorting by perm lands every new rank at its text position.
        # The active flag stays in SA order (the count and the phase-2
        # extraction both work there) — one payload fewer per round.
        _, new_rank = jax.lax.sort((perm, new_rank_s), num_keys=1, dimension=1)
        ckpt = jax.lax.dynamic_update_slice(
            ckpt, new_rank[:, None, :], (0, rd, 0)
        )
        mrow_new = jnp.sum(act_srt.astype(jnp.int32), axis=1)
        rows_out = jnp.where((mrow > 0) & (mrow_new == 0), rd + 1, rows_out)
        return new_rank, ckpt, act_srt, perm, mrow_new, rows_out, rd + 1

    def full_cond(state):
        _, _, _, _, mrow, _, rd = state
        return (jnp.sum(mrow) > thresh) & (rd < R)

    rank, ckpt, act_s, perm_s, mrow, rows_out, rd = jax.lax.while_loop(
        full_cond, full_body,
        (rank16, ckpt0, act16_s, perm16, mrow0, rows0, jnp.int32(1)),
    )

    # ------------- phase 2: POOLED compacted rounds, chained rungs ----------
    # The active sets of ALL blocks are regathered into ONE cross-block pool
    # (cumsum offsets + searchsorted block ids — the ansv_tpu/lcp global-pool
    # pattern). Keys are FLAT (bq*cap + value) so blocks stay separated in
    # sorts, and the pool CHAIN-NARROWS: each rung's loop exits as soon as
    # the live total fits the 4x-smaller rung, whose while_loop then resumes
    # (a skipped rung's loop body never executes — zero cost). Head-index
    # ranks make rounds idempotent for resolved lanes, so no per-lane
    # masking beyond the live sentinel.
    if MGs:
        # Extract the active set from the SA-order flags: slots are rank
        # order, so compacting by slot keeps groups contiguous ascending.
        key = jnp.where(act_s, idx, idx | _BIG)
        _, apos0 = jax.lax.sort((key, perm_s), num_keys=1, dimension=1)
        off = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(mrow)]
        )
        tot0 = off[B]
        BIGG = jnp.int32(1 << 29)  # > any flat key bq*cap + v (< 2^28)
        apos0f = apos0.reshape(-1)
        rankf0 = rank.reshape(-1)

        MG0 = MGs[0]
        g0 = jnp.arange(MG0, dtype=jnp.int32)
        bq0 = jnp.clip(
            jnp.searchsorted(off[1:], g0, side="right").astype(jnp.int32),
            0, B - 1,
        )
        li0 = g0 - off[bq0]
        live0 = g0 < tot0
        p0_ = apos0f[bq0 * cap + jnp.clip(li0, 0, cap - 1)]
        fpos0 = jnp.where(live0, bq0 * cap + p0_, jnp.int32(B * cap))
        fra0 = jnp.where(
            live0,
            bq0 * cap + rankf0[jnp.clip(fpos0, 0, B * cap - 1)],
            BIGG,
        )

        nflat = ns  # (B,) valid lengths, indexed by derived block id

        def make_comp(MG: int, next_thresh: int):
            col = jnp.arange(MG, dtype=jnp.int32)[None, :]

            def comp_body(state):
                rank, ckpt, fpos, fra, mrow, rows_out, rd, tot = state
                m = jnp.int32(1) << (2 * rd + 2)
                rankf = rank.reshape(-1)
                live = fpos < B * cap
                bq = jnp.clip(fpos // cap, 0, B - 1)
                pos = fpos - bq * cap

                def rgat(h):
                    p2 = pos + h
                    ok = live & (p2 < nflat[bq])
                    r = rankf[jnp.clip(bq * cap + p2, 0, B * cap - 1)]
                    return jnp.where(ok, r, jnp.int32(-1))[None, :]

                r2 = rgat(m)
                r3 = rgat(2 * m)
                r4 = rgat(3 * m)
                key_in = jnp.where(live, fra, BIGG)[None, :]
                key_s, r2_s, r3_s, r4_s, fpos_s = jax.lax.sort(
                    (key_in, r2, r3, r4, fpos[None, :]),
                    num_keys=4, dimension=1,
                )
                one = jnp.ones((1, 1), jnp.bool_)
                ghead = jnp.concatenate(
                    [one, key_s[:, 1:] != key_s[:, :-1]], 1
                )
                diff = (
                    (r2_s[:, 1:] != r2_s[:, :-1])
                    | (r3_s[:, 1:] != r3_s[:, :-1])
                    | (r4_s[:, 1:] != r4_s[:, :-1])
                )
                head = ghead | jnp.concatenate([one, diff], 1)
                pcol = jax.lax.cummax(
                    jnp.where(ghead, col, jnp.int32(-1)), axis=1
                )
                # flat final-SA-slot candidate; groups never span blocks
                # because the key embeds the block id.
                glob = key_s + (col - pcol)
                newr_f = jax.lax.cummax(
                    jnp.where(head, glob, jnp.int32(-1)), axis=1
                )
                live_s = fpos_s < B * cap
                bq_s = jnp.clip(fpos_s // cap, 0, B - 1)
                newr_local = newr_f - bq_s * cap
                rank = (
                    rankf
                    .at[jnp.where(live_s, fpos_s, B * cap)[0]]
                    .set(newr_local[0], mode="drop")
                    .reshape(B, cap)
                )
                ckpt = jax.lax.dynamic_update_slice(
                    ckpt, rank[:, None, :], (0, rd, 0)
                )
                nxt = jnp.concatenate([head[:, 1:], one], 1)
                act2 = (~(head & nxt)) & live_s
                # Stable sort by the new flat rank compacts the still-active
                # set group-contiguous ascending (ties keep glob order), and
                # the sorted key IS the next round's fra — one payload only.
                key2 = jnp.where(act2, newr_f, BIGG)
                fra_n, fpos_n = jax.lax.sort(
                    (key2, jnp.where(act2, fpos_s, B * cap)),
                    num_keys=1, dimension=1,
                )
                dcount = (
                    jnp.zeros(B + 1, jnp.int32)
                    .at[jnp.where(act2, bq_s, B)[0]]
                    .add(1, mode="drop")
                )
                mrow_new = dcount[:B]
                rows_out = jnp.where(
                    (mrow > 0) & (mrow_new == 0), rd + 1, rows_out
                )
                return (
                    rank, ckpt, fpos_n[0], fra_n[0], mrow_new, rows_out,
                    rd + 1, jnp.sum(mrow_new),
                )

            def comp_cond(state):
                tot = state[-1]
                rd = state[-2]
                return (tot > next_thresh) & (rd < R)

            return comp_cond, comp_body

        state = (rank, ckpt, fpos0, fra0, mrow, rows_out, rd, tot0)
        for gi, MG in enumerate(MGs):
            next_thresh = MGs[gi + 1] if gi + 1 < len(MGs) else 0
            if gi > 0:
                # narrow: the pool is compacted ascending after every round,
                # and the loop above exited with tot <= MG, so the live set
                # is entirely inside the first MG lanes.
                rank, ckpt, fpos, fra, mrow, rows_out, rd, tot = state
                state = (
                    rank, ckpt, fpos[:MG], fra[:MG], mrow, rows_out, rd, tot
                )
            cond, body = make_comp(MG, next_thresh)
            state = jax.lax.while_loop(cond, body, state)
        rank, ckpt, _, _, mrow, rows_out, rd, _ = state

    n_rows = jnp.where(mrow > 0, rd, rows_out)
    # rank is now a permutation of [0, cap); invert via sort, carrying the
    # packed 32-byte prefixes into slot order as payloads (sort payloads are
    # far cheaper than the equivalent post-hoc gathers).
    sorted_out = jax.lax.sort((rank, idx, *packs), num_keys=1, dimension=1)
    sa = sorted_out[1]
    t32 = jnp.stack(packs[:4], axis=1)
    p32 = jnp.stack(sorted_out[2:], axis=1)
    return sa, ckpt, n_rows, t32, p32


@functools.partial(jax.jit, static_argnames=("cap",))
def suffix_array_prefixes(text: jax.Array, n: jax.Array, *, cap: int):
    """Single-block suffix_array_prefixes_batch (see its docstring)."""
    sa, ckpt, n_levels, t32, p32 = suffix_array_prefixes_batch(
        text[None], jnp.asarray(n)[None].astype(jnp.int32), cap=cap
    )
    return sa[0], ckpt[0], n_levels[0], t32[0], p32[0]


@functools.partial(jax.jit, static_argnames=("cap",))
def suffix_array_with_ranks(text: jax.Array, n: jax.Array, *, cap: int):
    """(sa, ckpt, n_levels) — see suffix_array_prefixes."""
    sa, ckpt, n_levels, _, _ = suffix_array_prefixes(text, n, cap=cap)
    return sa, ckpt, n_levels


def suffix_array(text: jax.Array, n: jax.Array, *, cap: int) -> jax.Array:
    """Suffix array only (int32[cap]; valid prefix of length n)."""
    return suffix_array_with_ranks(text, n, cap=cap)[0]
