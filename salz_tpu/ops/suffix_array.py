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

from salz_tpu.ops.sortops import sort_rows

_BIG = np.int32(1 << 26)  # np, not jnp: device-array consts cost ~24 s/lowering via axon  # sorts-last flag; ranks/positions < 2^24 <= cap

_POOL_W = 8192  # pooled-round sort row width (multiple of the 1024 rung granule)
_POOL_F = 1024  # boundary-fixup window radius = max tied-run length for rows path

# Profiling knob (scripts/profile_sa_phases.py): stop the pipeline after a
# phase and return stubs — lets per-phase device time be measured without
# duplicating the pipeline. Never set in production.
import os as _os

_SA_STOP = _os.environ.get("SALZ_SA_STOP", "")


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
    sorted16 = sort_rows((*packed16, idx), num_keys=len(packed16))
    perm16 = sorted16[-1]
    eq = jnp.ones((B, cap - 1), jnp.bool_)
    for kk in sorted16[:-1]:
        eq = eq & (kk[:, 1:] == kk[:, :-1])
    head_s = jnp.concatenate([jnp.ones((B, 1), jnp.bool_), ~eq], axis=1)
    rank_s = _heads_to_rank(head_s)
    # active = member of a non-singleton 16-byte group (run length > 1)
    nxt_head = jnp.concatenate([head_s[:, 1:], jnp.ones((B, 1), jnp.bool_)], 1)
    act16_s = ~(head_s & nxt_head)  # SA order; the invert carries no flag
    _, rank16 = sort_rows((perm16, rank_s), num_keys=1, unique=True)

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
    # Rungs >= 2^17 are rounded to _POOL_W multiples so their sorts can run
    # as (R, _POOL_W) rows (1.7-2.3 ns/elem) instead of one giant row
    # (~20 ns/elem, scripts/exp_sort_batch.py).
    def _ceil_to(x: int, w: int) -> int:
        return -(-x // w) * w

    # First rung = batch/16: a pooled round at batch/8 lanes costs about a
    # full-width round (3 gathers + scatter ~40ns/lane vs 6.2ns/elem full),
    # so entering the pool there saved nothing (round-5 trace).
    MGs = []
    g = max(B * cap // 16, 1024)
    while g < B * cap and g >= 1024 and len(MGs) < 4:
        gr = _ceil_to(g, _POOL_W) if g >= (1 << 17) else _ceil_to(g, 1024)
        if MGs and gr >= MGs[-1]:
            g //= 4
            continue
        MGs.append(gr)
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
        *ks, perm = sort_rows((*keys, idx), num_keys=len(keys))
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
        _, new_rank = sort_rows((perm, new_rank_s), num_keys=1, unique=True)
        ckpt = jax.lax.dynamic_update_slice(
            ckpt, new_rank[:, None, :], (0, rd, 0)
        )
        mrow_new = jnp.sum(act_srt.astype(jnp.int32), axis=1)
        rows_out = jnp.where((mrow > 0) & (mrow_new == 0), rd + 1, rows_out)
        return new_rank, ckpt, act_srt, perm, mrow_new, rows_out, rd + 1

    def full_cond(state):
        mrow = state[-3]
        rd = state[-1]
        return (jnp.sum(mrow) > thresh) & (rd < R)

    if _SA_STOP == "init":
        return rank16, ckpt0, mrow0, mrow0, mrow0  # profiling stub

    rank, ckpt, act_s, perm_s, mrow, rows_out, rd = jax.lax.while_loop(
        full_cond, full_body,
        (rank16, ckpt0, act16_s, perm16, mrow0, rows0, jnp.int32(1)),
    )

    if _SA_STOP == "phase1":
        return rank, ckpt, mrow, mrow, rd * jnp.ones_like(mrow)  # profiling stub

    # ------------- phase 2: POOLED rounds, chained rungs --------------------
    # The active sets of ALL blocks are regathered into ONE cross-block pool
    # (cumsum offsets + searchsorted block ids — the ansv_tpu/lcp global-pool
    # pattern). Keys are FLAT (bq*cap + value) so blocks stay separated in
    # sorts, and the pool CHAIN-NARROWS: each rung's loop exits as soon as
    # the live total fits the smaller rung, whose while_loop then resumes
    # (a skipped rung's loop body never executes — zero cost).
    #
    # Round-5 redesign (PERFORMANCE.md): the old per-round (1, MG) sorts ran
    # at ~20 ns/elem — the single-giant-row lax.sort penalty — and a second
    # (1, MG) compaction sort followed every round. Now
    #   * RESOLVED lanes RIDE IN PLACE: a resolved lane's key is its final
    #     flat rank, which is unique, so it forms a singleton group and
    #     sorts back to its own slot every round (head-index ranks are
    #     idempotent). No per-round compaction; live lanes are compacted
    #     once per RUNG SWITCH.
    #   * the pool stays ascending by key across rounds (new flat ranks are
    #     cummax of an ascending sequence), and measured tied-run lengths
    #     collapse past depth 64 (<= 128 on text/source, probe_groups.py),
    #     so the round sort is a SEGMENTED sort: (R, _POOL_W) row sorts plus
    #     one merge-sort of the 2*_POOL_F window across each row boundary.
    #     Exact whenever every tied run fits _POOL_F — a run straddles at
    #     most one boundary and both fragments sort to the facing row edges
    #     (they hold the rows' extreme keys) — and guarded per round by the
    #     measured max run length with a lax.cond fallback to the global
    #     sort (zero-page-style data keeps 20k-element runs).
    if MGs:
        BIGG = jnp.int32(1 << 29)  # > any flat key bq*cap + v (< 2^28)
        nflat = ns  # (B,) valid lengths, indexed by derived block id

        def _seg_sort(ops, MG):
            """Segmented sort of 5 parallel (MG,) arrays by the first 4: the
            leading key is globally ascending with tied runs <= _POOL_F, so
            (R, _POOL_W) row sorts + one sort (= merge of two sorted runs)
            of the 2*_POOL_F window across each row boundary reproduce the
            global sort exactly (see the phase-2 comment block)."""
            R = MG // _POOL_W
            W, F = _POOL_W, _POOL_F
            rows = jax.lax.sort(
                tuple(o.reshape(R, W) for o in ops), num_keys=4, dimension=1
            )
            if R == 1:
                return [r.reshape(-1) for r in rows]
            flats = [r.reshape(-1) for r in rows]
            spans = jax.lax.sort(
                tuple(
                    f[W - F : W - F + (R - 1) * W].reshape(R - 1, W)[:, : 2 * F]
                    for f in flats
                ),
                num_keys=4, dimension=1,
            )
            outs = []
            for f, s in zip(flats, spans):
                body = f[W - F : W - F + (R - 1) * W].reshape(R - 1, W)
                body = jax.lax.dynamic_update_slice(body, s, (0, 0))
                outs.append(
                    jnp.concatenate(
                        [f[: W - F], body.reshape(-1), f[W - F + (R - 1) * W :]]
                    )
                )
            return outs

        def _row_sort(ops):
            return [
                x[0]
                for x in sort_rows(
                    tuple(x[None] for x in ops), num_keys=4
                )
            ]

        def make_comp(MG: int, next_thresh: int):
            col = jnp.arange(MG, dtype=jnp.int32)
            use_rows = MG >= (1 << 17) and MG % _POOL_W == 0

            def comp_body(state):
                rank, ckpt, fpos, fkey, act, mrow, rows_out, rd, tot = state
                m = jnp.int32(1) << (2 * rd + 2)
                rankf = rank.reshape(-1)
                valid = fpos < B * cap
                bq = jnp.clip(fpos // cap, 0, B - 1)
                pos = fpos - bq * cap

                def rgat(h):
                    p2 = pos + h
                    ok = valid & (p2 < nflat[bq])
                    r = rankf[jnp.clip(bq * cap + p2, 0, B * cap - 1)]
                    return jnp.where(ok, r, jnp.int32(-1))

                r2 = rgat(m)
                r3 = rgat(2 * m)
                r4 = rgat(3 * m)
                key_in = jnp.where(valid, fkey, BIGG)
                # The barrier keeps the three rank gathers OUT of the
                # lax.cond below: sunk into the branches they run ~3x slower
                # (21 ms vs 7.5 ms per 1M-lane gather, round-5 trace).
                ops = jax.lax.optimization_barrier(
                    (key_in, r2, r3, r4, fpos)
                )
                if use_rows:
                    # A tied run longer than _POOL_F exists iff two equal
                    # real keys sit exactly _POOL_F apart (keys ascending):
                    # one shifted compare, no scan.
                    long_run = jnp.any(
                        (key_in[_POOL_F:] == key_in[:-_POOL_F])
                        & (key_in[_POOL_F:] < BIGG)
                    )
                    sorted_ops = jax.lax.cond(
                        ~long_run,
                        lambda o: tuple(_seg_sort(list(o), MG)),
                        lambda o: tuple(_row_sort(list(o))),
                        ops,
                    )
                else:
                    sorted_ops = tuple(_row_sort(list(ops)))
                key_s, r2_s, r3_s, r4_s, fpos_s = sorted_ops
                one = jnp.ones(1, jnp.bool_)
                ghead = jnp.concatenate([one, key_s[1:] != key_s[:-1]])
                diff = (
                    (r2_s[1:] != r2_s[:-1])
                    | (r3_s[1:] != r3_s[:-1])
                    | (r4_s[1:] != r4_s[:-1])
                )
                head = ghead | jnp.concatenate([one, diff])
                pcol = jax.lax.cummax(jnp.where(ghead, col, jnp.int32(-1)))
                # flat final-SA-slot candidate; groups never span blocks
                # because the key embeds the block id.
                glob = key_s + (col - pcol)
                newr_f = jax.lax.cummax(jnp.where(head, glob, jnp.int32(-1)))
                valid_s = fpos_s < B * cap
                bq_s = jnp.clip(fpos_s // cap, 0, B - 1)
                newr_local = newr_f - bq_s * cap
                rank = (
                    rankf
                    .at[jnp.where(valid_s, fpos_s, B * cap)]
                    .set(newr_local, mode="drop")
                    .reshape(B, cap)
                )
                ckpt = jax.lax.dynamic_update_slice(
                    ckpt, rank[:, None, :], (0, rd, 0)
                )
                nxt = jnp.concatenate([head[1:], one])
                act2 = (~(head & nxt)) & valid_s
                dcount = (
                    jnp.zeros(B + 1, jnp.int32)
                    .at[jnp.where(act2, bq_s, B)]
                    .add(1, mode="drop")
                )
                mrow_new = dcount[:B]
                rows_out = jnp.where(
                    (mrow > 0) & (mrow_new == 0), rd + 1, rows_out
                )
                return (
                    rank, ckpt, fpos_s, newr_f, act2, mrow_new, rows_out,
                    rd + 1, jnp.sum(act2.astype(jnp.int32)),
                )

            def comp_cond(state):
                tot = state[-1]
                rd = state[-2]
                return (tot > next_thresh) & (rd < R)

            return comp_cond, comp_body

        def run_phase2(args):
            rank, ckpt, act_s, perm_s, mrow, rows_out, rd = args
            # Entry: compact the active set PER BLOCK in SA order (slots are
            # rank order, so compacting by slot keeps groups contiguous
            # ascending), then flat-gather position and rank per pool lane.
            key = jnp.where(act_s, idx, idx | _BIG)
            _, apos0 = sort_rows((key, perm_s), num_keys=1, unique=True)
            off = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(mrow)])
            tot0 = off[B]
            apos0f = apos0.reshape(-1)
            rankf0 = rank.reshape(-1)

            MG0 = MGs[0]
            g0 = jnp.arange(MG0, dtype=jnp.int32)
            bq0 = jnp.clip(
                jnp.searchsorted(off[1:], g0, side="right").astype(jnp.int32),
                0, B - 1,
            )
            gidx = bq0 * cap + jnp.clip(g0 - off[bq0], 0, cap - 1)
            live0 = g0 < tot0
            fpos0 = jnp.where(live0, bq0 * cap + apos0f[gidx], jnp.int32(B * cap))
            fkey0 = jnp.where(
                live0,
                bq0 * cap + rankf0[jnp.clip(fpos0, 0, B * cap - 1)],
                BIGG,
            )

            state = (rank, ckpt, fpos0, fkey0, live0, mrow, rows_out, rd, tot0)
            for gi, MG in enumerate(MGs):
                next_thresh = MGs[gi + 1] if gi + 1 < len(MGs) else 0
                if gi > 0:
                    # narrow: resolved lanes ride in place during a rung, so
                    # the LIVE lanes (<= MG by the previous rung's exit
                    # condition) are compacted here, once per rung switch.
                    # Ascending keys survive compaction (a subsequence of an
                    # ascending list).
                    rank, ckpt, fpos, fkey, act, mrow, rows_out, rd, tot = state
                    kk = jnp.where(act & (fpos < B * cap), fkey, BIGG)
                    fp = jnp.where(act, fpos, jnp.int32(B * cap))
                    kk_s, fp_s = (
                        x[0]
                        for x in sort_rows((kk[None], fp[None]), num_keys=1)
                    )
                    fkey_n = kk_s[:MG]
                    fpos_n = fp_s[:MG]
                    state = (
                        rank, ckpt, fpos_n, fkey_n, fkey_n < BIGG, mrow,
                        rows_out, rd, tot,
                    )
                cond, body = make_comp(MG, next_thresh)
                state = jax.lax.while_loop(cond, body, state)
            rank, ckpt, _, _, _, mrow, rows_out, rd, _ = state
            return rank, ckpt, mrow, rows_out, rd

        # (A lax.cond skip for the tot0==0 case was measured 50 ms SLOWER on
        # the always-taken path — XLA copies the big carried buffers across
        # the cond boundary — so phase 2 runs unconditionally; its rung
        # while_loops exit immediately when the pool is empty.)
        rank, ckpt, mrow, rows_out, rd = run_phase2(
            (rank, ckpt, act_s, perm_s, mrow, rows_out, rd)
        )

    if _SA_STOP == "phase2":
        return rank, ckpt, mrow, mrow, mrow  # profiling stub (see _SA_STOP)

    n_rows = jnp.where(mrow > 0, rd, rows_out)
    # rank is now a permutation of [0, cap); invert via sort, carrying the
    # packed 32-byte prefixes into slot order as payloads (sort payloads are
    # far cheaper than the equivalent post-hoc gathers).
    sorted_out = sort_rows((rank, idx, *packs), num_keys=1, unique=True)
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
