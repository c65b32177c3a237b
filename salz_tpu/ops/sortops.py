"""Shape-aware row sort: lax.sort for wide batches, merge-path for long rows.

Motivation (round 5, measured on TPU v5e via scripts/exp_sort_shapes.py):
`jax.lax.sort` cost per element is strongly shape-dependent — a (1, 8M)
3-key sort costs 228 ms where the same data as (8, 1M) rows costs 55 ms
(4.1x). Big-cap blocks (levels 6-9 run batch 1-4) pay that penalty in every
suffix-array round, the slot->text sort, and every compaction sort, which is
the single largest reason the corpus sweep's high-level rows ran ~0.1-0.35x
the scalar baseline (VERDICT round 4).

`sort_rows` keeps the lax.sort fast path for batches >= `min_rows` rows and
otherwise sorts each row as R = min_rows/B contiguous runs with one
(B*R, L/R) lax.sort, then merges run pairs level by level with the classic
GPU "merge path" scheme, TPU-shaped:

1. Split points: for every output tile of T elements, the exact crossing
   (a_j, b_j) with a_j + b_j = j*T is found by vectorized bisection in XLA
   (lexicographic gather-compare; ~log2(S) tiny gathers per level).
2. One Pallas pass per merge level: each grid step DMAs the four aligned
   T-blocks covering the two input windows, masks positions outside
   [a_j, a_j+1) / [b_j, b_j+1) to -INF/+INF *positionally* (the windows
   stay ascending), reverses the B window (asc+desc = bitonic), runs the
   log2(4T) bitonic-merge substages in VMEM (sublane reshapes down to
   distance 128, lane rolls below), and extracts the exact T outputs at the
   dynamic offset with a log-shift lane rotation.

Everything is a sequential-grid Pallas kernel with static shapes and static
trip counts — no data-dependent device loops (axon-wedge rule).

Stability: lax.sort is stable; a merge network is not. Unless the caller
promises unique keys (`unique=True`), a row-position iota is appended as the
final key, which makes the composite key strictly unique — the merged result
is then THE unique sorted order, i.e. exactly lax.sort's stable output,
byte-for-byte (run A occupies lower row positions than run B, so the iota
key reproduces stable-merge tie order). Every call site in the codec
pipeline therefore produces identical streams whichever path runs.

There is no reference counterpart (the reference's only sort is inside
libsais, salz.c:465); this is TPU-native plumbing in service of SURVEY.md
§2.1 C6's suffix-array engine and every compaction sort downstream of it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: test hook: force the Pallas merge kernel in interpret mode on CPU
_FORCE_INTERPRET = False

#: rows shorter than this always take plain lax.sort (the long-row penalty
#: only bites well past VMEM-ish sizes; splitting tiny rows just adds
#: merge passes)
_MIN_LEN = 1 << 19

_IMIN = np.int32(-(2**31))
_IMAX = np.int32(2**31 - 1)


def _lex_gt(a_keys, b_keys):
    """Strict lexicographic a > b over parallel key lists (int32, signed)."""
    gt = a_keys[0] > b_keys[0]
    eq = a_keys[0] == b_keys[0]
    for a, b in zip(a_keys[1:], b_keys[1:]):
        gt = gt | (eq & (a > b))
        eq = eq & (a == b)
    return gt


def _lex_lt_gather(ops, num_keys, ia, ib):
    """keys[ia] < keys[ib] elementwise over flat index arrays (XLA path)."""
    lt = None
    eq = None
    for k in ops[:num_keys]:
        f = k.reshape(-1)
        a = f[ia]
        b = f[ib]
        this_lt = a < b
        lt = this_lt if lt is None else lt | (eq & this_lt)
        this_eq = a == b
        eq = this_eq if eq is None else eq & this_eq
    return lt


# ---------------------------------------------------------------------------
# XLA fallback merge (CPU path and tests)
# ---------------------------------------------------------------------------


def _compare_exchange(ops, num_keys, d):
    """One ascending bitonic substage at distance d over the last axis."""
    shaped = [o.reshape(o.shape[0], -1, 2, d) for o in ops]
    a_keys = [o[:, :, 0, :] for o in shaped[:num_keys]]
    b_keys = [o[:, :, 1, :] for o in shaped[:num_keys]]
    sw = _lex_gt(a_keys, b_keys)
    outs = []
    for o in shaped:
        a, b = o[:, :, 0, :], o[:, :, 1, :]
        lo = jnp.where(sw, b, a)
        hi = jnp.where(sw, a, b)
        outs.append(jnp.stack([lo, hi], axis=2).reshape(o.shape[0], -1))
    return outs


def _merge_level_xla(ops, num_keys, S):
    """Merge adjacent sorted runs: ops rows are (M, 2S) = one run pair each,
    both halves ascending. Full bitonic merge in XLA (slow on TPU — used on
    CPU backends only)."""
    ops = [
        jnp.concatenate([o[:, :S], o[:, : S - 1 : -1]], axis=1) for o in ops
    ]
    d = S
    while d >= 1:
        ops = _compare_exchange(ops, num_keys, d)
        d //= 2
    return ops


# ---------------------------------------------------------------------------
# merge-path split points (XLA bisection)
# ---------------------------------------------------------------------------


def _merge_splits(ops, num_keys, S, T):
    """Exact merge-path splits for every output tile boundary.

    ops: (P, 2S) arrays, each row = two ascending runs (keys strictly unique
    per row). Returns (a, b): int32[P, J+1] with a[p, j] + b[p, j] == j*T —
    the count of A-/B-elements among the j*T smallest of the union.

    a[p, j] is the largest a in [max(0, jT-S), min(jT, S)] satisfying
    A[a-1] < B[jT-a] (out-of-range reads count as -inf/+inf); with strictly
    unique keys that crossing is unique and exact. ~log2(S)+1 bisection
    steps, each two tiny lexicographic gathers.
    """
    P = ops[0].shape[0]
    J = 2 * S // T
    m = (jnp.arange(J + 1, dtype=jnp.int32) * T)[None, :]
    m = jnp.broadcast_to(m, (P, J + 1))
    lo = jnp.maximum(0, m - S)  # a >= m - S
    hi = jnp.minimum(m, S)
    prow = (jnp.arange(P, dtype=jnp.int32) * (2 * S))[:, None]

    def q(a):
        """Predicate A[a-1] < B[m-a] (True while a is not past the cross)."""
        ia = prow + jnp.clip(a - 1, 0, S - 1)
        ib = prow + S + jnp.clip(m - a, 0, S - 1)
        lt = _lex_lt_gather(ops, num_keys, ia, ib)
        lt = jnp.where(a - 1 < 0, True, lt)  # A[-1] = -inf
        lt = jnp.where(m - a > S - 1, True, lt)  # B[>=S] = +inf
        lt = jnp.where(a - 1 >= S, False, lt)  # A[>=S] = +inf (a > S)
        return lt

    # invariant: q(lo) True, q(hi+1) False; find max a with q(a)
    steps = max(S.bit_length(), 1)
    for _ in range(steps + 1):
        mid = (lo + hi + 1) >> 1
        ok = q(mid)
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - 1)
    return lo, m - lo


# ---------------------------------------------------------------------------
# in-VMEM helpers (values laid out (rows, 128))
# ---------------------------------------------------------------------------


def _val_reverse(v):
    """Reverse a (rows, 128) value: flip sublanes then lanes (XOR swaps —
    negative-stride slicing does not lower in Mosaic)."""
    rows = v.shape[0]
    d = rows // 2
    while d >= 1:
        w = v.reshape(rows // (2 * d), 2, d, 128)
        v = jnp.concatenate([w[:, 1], w[:, 0]], axis=1).reshape(rows, 128)
        d //= 2
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    d = 64
    while d >= 1:
        low = (lane & d) == 0
        v = jnp.where(
            low,
            pltpu.roll(v, shift=128 - d, axis=1),
            pltpu.roll(v, shift=d, axis=1),
        )
        d //= 2
    return v


def _val_bitonic_merge(vals, num_keys):
    """Ascending bitonic merge of (rows, 128) values (rows*128 elements,
    already bitonic). Sublane reshapes for distance >= 128, lane rolls with
    parity selects below."""
    rows = vals[0].shape[0]
    n = rows * 128
    d = n // 2
    while d >= 128:
        dr = d // 128
        shaped = [v.reshape(rows // (2 * dr), 2, dr, 128) for v in vals]
        sw = _lex_gt(
            [v[:, 0] for v in shaped[:num_keys]],
            [v[:, 1] for v in shaped[:num_keys]],
        )
        nxt = []
        for v in shaped:
            a, b = v[:, 0], v[:, 1]
            lo = jnp.where(sw, b, a)
            hi = jnp.where(sw, a, b)
            nxt.append(
                jnp.concatenate([lo[:, None], hi[:, None]], axis=1).reshape(
                    rows, 128
                )
            )
        vals = nxt
        d //= 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    while d >= 1:
        low = (lane & d) == 0
        partners = [
            jnp.where(
                low,
                pltpu.roll(v, shift=128 - d, axis=1),
                pltpu.roll(v, shift=d, axis=1),
            )
            for v in vals
        ]
        self_gt = _lex_gt(vals[:num_keys], partners[:num_keys])
        part_gt = _lex_gt(partners[:num_keys], vals[:num_keys])
        # boolean logic, not where(): Mosaic cannot select between i1 vectors
        take_partner = (low & self_gt) | (~low & part_gt)
        vals = [
            jnp.where(take_partner, p, v) for v, p in zip(vals, partners)
        ]
        d //= 2
    return vals


def _val_extract(v, off, out_rows, scratch):
    """Extract out_rows*128 contiguous elements at dynamic offset `off` from
    a (rows, 128) value: dynamic sublane slice via a scratch ref (Mosaic has
    no dynamic_slice on values) + log-shift lane rotation."""
    r0 = off >> 7
    lo = off & 127
    scratch[:] = v
    win = scratch[pl.ds(r0, out_rows + 1), :]
    a = win[:out_rows]
    b = win[1 : out_rows + 1]
    # rotate lanes left by `lo` (dynamic): compose static rolls by bit
    sh = 1
    while sh < 128:
        cond = (lo & sh) != 0
        a = jnp.where(cond, pltpu.roll(a, shift=128 - sh, axis=1), a)
        b = jnp.where(cond, pltpu.roll(b, shift=128 - sh, axis=1), b)
        sh *= 2
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(lane < 128 - lo, a, b)


# ---------------------------------------------------------------------------
# merge-path Pallas kernel
# ---------------------------------------------------------------------------


def _merge_kernel(
    a_ref, b_ref, *refs, n_ops: int, num_keys: int, T: int, S: int
):
    """Produce output tile j of a merged run pair (see module docstring)."""
    p = pl.program_id(0)
    j = pl.program_id(1)
    a0 = a_ref[p, j]
    a1 = a_ref[p, j + 1]
    b0 = b_ref[p, j]
    b1 = b_ref[p, j + 1]
    nblk = S // T
    abase = jnp.clip(a0 // T, 0, nblk - 1) * T
    bbase = jnp.clip(b0 // T, 0, nblk - 1) * T
    rows2 = 2 * T // 128  # rows of one two-block window

    alo_refs = refs[0 * n_ops : 1 * n_ops]
    ahi_refs = refs[1 * n_ops : 2 * n_ops]
    blo_refs = refs[2 * n_ops : 3 * n_ops]
    bhi_refs = refs[3 * n_ops : 4 * n_ops]
    out_refs = refs[4 * n_ops :]

    def window(lo_r, hi_r):
        return jnp.concatenate(
            [lo_r[0], hi_r[0]], axis=0
        )  # blocks are (1, T//128, 128)

    pos_a = abase + (
        jax.lax.broadcasted_iota(jnp.int32, (rows2, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (rows2, 128), 1)
    )
    pos_b = pos_a - abase + bbase

    aw = [window(lo, hi) for lo, hi in zip(alo_refs, ahi_refs)]
    bw = [window(lo, hi) for lo, hi in zip(blo_refs, bhi_refs)]
    # positional masking keeps the windows ascending: elements before the
    # split are the provably-smallest candidates (-inf), elements at/after
    # the next split are provably not in this tile (+inf)
    for k in range(num_keys):
        aw[k] = jnp.where(pos_a < a0, _IMIN, jnp.where(pos_a >= a1, _IMAX, aw[k]))
        bw[k] = jnp.where(pos_b < b0, _IMIN, jnp.where(pos_b >= b1, _IMAX, bw[k]))
    bw = [_val_reverse(v) for v in bw]
    z = [jnp.concatenate([a, b], axis=0) for a, b in zip(aw, bw)]
    z = _val_bitonic_merge(z, num_keys)
    off = (a0 - abase) + (b0 - bbase)  # count of -inf-masked candidates

    def _emit(scratch):
        for out, v in zip(out_refs, z):
            out[0] = _val_extract(v, off, T // 128, scratch)

    pl.run_scoped(_emit, pltpu.VMEM((4 * T // 128, 128), jnp.int32))


def _merge_level_tpu(ops, num_keys, S, T):
    """One merge level on TPU: ops are (P, 2S), both halves ascending."""
    P = ops[0].shape[0]
    J = 2 * S // T
    n_ops = len(ops)
    a, b = _merge_splits(ops, num_keys, S, T)
    nblk = S // T
    lgT = T.bit_length() - 1
    rows = T // 128
    # 3D tile layout: block (1, rows, 128) satisfies Mosaic's last-two-dims
    # rule for any tile count ((1, T) blocks do not when P > 1)
    vops = [o.reshape(P * J, rows, 128) for o in ops]

    def _ablk(p, j, ar):
        return p * (2 * nblk) + jnp.clip(ar[p, j] >> lgT, 0, nblk - 1)

    def _bblk(p, j, br):
        return (
            p * (2 * nblk) + nblk + jnp.clip(br[p, j] >> lgT, 0, nblk - 1)
        )

    alo = pl.BlockSpec(
        (1, rows, 128), lambda p, j, ar, br: (_ablk(p, j, ar), 0, 0),
        memory_space=pltpu.VMEM,
    )
    ahi = pl.BlockSpec(
        (1, rows, 128),
        lambda p, j, ar, br: (
            jnp.minimum(_ablk(p, j, ar) + 1, p * 2 * nblk + nblk - 1), 0, 0
        ),
        memory_space=pltpu.VMEM,
    )
    blo = pl.BlockSpec(
        (1, rows, 128), lambda p, j, ar, br: (_bblk(p, j, br), 0, 0),
        memory_space=pltpu.VMEM,
    )
    bhi = pl.BlockSpec(
        (1, rows, 128),
        lambda p, j, ar, br: (
            jnp.minimum(_bblk(p, j, br) + 1, (p + 1) * 2 * nblk - 1), 0, 0
        ),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, rows, 128), lambda p, j, ar, br: (p * J + j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _merge_kernel, n_ops=n_ops, num_keys=num_keys, T=T, S=S
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, J),
        in_specs=[alo] * n_ops + [ahi] * n_ops + [blo] * n_ops
        + [bhi] * n_ops,
        out_specs=[out_spec] * n_ops,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P * J, rows, 128), o.dtype) for o in ops
        ],
        interpret=_FORCE_INTERPRET,
    )(a, b, *vops, *vops, *vops, *vops)
    return [o.reshape(P, 2 * S) for o in outs]


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def sort_rows(
    operands,
    num_keys: int = 1,
    *,
    unique: bool = False,
    min_rows: int = 8,
    tile: int = 4096,
):
    """Sort each row of the (B, L) int32 operands by the first num_keys.

    Drop-in for jax.lax.sort(operands, num_keys=num_keys, dimension=1) with
    identical output bytes (see module docstring on stability). Set
    `unique=True` only when the composite key is strictly unique per row —
    it skips the iota tiebreak key (one less array through the merge).
    """
    operands = list(operands)
    B, L = operands[0].shape
    R = 1
    if L >= _MIN_LEN:
        while (
            B * R < min_rows
            and L % (2 * R) == 0
            and (L // (2 * R)) % (2 * tile) == 0
        ):
            R *= 2
    if R == 1:
        return tuple(
            jax.lax.sort(tuple(operands), num_keys=num_keys, dimension=1)
        )

    use_pallas = jax.default_backend() == "tpu" or _FORCE_INTERPRET
    if not unique:
        iota = jnp.broadcast_to(
            jnp.arange(L, dtype=jnp.int32)[None, :], (B, L)
        )
        operands = operands[:num_keys] + [iota] + operands[num_keys:]
        num_keys = num_keys + 1

    S = L // R
    ops = [o.reshape(B * R, S) for o in operands]
    ops = list(jax.lax.sort(tuple(ops), num_keys=num_keys, dimension=1))
    while S < L:
        ops = [o.reshape(-1, 2 * S) for o in ops]
        if use_pallas:
            ops = _merge_level_tpu(ops, num_keys, S, tile)
        else:
            ops = _merge_level_xla(ops, num_keys, S)
        S *= 2
    ops = [o.reshape(B, L) for o in ops]
    if not unique:
        ops = ops[: num_keys - 1] + ops[num_keys:]
    return tuple(ops)
