"""Cost-optimal parse selection (the reference's backward DP, salz.c:610-662).

Three implementations with identical results:

* `optimal_parse_sequential` — a literal backward `lax.fori_loop`. O(n) serial
  steps; exact by construction. This is the conformance baseline.

* the XLA chunked path — chunks processed back to front by a fori_loop; inside
  a chunk, a vectorized Bellman-Ford/suffix-min fixpoint runs until costs stop
  changing. Backend-generic (the CPU test path).

* the TPU sweep kernel — ONE Pallas call whose sequential grid walks
  2048-position super-chunks back to front, processing sixteen 128-wide
  sub-chunks per step (statically unrolled). A rolling VMEM window holds the
  next `window` values of u, so crossing-edge contributions are lane gathers
  from on-chip memory; the in-row fixpoint iterates on single (B, 128) vreg
  tiles. Measured fixpoint work totals ~n/12 rounds independent of chunk
  size, so narrow rows minimize total vector work; the old per-chunk
  formulation paid ~2048 XLA dispatches + Pallas call overheads per block.
  The default window is 8192: measured on v5e the wider in-VMEM crossing
  gather costs ~2% over window 2048 on text, while ELF binaries — whose
  repeats are mostly 2-8 KiB at 13k+ distinct targets, overflowing the far
  run slots — collapse from the segmented fallback (933 ms) to the near
  path (212 ms).

All paths work on u[p] = cost[p] - 9*(n - p) (the literal-chain potential), so
the literal edge becomes a suffix min and each factor edge a gather. The DP
values are a unique fixpoint over a forward DAG, so at convergence the chosen
factors (with the reference's strict literal < PSV < NSV tie order,
salz.c:636,651) are identical to the sequential result. Factor edges longer
than `window` are rare (they need a repeat longer than `window`); they are
handled by an exact outer value-iteration loop that re-sweeps with frozen
far-edge contributions until nothing improves.

Costs fit int32: total <= 9 * (16 MiB) < 2^31.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from salz_tpu.format import FACTOR_LENGTH_MIN, VNIBBLE_THRESHOLDS

# Large-but-safe sentinel: INF + INF and INF + real cost must stay < 2^31
# (they appear transiently in the fixpoint before convergence).
_INF = np.int32(2**28)  # np, not jnp: device-array consts cost ~24 s/lowering via axon
_INT_INF = 2**28  # plain-int twin for Pallas kernels (no captured consts)

_SUP = 2048  # positions per grid step
_C = 128  # sub-chunk width = lane count
_K = _SUP // _C
_KF = 128  # far-target slots (one lane row): max far-RUNS per block for the
# in-kernel far path; real corpora measure 10-24 runs/block (license text)

#: test hook: force the Pallas sweep path in interpret mode on CPU
_FORCE_INTERPRET = False


def _vnibble_size_vec(v):
    m = jnp.ones(v.shape, jnp.int32)
    for thr in VNIBBLE_THRESHOLDS[:-1]:
        m = m + (v >= jnp.int32(min(thr, 2**31 - 1))).astype(jnp.int32)
    return m


def factor_static_cost(offs, length):
    """1 + offs_bitsize + len_bitsize (everything except the suffix cost)."""
    offs_bits = 8 + 4 * _vnibble_size_vec((offs - 1) >> 8)
    len_bits = ((length - FACTOR_LENGTH_MIN) >> 3) + 4
    return 1 + offs_bits + len_bits


@functools.partial(jax.jit, static_argnames=("cap",))
def optimal_parse_sequential(
    psv_offs, psv_len, nsv_offs, nsv_len, n, *, cap: int
):
    """Reference-exact backward DP. Returns (offs, len, cost[cap+1])."""
    psv_static = factor_static_cost(psv_offs, psv_len)
    nsv_static = factor_static_cost(nsv_offs, nsv_len)
    psv_ok = psv_len >= FACTOR_LENGTH_MIN
    nsv_ok = nsv_len >= FACTOR_LENGTH_MIN

    cost = jnp.zeros(cap + 1, jnp.int32)
    offs = jnp.zeros(cap, jnp.int32)
    length = jnp.ones(cap, jnp.int32)

    def body(t, state):
        cost, offs, length = state
        p = cap - 1 - t
        active = (p >= 1) & (p < n)

        best_cost = 9 + cost[p + 1]
        best_offs = jnp.int32(0)
        best_len = jnp.int32(1)

        pl_ = psv_len[p]
        pc = jnp.where(
            psv_ok[p], psv_static[p] + cost[jnp.clip(p + pl_, 0, cap)], _INF
        )
        take = pc < best_cost
        best_cost = jnp.where(take, pc, best_cost)
        best_offs = jnp.where(take, psv_offs[p], best_offs)
        best_len = jnp.where(take, pl_, best_len)

        nl = nsv_len[p]
        nc = jnp.where(
            nsv_ok[p], nsv_static[p] + cost[jnp.clip(p + nl, 0, cap)], _INF
        )
        take = nc < best_cost
        best_cost = jnp.where(take, nc, best_cost)
        best_offs = jnp.where(take, nsv_offs[p], best_offs)
        best_len = jnp.where(take, nl, best_len)

        cost = cost.at[p].set(jnp.where(active, best_cost, cost[p]))
        offs = offs.at[p].set(jnp.where(active, best_offs, offs[p]))
        length = length.at[p].set(jnp.where(active, best_len, length[p]))
        return cost, offs, length

    cost, offs, length = jax.lax.fori_loop(
        0, cap - 1, body, (cost, offs, length)
    )
    return offs, length, cost


# ---------------------------------------------------------------------------
# TPU sweep kernel
# ---------------------------------------------------------------------------


def _shift_left_lane(a, h, fill):
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    rolled = pltpu.roll(a, shift=_C - h, axis=1)
    return jnp.where(lane < _C - h, rolled, fill)


def _sweep_kernel(
    nb_ref, base_ref, uw_ref, pw_ref, nw_ref, pt_ref, nt_ref, far_ref,
    tgt_ref, pk_ref, nk_ref, out_ref, choice_ref, S, UT, *, window: int
):
    """One backward sweep over a SEGMENT of positions; see module docstring.

    S (VMEM scratch, (B, _SUP + window)) holds u[lo_s : lo_s + _SUP + window)
    for the current super-chunk base lo_s (segment-local); the grid walks
    super-chunks from the back, shifting S by _SUP after each step.

    base_ref (B, 1) is the segment's global start position; uw_ref (B,
    window) carries u[seg_end : seg_end + window) — the already-FINAL values
    just above the segment (for the whole-block sweep: u[cap] = 0, INF
    beyond). This is what lets the far path re-sweep one segment at a time
    against converged later segments instead of re-sweeping the whole block.

    choice_ref gets the reference's tie-exact factor selection (0 literal,
    1 PSV, 2 NSV) computed from the CONVERGED u values while they are still
    in VMEM — the selection gathers cost ~3x the whole sweep when done as
    XLA full-size random gathers afterwards. Only exact when far_ref is all
    INF (no frozen far contributions); the segment path re-selects outside.

    FAR EDGES, in-kernel (the round-3 change): factor edges longer than
    `window` always land STRICTLY above their super-chunk (target >=
    sub-chunk end + window > super-chunk end), i.e. in a region this
    back-to-front sweep has already finished. On real corpora far edges come
    in runs sharing ONE target each (a maximal repeat: len decreases by 1
    per position, so p + len is constant) — 10-24 runs per 1 MiB block on
    license text. So the caller compacts the run-head targets into tgt_ref
    (B, _KF) and labels every far source with its run id (pk_ref/nk_ref,
    -1 = not far). The kernel keeps u AT THOSE TARGETS in the UT scratch —
    refreshed as each super-chunk is finished — and far contributions become
    one 128-lane take_along_axis per side. This replaced a 512-step
    sequential segmented re-sweep (one pallas dispatch per WINDOW segment)
    that cost ~6x the whole near sweep on license-style text.

    The grid is (batch_tiles, nsup): batch rows are independent, so large
    batches (small caps auto-batch up to 256 lanes) are tiled to keep the
    scoped-VMEM footprint constant; c counts super-chunks within the tile
    and restarts at 0 on every new tile, re-initializing S."""
    c = pl.program_id(1)
    nsup = pl.num_programs(1)
    nb = nb_ref[:]  # (B, 1)
    base = base_ref[:]  # (B, 1) global segment start
    B = nb.shape[0]
    lo_s = (nsup - 1 - c) * _SUP

    @pl.when(c == 0)
    def _init():
        S[:, _SUP:] = uw_ref[:]
        UT[:] = jnp.full(UT.shape, _INT_INF, jnp.int32)

    pw = pw_ref[:]
    nw = nw_ref[:]
    pt = pt_ref[:]
    nt = nt_ref[:]
    far = far_ref[:]
    pk = pk_ref[:]
    nk = nk_ref[:]
    # u at the far-run targets: all strictly above this super-chunk, hence
    # final (updated when their super-chunk finished).
    ut = UT[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, _C), 1)

    def wgather(win, j):
        """win (B, window), j (B, _C) in [0, window) -> win[b, j]."""
        tile = j >> 7
        lj = j & (_C - 1)
        g = jnp.full((B, _C), _INT_INF, jnp.int32)
        for wt in range(window // _C):
            cand = jnp.take_along_axis(win[:, _C * wt : _C * (wt + 1)], lj, axis=1)
            g = jnp.where(tile == wt, cand, g)
        return g

    for i in range(_K - 1, -1, -1):
        sl = slice(_C * i, _C * (i + 1))
        win = S[:, _C * (i + 1) : _C * (i + 1) + window]
        hi = lo_s + _C * (i + 1)
        boundary = win[:, 0:1]
        ptl = pt[:, sl]
        ntl = nt[:, sl]
        pwl = pw[:, sl]
        nwl = nw[:, sl]
        pos = base + lo_s + _C * i + lane
        act = (pos >= 1) & (pos < nb)
        rest = jnp.where(pos >= nb, 0, _INT_INF).astype(jnp.int32)

        # Crossing edges: targets in [hi, hi + window) are FINAL — gather once.
        dp = ptl - (base + hi)
        dn = ntl - (base + hi)
        p_near = (dp >= 0) & (dp < window)
        n_near = (dn >= 0) & (dn < window)
        gp = wgather(win, jnp.clip(dp, 0, window - 1))
        gn = wgather(win, jnp.clip(dn, 0, window - 1))
        # Far edges (target >= hi + window): u at the run target, from UT.
        pkl = pk[:, sl]
        nkl = nk[:, sl]
        gpt = jnp.take_along_axis(ut, jnp.clip(pkl, 0, _KF - 1), axis=1)
        gnt = jnp.take_along_axis(ut, jnp.clip(nkl, 0, _KF - 1), axis=1)
        pre_p = jnp.minimum(
            jnp.where(p_near, pwl + gp, _INT_INF),
            jnp.where(pkl >= 0, pwl + gpt, _INT_INF),
        )
        pre_n = jnp.minimum(
            jnp.where(n_near, nwl + gn, _INT_INF),
            jnp.where(nkl >= 0, nwl + gnt, _INT_INF),
        )
        pre = jnp.minimum(jnp.minimum(pre_p, pre_n), far[:, sl])

        # In-row edges (strictly below hi; t == hi is a crossing edge above).
        p_in = dp < 0
        n_in = dn < 0
        plo = jnp.where(p_in, ptl - (base + hi - _C), 0)
        nlo = jnp.where(n_in, ntl - (base + hi - _C), 0)
        pw_in = jnp.where(p_in, pwl, _INT_INF)
        nw_in = jnp.where(n_in, nwl, _INT_INF)

        def relax1(ul):
            v = jnp.minimum(
                pre,
                jnp.minimum(
                    pw_in + jnp.take_along_axis(ul, plo, axis=1),
                    nw_in + jnp.take_along_axis(ul, nlo, axis=1),
                ),
            )
            v = jnp.where(act, v, rest)
            s = v
            for h in (1, 2, 4, 8, 16, 32, 64):
                s = jnp.minimum(s, _shift_left_lane(s, h, _INT_INF))
            s = jnp.minimum(s, boundary)
            return jnp.where(act, s, rest)

        # Grouped fixpoint: 4 relaxations per convergence check (the check is
        # a vector reduce + scalar branch; extra relaxes are idempotent).
        def group(ul):
            return relax1(relax1(relax1(relax1(ul))))

        ul0 = jnp.full((B, _C), _INT_INF, jnp.int32)
        state = (group(relax1(ul0)), ul0, jnp.int32(0))

        def cond(st):
            ul, prev, it = st
            return jnp.any(ul != prev) & (it < _C // 2)

        def body(st):
            ul, _, it = st
            return group(ul), ul, it + 1

        ul = jax.lax.while_loop(cond, body, state)[0]
        S[:, sl] = ul

        # In-VMEM factor selection from the converged values (exact when far
        # is all-INF; the reference's tie order: literal, then PSV with
        # strict <, then NSV with strict <, salz.c:636,651). All three
        # candidate costs share the 9*(n-p) potential so the u-form compares
        # are exact.
        lit_v = _shift_left_lane(ul, 1, _INT_INF)
        lit_v = jnp.where(lane == _C - 1, boundary, lit_v)
        pv = jnp.minimum(
            pre_p, pw_in + jnp.take_along_axis(ul, plo, axis=1)
        )
        nv = jnp.minimum(
            pre_n, nw_in + jnp.take_along_axis(ul, nlo, axis=1)
        )
        ch = jnp.where(pv < lit_v, 1, 0)
        ch = jnp.where(nv < jnp.minimum(pv, lit_v), 2, ch)
        choice_ref[:, sl] = jnp.where(act, ch, 0)

    out_ref[:] = S[:, :_SUP]

    # Refresh u at any far-run targets that live in the super-chunk just
    # finished (they are only ever READ by later, i.e. earlier-in-text,
    # super-chunks: a far target is > its source's super-chunk end).
    tgt = tgt_ref[:]  # (B, _KF) global positions, -1 = unused slot
    j = tgt - (base + lo_s)
    upd = (j >= 0) & (j < _SUP)
    jl = jnp.clip(j, 0, _SUP - 1)
    g = jnp.full(tgt.shape, _INT_INF, jnp.int32)
    for wt in range(_K):
        cand = jnp.take_along_axis(
            S[:, _C * wt : _C * (wt + 1)],
            jnp.clip(jl - _C * wt, 0, _C - 1),
            axis=1,
        )
        g = jnp.where((jl >> 7) == wt, cand, g)
    UT[:] = jnp.where(upd, g, ut)

    # Shift the window for the next (earlier) super-chunk.
    tail = S[:, :window]
    S[:, _SUP : _SUP + window] = tail


def _sweep_tpu(nb, base, uw, pw, nw, pt, nt, pre_far, tgt, pkidx, nkidx, *,
               seglen: int, window: int):
    """Sweep one segment [base, base + seglen) given final values uw above.

    tgt (B, _KF) / pkidx / nkidx (B, seglen) drive the in-kernel far path;
    pass tgt = -1 and kidx = -1 to disable it (segment-path calls)."""
    B = pw.shape[0]
    if B == 1:
        # Mosaic refuses the kernel's lane-gathers (take_along_axis) on
        # single-sublane (1, 128) operands; pad to two lanes — VMEM tiles are
        # 8 sublanes anyway, so the dummy lane (nb = 0 -> everything inactive)
        # is essentially free.
        pad2 = lambda a: jnp.concatenate([a, jnp.zeros_like(a)], axis=0)
        padm = lambda a: jnp.concatenate([a, jnp.full_like(a, -1)], axis=0)
        u, choice = _sweep_tpu(
            pad2(nb), pad2(base), pad2(uw), pad2(pw), pad2(nw), pad2(pt),
            pad2(nt), pad2(pre_far), padm(tgt), padm(pkidx), padm(nkidx),
            seglen=seglen, window=window,
        )
        return u[:1], choice[:1]
    nsup = seglen // _SUP
    # Tile the independent batch rows into the grid: 8-row tiles keep the
    # double-buffered VMEM footprint constant no matter the batch (level-0
    # auto-batch is 256 lanes; B-whole specs OOM scoped VMEM past ~32).
    BT = 8 if B % 8 == 0 else B
    nbt = B // BT
    spec = lambda: pl.BlockSpec(
        (BT, _SUP), lambda b, c: (b, nsup - 1 - c), memory_space=pltpu.VMEM
    )
    whole = lambda w: pl.BlockSpec(
        (BT, w), lambda b, c: (b, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_sweep_kernel, window=window),
        grid=(nbt, nsup),
        out_shape=(
            jax.ShapeDtypeStruct((B, seglen), jnp.int32),
            jax.ShapeDtypeStruct((B, seglen), jnp.int32),
        ),
        in_specs=[
            whole(1), whole(1), whole(window),
            spec(), spec(), spec(), spec(), spec(),
            whole(_KF), spec(), spec(),
        ],
        out_specs=(spec(), spec()),
        scratch_shapes=[
            pltpu.VMEM((BT, _SUP + window), jnp.int32),
            pltpu.VMEM((BT, _KF), jnp.int32),
        ],
        interpret=_FORCE_INTERPRET,
    )(nb, base, uw, pw, nw, pt, nt, pre_far, tgt, pkidx, nkidx)


# ---------------------------------------------------------------------------
# chunked/batched driver
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cap", "chunk", "window"))
def optimal_parse_chunked_batch(
    psv_offs, psv_len, nsv_offs, nsv_len, n, *,
    cap: int, chunk: int = 512, window: int = 8192
):
    """Vectorized chunked-fixpoint DP over a BATCH of blocks; identical
    results to the per-block sequential DP. See module docstring.

    Batch-native on purpose: all gathers are FLAT 1-D gathers with per-block
    base offsets — XLA lowers batched (vmapped) gathers an order of magnitude
    slower on TPU. Inputs are (B, cap) arrays and n is (B,).
    """
    B = psv_offs.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    nb = n[:, None]

    psv_ok = psv_len >= FACTOR_LENGTH_MIN
    nsv_ok = nsv_len >= FACTOR_LENGTH_MIN
    # w'(p) = static factor cost - 9 * len: the cost delta of the factor edge
    # in potential form (negative iff the factor beats covering with literals).
    psv_w = jnp.where(
        psv_ok, factor_static_cost(psv_offs, psv_len) - 9 * psv_len, _INF
    )
    nsv_w = jnp.where(
        nsv_ok, factor_static_cost(nsv_offs, nsv_len) - 9 * nsv_len, _INF
    )
    psv_tgt = jnp.clip(jnp.where(psv_ok, idx + psv_len, cap), 0, cap)
    nsv_tgt = jnp.clip(jnp.where(nsv_ok, idx + nsv_len, cap), 0, cap)

    # window % _SUP == 0 keeps the far path's segcap == WINDOW a multiple of
    # the sweep kernel's super-chunk (the segment-above-finality argument in
    # far_branch_pallas needs segcap <= WINDOW; the kernel needs _SUP | segcap).
    use_pallas = (
        jax.default_backend() == "tpu" or _FORCE_INTERPRET
    ) and cap % _SUP == 0 and (window % _SUP == 0 or window >= cap)

    if use_pallas:
        WINDOW = min(window, cap)
        nb2 = jnp.reshape(n, (B, 1)).astype(jnp.int32)
        base0 = jnp.zeros((B, 1), jnp.int32)
        # u just above the whole block: u[cap] = 0, fictional beyond.
        uw_top = jnp.full((B, WINDOW), _INF, jnp.int32).at[:, :1].set(0)

        def sweep(pre_far, tgt, pkidx, nkidx):
            u_main, choice = _sweep_tpu(
                nb2, base0, uw_top, psv_w, nsv_w, psv_tgt, nsv_tgt, pre_far,
                tgt, pkidx, nkidx, seglen=cap, window=WINDOW,
            )
            return (
                jnp.concatenate(
                    [u_main, jnp.zeros((B, 1), jnp.int32)], axis=1
                ),  # u[cap] = 0
                choice,
            )

        hi_of = ((idx >> 7) + 1) * _C
        brow_u = (jnp.arange(B, dtype=jnp.int32) * (cap + 1))[:, None]

        def far_mask():
            return (
                psv_ok & (psv_tgt >= hi_of + WINDOW),
                nsv_ok & (nsv_tgt >= hi_of + WINDOW),
            )
    else:
        WINDOW = min(8192, cap)
        # Gathers from a fori_loop CARRY force XLA to copy the whole operand,
        # so u is padded with an INF window tail and every per-chunk read goes
        # through a dynamic_slice window + small-operand gather.
        stride = cap + WINDOW + 1
        stride += (-stride) % 128  # aligned rows
        sidx = jnp.arange(stride, dtype=jnp.int32)[None, :]
        u0 = jnp.where((sidx >= nb) & (sidx <= cap), jnp.int32(0), _INF)
        u0 = jnp.broadcast_to(u0, (B, stride)).astype(jnp.int32)
        num_chunks = cap // chunk
        cidx = jnp.arange(chunk, dtype=jnp.int32)[None, :]
        wrow = (jnp.arange(B, dtype=jnp.int32) * (WINDOW + 1))[:, None]
        lrow = (jnp.arange(B, dtype=jnp.int32) * (chunk + 1))[:, None]
        brow_u = (jnp.arange(B, dtype=jnp.int32) * stride)[:, None]

        def sweep(pre_far, u):
            """One full backward pass over all chunks with far-edge
            contributions frozen in pre_far."""

            def chunk_body(c, u):
                lo = (num_chunks - 1 - c) * chunk
                pw = jax.lax.dynamic_slice(psv_w, (0, lo), (B, chunk))
                nw = jax.lax.dynamic_slice(nsv_w, (0, lo), (B, chunk))
                pt = jax.lax.dynamic_slice(psv_tgt, (0, lo), (B, chunk))
                nt = jax.lax.dynamic_slice(nsv_tgt, (0, lo), (B, chunk))
                pos = lo + cidx
                act = (pos >= 1) & (pos < nb)
                rest = jnp.where(pos >= nb, 0, _INF)
                hi = lo + chunk
                # u[hi : hi + WINDOW + 1]: everything a near edge can reach.
                win = jax.lax.dynamic_slice(u, (0, hi), (B, WINDOW + 1))
                boundary = win[:, :1]

                qw = jnp.concatenate(
                    [
                        wrow + jnp.clip(pt - hi, 0, WINDOW),
                        wrow + jnp.clip(nt - hi, 0, WINDOW),
                    ],
                    axis=1,
                )
                g = win.reshape(-1)[qw]
                p_near = (pt >= hi) & (pt - hi <= WINDOW)
                n_near = (nt >= hi) & (nt - hi <= WINDOW)
                pre = jnp.minimum(
                    jnp.where(p_near, pw + g[:, :chunk], _INF),
                    jnp.where(n_near, nw + g[:, chunk:], _INF),
                )
                pre = jnp.minimum(
                    pre, jax.lax.dynamic_slice(pre_far, (0, lo), (B, chunk))
                )
                p_in = pt < hi
                n_in = nt < hi
                ptl = jnp.where(p_in, pt - lo, chunk)
                ntl = jnp.where(n_in, nt - lo, chunk)
                pw_in = jnp.where(p_in, pw, _INF)
                nw_in = jnp.where(n_in, nw, _INF)

                def lgat(ul, j):
                    return ul.reshape(-1)[lrow + j]

                def relax(state):
                    ul, _, it = state
                    v = jnp.minimum(
                        pre,
                        jnp.minimum(
                            pw_in + lgat(ul, ptl), nw_in + lgat(ul, ntl)
                        ),
                    )
                    v = jnp.where(act, v, rest)
                    vv = jnp.concatenate([v, boundary], axis=1)
                    new_ul = jax.lax.cummin(vv, axis=1, reverse=True)
                    new_ul = jnp.concatenate(
                        [jnp.where(act, new_ul[:, :chunk], rest), boundary],
                        axis=1,
                    )
                    return new_ul, ul, it + 1

                def cond(state):
                    ul, prev, it = state
                    return jnp.any(ul != prev) & (it <= chunk)

                ul0 = jnp.concatenate(
                    [jnp.full((B, chunk), _INF, jnp.int32), boundary], axis=1
                )
                state = relax((ul0, ul0, jnp.int32(0)))
                ul, _, _ = jax.lax.while_loop(cond, relax, state)
                return jax.lax.dynamic_update_slice(u, ul[:, :chunk], (0, lo))

            return jax.lax.fori_loop(0, num_chunks, chunk_body, u0)

        hi_of = (idx // chunk + 1) * chunk

        def far_mask():
            return (
                psv_ok & (psv_tgt - hi_of > WINDOW),
                nsv_ok & (nsv_tgt - hi_of > WINDOW),
            )

    pre_far0 = jnp.full((B, cap), _INF, jnp.int32) + (psv_w - psv_w)
    if use_pallas:
        # ---- in-kernel far path prep: label far sources with their run id
        # and compact the run-head targets (a run = consecutive positions
        # whose far edge shares one target — a maximal repeat). The two
        # compaction sorts only run when far edges exist at all.
        p_far, n_far = far_mask()
        any_far = jnp.any(p_far | n_far)

        def _run_heads(farm, tgt):
            tv = jnp.where(farm, tgt, -7)
            prev = jnp.concatenate(
                [jnp.full((B, 1), -8, jnp.int32), tv[:, :-1]], axis=1
            )
            return farm & (tv != prev)

        ptgt_a = idx + psv_len
        ntgt_a = idx + nsv_len
        hp = _run_heads(p_far, ptgt_a)
        hn = _run_heads(n_far, ntgt_a)
        rp = jnp.sum(hp.astype(jnp.int32), axis=1)
        rn = jnp.sum(hn.astype(jnp.int32), axis=1)
        fits = jnp.max(rp + rn) <= _KF
        use_kidx = any_far & fits
        slot_iota_f = jnp.broadcast_to(idx, (B, cap)) + (psv_w - psv_w)
        flagbit = jnp.int32(1 << 26)

        def _prep(_):
            _, plist = jax.lax.sort(
                (jnp.where(hp, slot_iota_f, slot_iota_f | flagbit), ptgt_a),
                num_keys=1, dimension=1,
            )
            _, nlist = jax.lax.sort(
                (jnp.where(hn, slot_iota_f, slot_iota_f | flagbit), ntgt_a),
                num_keys=1, dimension=1,
            )
            kf = jnp.arange(_KF, dtype=jnp.int32)[None, :]
            from_n = jnp.take_along_axis(
                nlist[:, :_KF], jnp.clip(kf - rp[:, None], 0, _KF - 1), axis=1
            )
            tgt_list = jnp.where(
                kf < rp[:, None],
                plist[:, :_KF],
                jnp.where(kf < (rp + rn)[:, None], from_n, -1),
            )
            ridp = jnp.cumsum(hp.astype(jnp.int32), axis=1) - 1
            ridn = jnp.cumsum(hn.astype(jnp.int32), axis=1) - 1
            kidx_p = jnp.where(p_far, ridp, -1)
            kidx_n = jnp.where(n_far, rp[:, None] + ridn, -1)
            return tgt_list, kidx_p, kidx_n

        def _noprep(_):
            return (
                jnp.full((B, _KF), -1, jnp.int32),
                jnp.full((B, cap), -1, jnp.int32),
                jnp.full((B, cap), -1, jnp.int32),
            )

        tgt_list, kidx_p, kidx_n = jax.lax.cond(use_kidx, _prep, _noprep, 0)
        u, choice = sweep(pre_far0, tgt_list, kidx_p, kidx_n)
    else:
        u = sweep(pre_far0, None)
        choice = None

    active = (idx >= 1) & (idx < nb)

    def cost_of(u):
        """Exact costs from the potential: cost[p] = u[p] + 9*(n-p)."""
        idx1 = jnp.arange(cap + 1, dtype=jnp.int32)[None, :]
        u_main = jax.lax.slice(u, (0, 0), (B, cap + 1))
        cost = jnp.where(
            (idx1 >= 1) & (idx1 <= nb), u_main + 9 * (nb - idx1), 0
        ).astype(jnp.int32)
        return cost.at[:, 0].set(0)

    def select_gather(u):
        """Reference-tie-exact selection via cost gathers (far-edge path)."""
        cost = cost_of(u)
        crow = (jnp.arange(B, dtype=jnp.int32) * (cap + 1))[:, None]
        cgat = lambda j: cost.reshape(-1)[crow + j]
        # cost[p+1] is a SHIFTED SLICE of cost, never a gather.
        lit_cost = 9 + cost[:, 1:]
        psv_cost = jnp.where(
            psv_ok, factor_static_cost(psv_offs, psv_len) + cgat(psv_tgt), _INF
        )
        nsv_cost = jnp.where(
            nsv_ok, factor_static_cost(nsv_offs, nsv_len) + cgat(nsv_tgt), _INF
        )
        take_psv = psv_cost < lit_cost
        best = jnp.where(take_psv, psv_cost, lit_cost)
        offs = jnp.where(take_psv, psv_offs, 0)
        length = jnp.where(take_psv, psv_len, 1)
        take_nsv = nsv_cost < best
        offs = jnp.where(take_nsv, nsv_offs, offs)
        length = jnp.where(take_nsv, nsv_len, length)
        offs = jnp.where(active, offs, 0)
        length = jnp.where(active, length, 1)
        return offs, length, cost

    def select_from_choice(u, choicemap):
        """Selection from the kernel's in-VMEM choice map — no gathers."""
        cost = cost_of(u)
        offs = jnp.where(
            choicemap == 1, psv_offs, jnp.where(choicemap == 2, nsv_offs, 0)
        )
        length = jnp.where(
            choicemap == 1, psv_len, jnp.where(choicemap == 2, nsv_len, 1)
        )
        offs = jnp.where(active, offs, 0)
        length = jnp.where(active, length, 1)
        return offs, length, cost

    if WINDOW >= cap:
        if use_pallas:
            return select_from_choice(u, choice)
        return select_gather(u)

    # Ultra-far edges (factor length > WINDOW): the pallas path has already
    # resolved them in-kernel when the run-head targets fit _KF slots
    # (use_kidx); the segmented re-sweep below remains as the exact fallback
    # for adversarial inputs with more than _KF far runs. The XLA path uses
    # asynchronous value iteration — recompute far contributions against the
    # latest u and re-sweep until no far edge improves any position (u
    # decreases monotonically and every sweep fully relaxes all near edges,
    # so the loop terminates at the exact DP fixpoint).
    if not use_pallas:
        p_far, n_far = far_mask()
        any_far = jnp.any(p_far | n_far)

    def far_branch(_):
        """Whole-block value iteration (backend-generic XLA path)."""

        def far_pre(u):
            q = jnp.concatenate([brow_u + psv_tgt, brow_u + nsv_tgt], axis=1)
            g = u.reshape(-1)[q]
            return jnp.minimum(
                jnp.where(p_far, psv_w + g[:, :cap], _INF),
                jnp.where(n_far, nsv_w + g[:, cap:], _INF),
            )

        def improves(pre_far, u):
            ucur = jax.lax.slice(u, (0, 0), (B, cap))
            return jnp.any(pre_far < ucur)

        def outer_cond(state):
            u, pre_far, go, it = state
            return go & (it < cap // WINDOW + 3)

        def outer_body(state):
            u, pre_far, _, it = state
            new_u = sweep(pre_far, None)
            new_pre = far_pre(new_u)
            return new_u, new_pre, improves(new_pre, new_u), it + 1

        pre1 = far_pre(u)
        u_f, _, _, _ = jax.lax.while_loop(
            outer_cond, outer_body, (u, pre1, improves(pre1, u), jnp.int32(0))
        )
        return select_gather(u_f)

    def far_branch_pallas(_):
        """Exact far-edge resolution one WINDOW-sized segment at a time.

        All edges point forward, and a "far" edge's target is >= its
        sub-chunk end + WINDOW — with segcap == WINDOW that is STRICTLY
        above the segment end. So sweeping WINDOW-sized segments back to
        front makes every far contribution final at gather time: one small
        gather + one sweep per segment, no value iteration anywhere. (The
        previous version used 8 large segments whose INTRA-segment far
        chains — license corpora repeat every few tens of KiB — cost
        hundreds of re-sweeps; before that, whole-block re-sweeps iterated
        to the global chain depth and ran long enough to get the TPU worker
        killed.)"""
        segcap = WINDOW  # = min(window, cap), a multiple of _SUP by contract
        SEGS = cap // segcap
        ext = cap + 1 + WINDOW
        brow_ext = (jnp.arange(B, dtype=jnp.int32) * ext)[:, None]
        u_ext0 = jnp.concatenate(
            [u, jnp.full((B, WINDOW), _INF, jnp.int32)], axis=1
        )

        def seg_step(sj, u_ext):
            lo = (SEGS - 1 - sj) * segcap
            basej = jnp.full((B, 1), lo, jnp.int32)
            pw_s = jax.lax.dynamic_slice(psv_w, (0, lo), (B, segcap))
            nw_s = jax.lax.dynamic_slice(nsv_w, (0, lo), (B, segcap))
            pt_s = jax.lax.dynamic_slice(psv_tgt, (0, lo), (B, segcap))
            nt_s = jax.lax.dynamic_slice(nsv_tgt, (0, lo), (B, segcap))
            pf_s = jax.lax.dynamic_slice(p_far, (0, lo), (B, segcap))
            nf_s = jax.lax.dynamic_slice(n_far, (0, lo), (B, segcap))
            q = jnp.concatenate([brow_ext + pt_s, brow_ext + nt_s], axis=1)
            g = u_ext.reshape(-1)[q]
            pre_s = jnp.minimum(
                jnp.where(pf_s, pw_s + g[:, :segcap], _INF),
                jnp.where(nf_s, nw_s + g[:, segcap:], _INF),
            )
            uw = jax.lax.dynamic_slice(u_ext, (0, lo + segcap), (B, WINDOW))
            useg, _ = _sweep_tpu(
                nb2, basej, uw, pw_s, nw_s, pt_s, nt_s, pre_s,
                jnp.full((B, _KF), -1, jnp.int32),
                jnp.full((B, segcap), -1, jnp.int32),
                jnp.full((B, segcap), -1, jnp.int32),
                seglen=segcap, window=WINDOW,
            )
            return jax.lax.dynamic_update_slice(u_ext, useg, (0, lo))

        u_ext = jax.lax.fori_loop(0, SEGS, seg_step, u_ext0)
        return select_gather(u_ext[:, : cap + 1])

    def near_branch(_):
        if use_pallas:
            return select_from_choice(u, choice)
        return select_gather(u)

    if use_pallas:
        # Far edges were handled in-kernel unless the run count overflowed
        # _KF (use_kidx False with far edges present) — only then re-sweep.
        return jax.lax.cond(
            any_far & ~fits, far_branch_pallas, near_branch, 0
        )
    return jax.lax.cond(any_far, far_branch, near_branch, 0)


def optimal_parse_chunked(
    psv_offs, psv_len, nsv_offs, nsv_len, n, *, cap: int, chunk: int = 512
):
    """Single-block wrapper over the batch-native chunked DP."""
    offs, length, cost = optimal_parse_chunked_batch(
        psv_offs[None],
        psv_len[None],
        nsv_offs[None],
        nsv_len[None],
        jnp.asarray(n)[None],
        cap=cap,
        chunk=chunk,
    )
    return offs[0], length[0], cost[0]
