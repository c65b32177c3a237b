"""Cost-optimal parse selection (the reference's backward DP, salz.c:610-662).

Two implementations with identical results:

* `optimal_parse_sequential` — a literal backward `lax.fori_loop`. O(n) serial
  steps; exact by construction. This is the conformance baseline and the CPU
  test path.

* `optimal_parse_chunked` — the TPU-native formulation: process the text in
  chunks from the back; inside a chunk, iterate a vectorized
  Bellman-Ford/suffix-min fixpoint until costs stop changing. The DP values
  are a unique fixpoint, so at convergence the chosen factors (with the
  reference's strict literal < PSV < NSV tie order) are identical to the
  sequential result. Each fixpoint round is dense vector work (VPU-friendly);
  the number of rounds adapts to the data (chains of dependent short factors).

Costs fit int32: total <= 9 * (16 MiB) < 2^31.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from salz_tpu.format import FACTOR_LENGTH_MIN, VNIBBLE_THRESHOLDS

# Large-but-safe sentinel: INF + INF and INF + real cost must stay < 2^31
# (they appear transiently in the chunked fixpoint before convergence).
_INF = jnp.int32(2**28)
_INT_INF = 2**28  # plain-int twin for Pallas kernels (no captured consts)


def _fixpoint_kernel(
    pre_ref, pw_ref, nw_ref, ptl_ref, ntl_ref, rest_ref, act_ref, bnd_ref,
    out_ref, *, chunk: int
):
    """In-chunk DP fixpoint (see optimal_parse_chunked_batch) as one kernel.

    The fixpoint needs ~depth-of-the-in-chunk-factor-chains rounds (tens per
    chunk, ~n/15 total per block); at XLA op-dispatch granularity each round
    costs ~100us, in-kernel ~0.5us. Chunk-local gathers decompose into
    chunk/128 Mosaic lane gathers + selects.
    """
    W = chunk // 128
    pre = pre_ref[:]
    pw = pw_ref[:]
    nw = nw_ref[:]
    ptl = ptl_ref[:]
    ntl = ntl_ref[:]
    rest = rest_ref[:]
    act = act_ref[:] != 0
    bnd = bnd_ref[:]  # (B, 1) boundary value u[hi]
    B = pre.shape[0]

    def wgather(ul, j):
        # ul (B, chunk); j in [0, chunk], j == chunk -> boundary value.
        # Mosaic lane gathers need table and indices of identical (r, 128)
        # shape: repeat each 128-lane tile W times along sublanes and gather
        # with the reshaped per-tile indices, then select by tile id.
        # Mosaic lane gathers need table and indices of IDENTICAL (B, 128)
        # shape, so decompose into W source tiles x W index column-groups.
        lane = j & 127
        tile = j >> 7
        groups = []
        for wj in range(W):
            sl = slice(128 * wj, 128 * (wj + 1))
            g_out = jnp.broadcast_to(bnd, (B, 128))
            for w in range(W):
                cand = jnp.take_along_axis(
                    ul[:, 128 * w : 128 * (w + 1)], lane[:, sl], axis=1
                )
                g_out = jnp.where(tile[:, sl] == w, cand, g_out)
            groups.append(g_out)
        return jnp.concatenate(groups, axis=1)

    def suffmin(v):
        # Backward running min over lanes, then fold in the boundary seed.
        s = v
        h = 1
        while h < chunk:
            shifted = jnp.concatenate(
                [s[:, h:], jnp.full((B, h), _INT_INF, jnp.int32)], axis=1
            )
            s = jnp.minimum(s, shifted)
            h *= 2
        return jnp.minimum(s, bnd)

    def relax(state):
        ul, _, it = state
        v = jnp.minimum(
            pre, jnp.minimum(pw + wgather(ul, ptl), nw + wgather(ul, ntl))
        )
        v = jnp.where(act, v, rest)
        new = jnp.where(act, suffmin(v), rest)
        return new, ul, it + 1

    def cond(state):
        ul, prev, it = state
        return jnp.any(ul != prev) & (it <= chunk)

    ul0 = jnp.full((B, chunk), _INT_INF, jnp.int32)
    state = relax((ul0, ul0, jnp.int32(0)))
    out_ref[:] = jax.lax.while_loop(cond, relax, state)[0]


def _fixpoint_tpu(pre, pw_in, nw_in, ptl, ntl, rest, act, boundary, chunk):
    B = pre.shape[0]
    return pl.pallas_call(
        functools.partial(_fixpoint_kernel, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((B, chunk), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(pre, pw_in, nw_in, ptl, ntl, rest, act.astype(jnp.int32), boundary)


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

        pl = psv_len[p]
        pc = jnp.where(
            psv_ok[p], psv_static[p] + cost[jnp.clip(p + pl, 0, cap)], _INF
        )
        take = pc < best_cost
        best_cost = jnp.where(take, pc, best_cost)
        best_offs = jnp.where(take, psv_offs[p], best_offs)
        best_len = jnp.where(take, pl, best_len)

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


@functools.partial(jax.jit, static_argnames=("cap", "chunk"))
def optimal_parse_chunked_batch(
    psv_offs, psv_len, nsv_offs, nsv_len, n, *, cap: int, chunk: int = 512
):
    """Vectorized chunked-fixpoint DP over a BATCH of blocks; identical
    results to the per-block sequential DP.

    Works on u[p] = cost[p] - 9*(n - p) (the literal-chain potential), so the
    literal edge becomes u[p] = min(u[p+1], ...) — a suffix min — and each
    factor edge a gather. Chunks are processed back to front. Per chunk, the
    contributions of factor edges that LEAVE the chunk are gathered once
    (their targets are already final); the in-chunk fixpoint then iterates on
    (B, chunk) tiles only. The DP values are a unique fixpoint over a forward
    DAG, so at convergence the chosen factors (with the reference's strict
    literal < PSV < NSV tie order) are identical to the sequential result.

    Batch-native on purpose: all gathers are FLAT 1-D gathers with per-block
    base offsets — XLA lowers batched (vmapped) gathers an order of magnitude
    slower on TPU. Inputs are (B, cap) arrays and n is (B,).
    """
    assert cap % chunk == 0
    B = psv_offs.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    nb = n[:, None]

    # Gathers from a fori_loop CARRY force XLA to copy the whole operand
    # (measured ~650us/chunk regardless of gather size), so the u array is
    # padded with an INF window tail and every per-chunk read goes through a
    # dynamic_slice window + small-operand gather (~44us/chunk). Edges whose
    # targets fall beyond the window (factor length > WINDOW — needs repeats
    # longer than the window) are handled by an exact outer value-iteration
    # sweep below; WINDOW >= cap degenerates to a single sweep.
    WINDOW = min(8192, cap)
    stride = cap + WINDOW + 1
    stride += (-stride) % 128  # aligned rows
    brow = (jnp.arange(B, dtype=jnp.int32) * stride)[:, None]

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

    # u over [0, cap] per block (padded to `stride`): u[p] = cost[p] - 9*(n-p)
    # for p in [1, n); u[p >= n] = 0; the pad tail stays INF and is never a
    # legal target (targets are clipped to cap).
    sidx = jnp.arange(stride, dtype=jnp.int32)[None, :]
    u0 = jnp.where((sidx >= nb) & (sidx <= cap), jnp.int32(0), _INF)
    u0 = jnp.broadcast_to(u0, (B, stride)).astype(jnp.int32)

    num_chunks = cap // chunk
    cidx = jnp.arange(chunk, dtype=jnp.int32)[None, :]
    use_pallas = jax.default_backend() == "tpu" and chunk % 128 == 0
    wrow = (jnp.arange(B, dtype=jnp.int32) * (WINDOW + 1))[:, None]
    lrow = (jnp.arange(B, dtype=jnp.int32) * (chunk + 1))[:, None]

    def sweep(pre_far, u):
        """One full backward pass over all chunks with far-edge contributions
        frozen in pre_far (exact when no admissible edge exceeds WINDOW)."""

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

            # Near crossing edges: hi <= target <= hi + WINDOW (final),
            # gathered from the small window operand in one fused gather.
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
            # In-chunk local targets (index into the chunk-local u tile of
            # width chunk + 1 whose last column is the boundary value).
            p_in = pt < hi
            n_in = nt < hi
            ptl = jnp.where(p_in, pt - lo, chunk)
            ntl = jnp.where(n_in, nt - lo, chunk)
            pw_in = jnp.where(p_in, pw, _INF)
            nw_in = jnp.where(n_in, nw, _INF)

            if use_pallas:
                ul = _fixpoint_tpu(
                    pre, pw_in, nw_in, ptl, ntl, rest, act, boundary, chunk
                )
                return jax.lax.dynamic_update_slice(u, ul, (0, lo))

            def lgat(ul, j):
                return ul.reshape(-1)[lrow + j]

            def relax(state):
                ul, _, it = state
                v = jnp.minimum(
                    pre,
                    jnp.minimum(pw_in + lgat(ul, ptl), nw_in + lgat(ul, ntl)),
                )
                v = jnp.where(act, v, rest)
                # Backward running min seeded with the boundary value u[hi].
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

        return jax.lax.fori_loop(0, num_chunks, chunk_body, u)

    pre_far0 = jnp.full((B, cap), _INF, jnp.int32) + (psv_w - psv_w)
    u = sweep(pre_far0, u0)

    if WINDOW < cap:
        # Ultra-far edges (factor length > WINDOW): exact asynchronous value
        # iteration — recompute far contributions against the latest u and
        # re-sweep until no far edge improves any position. u decreases
        # monotonically and every sweep fully relaxes all near edges, so the
        # loop terminates at the exact DP fixpoint (typically 0 extra sweeps:
        # it needs a repeat longer than WINDOW to run even once).
        hi_of = (idx // chunk + 1) * chunk
        p_far = psv_ok & (psv_tgt - hi_of > WINDOW)
        n_far = nsv_ok & (nsv_tgt - hi_of > WINDOW)

        def far_pre(u):
            q = jnp.concatenate([brow + psv_tgt, brow + nsv_tgt], axis=1)
            g = u.reshape(-1)[q]
            return jnp.minimum(
                jnp.where(p_far, psv_w + g[:, :cap], _INF),
                jnp.where(n_far, nsv_w + g[:, cap:], _INF),
            )

        any_far = jnp.any(p_far | n_far)

        def improves(pre_far, u):
            ucur = jax.lax.slice(u, (0, 0), (B, cap))
            return jnp.any(pre_far < ucur)

        def outer_cond(state):
            u, pre_far, go, it = state
            return go & (it < cap // WINDOW + 3)

        def outer_body(state):
            u, pre_far, _, it = state
            new_u = sweep(pre_far, u0)
            new_pre = far_pre(new_u)
            return new_u, new_pre, improves(new_pre, new_u), it + 1

        pre1 = jnp.where(any_far, far_pre(u), pre_far0)
        u, _, _, _ = jax.lax.while_loop(
            outer_cond,
            outer_body,
            (u, pre1, any_far & improves(pre1, u), jnp.int32(0)),
        )

    active = (idx >= 1) & (idx < nb)

    # Final selection with exact costs: cost[p] = u[p] + 9*(n-p).
    idx1 = jnp.arange(cap + 1, dtype=jnp.int32)[None, :]
    u_main = jax.lax.slice(u, (0, 0), (B, cap + 1))
    cost = jnp.where(
        (idx1 >= 1) & (idx1 <= nb), u_main + 9 * (nb - idx1), 0
    ).astype(jnp.int32)
    cost = cost.at[:, 0].set(0)

    crow = (jnp.arange(B, dtype=jnp.int32) * (cap + 1))[:, None]
    cgat = lambda j: cost.reshape(-1)[crow + j]
    lit_cost = 9 + cgat(jnp.clip(idx + 1, 0, cap) + jnp.zeros((B, 1), jnp.int32))
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
