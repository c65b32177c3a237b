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

from salz_tpu.format import FACTOR_LENGTH_MIN, VNIBBLE_THRESHOLDS

# Large-but-safe sentinel: INF + INF and INF + real cost must stay < 2^31
# (they appear transiently in the chunked fixpoint before convergence).
_INF = jnp.int32(2**28)


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
def optimal_parse_chunked(
    psv_offs, psv_len, nsv_offs, nsv_len, n, *, cap: int, chunk: int = 512
):
    """Vectorized chunked-fixpoint DP; identical results to the sequential DP.

    Works on u[p] = cost[p] - 9*(n - p) (the literal-chain potential), so the
    literal edge becomes u[p] = min(u[p+1], ...) — a suffix min — and each
    factor edge a gather. Chunks are processed back to front. Per chunk, the
    contributions of factor edges that LEAVE the chunk are gathered once (their
    targets are already final); the in-chunk fixpoint then iterates on
    chunk-sized vectors only — tiny gathers, a suffix cummin, and a
    convergence check — so per-round work is O(chunk), not O(cap). The DP
    values are a unique fixpoint over a forward DAG, so at convergence the
    chosen factors (with the reference's strict literal < PSV < NSV tie order)
    are identical to the sequential result.
    """
    assert cap % chunk == 0
    idx = jnp.arange(cap, dtype=jnp.int32)

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

    # u over [0, cap]: u[p] = cost[p] - 9*(n-p) for p in [1, n); u[p >= n] = 0
    # (only u[n] of those is semantically read; factor targets never exceed n
    # for admissible candidates).
    idx1 = jnp.arange(cap + 1, dtype=jnp.int32)
    u0 = jnp.where(idx1 >= n, jnp.int32(0), _INF)

    num_chunks = cap // chunk
    cidx = jnp.arange(chunk, dtype=jnp.int32)

    def chunk_body(c, u):
        lo = (num_chunks - 1 - c) * chunk
        pw = jax.lax.dynamic_slice(psv_w, (lo,), (chunk,))
        nw = jax.lax.dynamic_slice(nsv_w, (lo,), (chunk,))
        pt = jax.lax.dynamic_slice(psv_tgt, (lo,), (chunk,))
        nt = jax.lax.dynamic_slice(nsv_tgt, (lo,), (chunk,))
        pos = lo + cidx
        act = (pos >= 1) & (pos < n)
        rest = jnp.where(pos >= n, 0, _INF)
        hi = lo + chunk
        boundary = u[jnp.clip(hi, 0, cap)]  # final value at hi

        # Contributions of edges that leave the chunk: targets >= hi are
        # already final, so gather them once (chunk-sized gather).
        p_in = pt < hi
        n_in = nt < hi
        pre = jnp.minimum(
            jnp.where(p_in, _INF, pw + u[pt]),
            jnp.where(n_in, _INF, nw + u[nt]),
        )
        # In-chunk local targets (index into the chunk-local u vector of
        # length chunk + 1 whose last entry is the boundary value).
        ptl = jnp.where(p_in, pt - lo, chunk)
        ntl = jnp.where(n_in, nt - lo, chunk)
        pw_in = jnp.where(p_in, pw, _INF)
        nw_in = jnp.where(n_in, nw, _INF)

        def relax(state):
            ul, _, it = state
            v = jnp.minimum(pre, jnp.minimum(pw_in + ul[ptl], nw_in + ul[ntl]))
            v = jnp.where(act, v, rest)
            # Backward running min seeded with the boundary value u[hi].
            vv = jnp.concatenate([v, boundary[None]])
            new_ul = jax.lax.cummin(vv, reverse=True)
            new_ul = new_ul.at[:chunk].set(
                jnp.where(act, new_ul[:chunk], rest)
            )
            return new_ul, ul, it + 1

        def cond(state):
            ul, prev, it = state
            return jnp.any(ul != prev) & (it <= chunk)

        ul0 = jnp.full(chunk + 1, _INF, jnp.int32).at[chunk].set(boundary)
        state = relax((ul0, ul0, jnp.int32(0)))
        ul, _, _ = jax.lax.while_loop(cond, relax, state)
        return jax.lax.dynamic_update_slice(u, ul[:chunk], (lo,))

    u = jax.lax.fori_loop(0, num_chunks, chunk_body, u0)
    active = (idx >= 1) & (idx < n)

    # Final selection with exact costs: cost[p] = u[p] + 9*(n-p).
    cost = jnp.where(
        (jnp.arange(cap + 1) >= 1) & (jnp.arange(cap + 1) <= n),
        u + 9 * (n - jnp.arange(cap + 1)),
        0,
    ).astype(jnp.int32)
    cost = cost.at[0].set(0)

    lit_cost = 9 + cost[jnp.clip(idx + 1, 0, cap)]
    psv_cost = jnp.where(
        psv_ok, factor_static_cost(psv_offs, psv_len) + cost[psv_tgt], _INF
    )
    nsv_cost = jnp.where(
        nsv_ok, factor_static_cost(nsv_offs, nsv_len) + cost[nsv_tgt], _INF
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
