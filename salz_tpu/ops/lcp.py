"""Adjacent-suffix LCPs and PSV/NSV candidate lengths, slot-order TPU path.

TPU-parallel replacement for the reference's sequential seeded LCP scan
(salz.c:492-514 + the prev_len-1 skip at salz.c:524,530). Pipeline:

  1. `adjacent_lcp_batch` — lcp_adj[k] = LCP(sa[k-1], sa[k]) for every SA
     slot k. The first 16 bytes of both suffixes arrive as SLOT-ORDER payloads
     of the suffix-array sort (salz_tpu/ops/suffix_array.py), so pairs with
     LCP < 16 are resolved by SHIFTED-SLICE compares — zero gathers. The
     survivors either fit a cap/128 bucket (text/binary: ~0.6%) and run one
     exact dynamic-depth checkpoint descent there, or — survivor-heavy blocks
     (long-repeat corpora: 56-68%) — take the Φ/PLCP irreducible-LCP path:
     descend ONLY the irreducible survivors (Φ(i) != Φ(i-1)+1), then fill
     every reducible position with the exact identity PLCP[i] = PLCP[i-1]-1
     via one cummax scan in text order. Batch-level lax.cond ladders pick the
     narrowest bucket; a full-width descent remains as the exactness
     backstop.

  2. `candidate_lengths_slot_batch` — psv_len/nsv_len per SA slot k via the
     LCP-interval identity: LCP(sa[k], sa[lslot[k]]) = min lcp_adj(lslot[k],
     k]. Most ranges lie within k's own 128-slot row (the same locality the
     ANSV in-row kernel exploits), so a Pallas kernel answers them with
     row-local sparse tables and lane gathers; row-crossing ranges are
     compacted and answered by a two-level decomposition (row suffix/prefix
     minima + a sparse table over per-row minima) — no O(cap log cap) global
     RMQ table is ever materialized.

The results equal the reference's factorize() values exactly: its seeded
compare returns the true LCP capped at n - max(i, j) (FORMAT.md §1.7), and
both identities above compute precisely that.

Everything is BATCH-NATIVE: (B, cap) arrays, flat 1-D gathers with per-block
offsets, batch-level conds (vmapped gathers/conds are far slower on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from salz_tpu.ops.rowops import LOGW as _RLOGW
from salz_tpu.ops.rowops import T as _T
from salz_tpu.ops.rowops import W as _RW
from salz_tpu.ops.rowops import Row512, pick_br

_INF = np.int32(2**30)  # np, not jnp: device-array consts cost ~24 s/lowering via axon
_INT_INF = 2**30
_C = 128
_LOGC = 7

#: test hook: run the range-min Pallas kernel in interpret mode on CPU
_FORCE_INTERPRET = False


# ---------------------------------------------------------------------------
# arbitrary-pair LCP (conformance/test utility; the pipeline uses the
# adjacent+range-min identity below)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cap",))
def pair_lcp(
    ckpt: jax.Array, t32: jax.Array, n: jax.Array, i: jax.Array, j: jax.Array,
    *, cap: int,
):
    """LCP of suffix pairs (i[k], j[k]) of text[:n].

    Args:
      ckpt: int32[ckpt_rows, cap] rank-checkpoint ladder, row r = prefix
            16*4^r
            (suffix_array_with_ranks output).
      t32: int32[4, cap] packed text windows +0..3 .. +12..15
            (suffix_array_prefixes output).
      i, j: int32[cap] suffix start positions; entries with i<0 or j<0 yield 0.
    Returns:
      int32[cap] match lengths (capped at n - max(i, j) by construction).
    """
    rows = int(ckpt.shape[0])
    valid = (i >= 0) & (j >= 0)
    iv = jnp.clip(i, 0, cap - 1)
    jv = jnp.clip(j, 0, cap - 1)
    l = jnp.zeros(i.shape, jnp.int32)
    # Radix-4 ladder: row r holds ranks of the 16*4^r-prefix, so each row
    # is probed up to THREE times (remainder after the row above is < 4h).
    for r in range(rows - 1, -1, -1):
        h = jnp.int32(1 << (2 * r + 4))
        for _ in range(3):
            a = iv + l
            b = jv + l
            fits = (a + h <= n) & (b + h <= n)
            ra = ckpt[r][jnp.clip(a, 0, cap - 1)]
            rb = ckpt[r][jnp.clip(b, 0, cap - 1)]
            l = jnp.where(valid & fits & (ra == rb), l + h, l)
    # Resolve the sub-16-byte remainder by direct text probes.
    tail = _tail16(
        t32.reshape(4, -1), jnp.full((1, 1), n, jnp.int32),
        jnp.zeros((1, 1), jnp.int32), iv[None, :], jv[None, :], l[None, :],
        valid[None, :], cap=cap,
    )[0]
    return jnp.where(valid, l + tail, 0)


# ---------------------------------------------------------------------------
# adjacent-pair LCP array (slot order)
# ---------------------------------------------------------------------------


def _match32(x, y):
    """Per-element match length (0..4 bytes) of two BE-packed u32 words."""
    return jnp.minimum(jax.lax.clz(x ^ y) >> 3, 4)  # clz(0) = 32 -> 4


def _descend_ladder(ckpt, rmax, nb, vrow, a, b, l0, vmask, *, cap: int):
    """Exact radix-4 checkpoint-ladder descent with a DYNAMIC top row: for
    row r from rmax-2 down to 0, add h = 16*4^r up to THREE times while the
    ranks at (a+l, b+l) agree (the remainder entering row r is < 4h because
    the row above failed or does not exist; 3h + lower rows cover it). The
    trip count adapts to the data (rmax = filled-row count; the top filled
    row is all-distinct so any match is < its prefix length). Resolves down
    to a remainder < 16 (finish with _tail16)."""
    B, m = a.shape
    Bc = ckpt.shape[0]  # TRUE block count — a/vrow may be a pooled (1, MG)
    # cross-block bucket whose vrow entries address any block's row, so the
    # slice must cover every block, not a.shape[0] rows.

    def body(t, l):
        r = rmax - 2 - t
        tab = jax.lax.dynamic_slice(
            ckpt, (0, r, 0), (Bc, 1, ckpt.shape[2])
        ).reshape(-1)
        h = jnp.int32(1) << (2 * r + 4)
        for _ in range(3):
            ai = a + l
            bi = b + l
            fits = vmask & (ai + h <= nb) & (bi + h <= nb)
            q = jnp.concatenate(
                [
                    vrow + jnp.clip(ai, 0, cap - 1),
                    vrow + jnp.clip(bi, 0, cap - 1),
                ],
                axis=1,
            )
            g = tab[q]
            l = jnp.where(fits & (g[:, :m] == g[:, m:]), l + h, l)
        return l

    return jax.lax.fori_loop(0, jnp.maximum(rmax - 1, 0), body, l0)


def _tail16(t32f, nb, vrow, a, b, l, vmask, *, cap: int):
    """Exact min(remaining LCP, 16) by direct text probes at offset l.

    t32f: (4, B*cap) flat packed-byte tables (bytes x..x+3 .. x+12..x+15)."""
    m = a.shape[1]
    ai = a + l
    bi = b + l
    q = jnp.concatenate(
        [vrow + jnp.clip(ai, 0, cap - 1), vrow + jnp.clip(bi, 0, cap - 1)],
        axis=1,
    )
    match = jnp.zeros((a.shape[0], m), jnp.int32)
    run = jnp.ones((a.shape[0], m), jnp.bool_)
    for w in range(4):
        gw = t32f[w][q]
        mw = _match32(gw[:, :m], gw[:, m:])
        match = match + jnp.where(run, mw, 0)
        run = run & (mw == 4)
    limit = nb - jnp.maximum(ai, bi)
    return jnp.where(vmask, jnp.clip(jnp.minimum(match, limit), 0, 16), 0)


@functools.partial(jax.jit, static_argnames=("cap",))
def adjacent_lcp_batch(
    ckpt: jax.Array,
    n_levels: jax.Array,
    n: jax.Array,
    sa: jax.Array,
    t32: jax.Array,
    p32: jax.Array,
    *,
    cap: int,
):
    """lcp_adj int32[B, cap] in SLOT order: entry k = LCP(sa[k-1], sa[k]) for
    k in [1, n); entries outside are 0.

    Pairs with LCP < 32 are resolved by shifted-slice compares of the carried
    32-byte prefixes — zero gathers. Survivors are compacted into a static
    bucket (two sizes, cond on the count) and run ONE exact dynamic-depth
    ladder descent: the top filled row's ranks are all-distinct, so any
    match is below its prefix length and resolves exactly — no saturation
    or escalation machinery. A 16-byte text probe finishes the remainder.

    Args:
      ckpt: int32[B, R, cap] radix-4 rank-checkpoint ladder (row r =
        prefix 16*4^r).
      n_levels: int32[B] filled ladder-row counts.
      sa: int32[B, cap] suffix arrays.
      t32: int32[B, 2, cap] text-order packed byte windows (+0..3 / +4..7).
      p32: int32[B, 8, cap] slot-order packed 32-byte suffix prefixes.
    """
    B = sa.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    nb = n[:, None]
    vrow = (jnp.arange(B, dtype=jnp.int32) * cap)[:, None]
    t32f = t32.transpose(1, 0, 2).reshape(4, -1)
    rmax = jnp.max(n_levels)  # filled rows; top filled row all-distinct

    a_base = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), sa[:, :-1]], axis=1)
    b_base = sa
    valid_k = (idx >= 1) & (idx < nb)
    limit = nb - jnp.maximum(a_base, b_base)

    # ---- free 32-byte compare: adjacent pairs differ by ONE slot, so both
    # sides of every compare are shifted slices of the carried prefixes.
    def _adj(w):  # value of word w at slot k-1
        return jnp.concatenate([jnp.zeros((B, 1), jnp.int32), w[:, :-1]], axis=1)

    l32 = jnp.zeros((B, cap), jnp.int32)
    run = jnp.ones((B, cap), jnp.bool_)
    for w in range(8):
        mw = _match32(_adj(p32[:, w, :]), p32[:, w, :])
        l32 = l32 + jnp.where(run, mw, 0)
        run = run & (mw == 4)
    lcp_free = jnp.where(valid_k, jnp.minimum(l32, limit), 0)

    survivor = valid_k & (l32 >= 32) & (limit > 32)
    count = jnp.sum(survivor.astype(jnp.int32), axis=1)
    B_ = survivor.shape[0]
    off_sv = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(count)])
    # pooled tiny bucket, sized by the BATCH total (~0.6-1.4% survivors
    # measured on source/binary corpora)
    M_TINY = max(B_ * cap // 128, 1024)

    slot_iota = jnp.broadcast_to(idx, (B, cap)) + (sa - sa)
    flagbit = jnp.int32(1 << 26)

    def _resolve(qa, qb, vmask, vrow_=None, nb_=None):
        # vrow_/nb_ override the per-block row bases with PER-ELEMENT ones
        # for the cross-block pooled buckets (same trick as ansv_tpu's
        # global pools: a rung sized by the batch TOTAL instead of the max).
        vr = vrow if vrow_ is None else vrow_
        nn = nb if nb_ is None else nb_
        l0 = jnp.where(vmask, jnp.full(qa.shape, 32, jnp.int32), 0)
        l1 = _descend_ladder(ckpt, rmax, nn, vr, qa, qb, l0, vmask, cap=cap)
        return l1 + _tail16(t32f, nn, vr, qa, qb, l1, vmask, cap=cap)

    def tiny_path(_):
        """Few survivors overall: compact them into ONE cross-block pooled
        bucket (sized by the batch total — a per-block bucket gated on the
        max let one skewed block force the Φ/PLCP machinery on everyone)
        and descend."""
        _, qk_all, qa_all, qb_all = jax.lax.sort(
            (
                jnp.where(survivor, 0, 1).astype(jnp.int32), slot_iota,
                a_base, b_base,
            ),
            num_keys=1,
            dimension=1,
        )
        g = jnp.arange(M_TINY, dtype=jnp.int32)
        bq = jnp.clip(
            jnp.searchsorted(off_sv[1:], g, side="right").astype(jnp.int32),
            0, B - 1,
        )
        li = g - off_sv[bq]
        validg = (g < off_sv[B])[None, :]
        gsrc = bq * cap + jnp.clip(li, 0, cap - 1)
        qk = jnp.clip(qk_all.reshape(-1)[gsrc], 0, cap - 1)
        qa = qa_all.reshape(-1)[gsrc][None, :]
        qb = qb_all.reshape(-1)[gsrc][None, :]
        l1 = _resolve(
            qa, qb, validg,
            vrow_=(bq * cap)[None, :], nb_=n[bq][None, :],
        )
        flat = jnp.where(validg[0], bq * cap + qk, B * cap)
        return (
            lcp_free.reshape(-1)
            .at[flat]
            .set(l1[0], mode="drop")
            .reshape(B, cap)
        )

    def plcp_path(_):
        """Survivor-heavy blocks: the Φ/PLCP irreducible-LCP decomposition.

        lcp_adj[k] = PLCP[sa[k]] with PLCP[i] = LCP(i, Φ(i)), Φ(i) =
        sa[rank(i)-1]. PLCP is REDUCIBLE at i when Φ(i) = Φ(i-1)+1 AND
        PLCP[i-1] >= 1, and then PLCP[i] = PLCP[i-1] - 1 EXACTLY (the
        mismatching byte pair — or the n-truncation — shifts by one;
        Kärkkäinen-Manzini-Puglisi). When PLCP[i-1] = 0 the mismatching
        pair is NOT part of the shifted comparison and PLCP[i] is
        unconstrained, so such positions must be descended like
        irreducible ones. A reducible SURVIVOR's predecessor can only be
        (a) another survivor — filled value >= 32 >= 1, chain valid — or
        (b) a known non-survivor, whose exact value v must satisfy
        v - 1 = PLCP[i] >= 32 if the identity held, impossible for
        v < 32 unless v = 0 with the identity void; so the extra descent
        set is exactly {survivors whose predecessor is a non-survivor}.
        Only irreducible survivors (plus that boundary set) need a
        checkpoint descent; every other reducible position follows from
        the monotone identity PLCP[i]+i = max_{known j<=i}(PLCP[j]+j) —
        one cummax. On long-repeat corpora (56-68% of adjacent pairs share
        >= 32 bytes, BIGCAP_TPU.md) the irreducible fraction is tiny,
        collapsing the dominant full-width descent to a narrow bucket at
        the cost of three extra sorts.
        """
        in_text = idx < nb
        # Text-order views via one sort keyed by sa (a permutation):
        # rank_t[i] = SA slot of suffix i, phi_t[i] = sa[rank_t[i]-1],
        # free_t/surv_t = slot-order values carried to text order.
        _, rank_t, phi_t, free_t, surv_t = jax.lax.sort(
            (b_base, slot_iota, a_base, lcp_free, survivor.astype(jnp.int32)),
            num_keys=1,
            dimension=1,
        )
        surv_tb = surv_t == 1  # implies rank_t >= 1 and i, phi_t < n
        has_phi = (rank_t > 0) & in_text
        phi_prev = jnp.concatenate(
            [jnp.full((B, 1), -2, jnp.int32), phi_t[:, :-1]], axis=1
        )
        has_phi_prev = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.bool_), has_phi[:, :-1]], axis=1
        )
        red = has_phi & has_phi_prev & (phi_t == phi_prev + 1)
        # Chain-boundary guard (see docstring): a reducible survivor whose
        # predecessor is a NON-survivor sits on a void identity (the only
        # consistent predecessor value is 0) — descend it like an
        # irreducible one. Position 0 is covered by red[0] = False.
        prev_nonsurv = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.bool_), (~surv_tb)[:, :-1]], axis=1
        )
        need = surv_tb & (~red | prev_nonsurv)
        cnt_ir = jnp.sum(need.astype(jnp.int32), axis=1)
        off_ir = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt_ir)]
        )

        fused = jnp.where(need, slot_iota, slot_iota | flagbit)
        fused_s, qphi_all = jax.lax.sort((fused, phi_t), num_keys=1, dimension=1)
        qi_all = fused_s & (flagbit - 1)

        def finish(plcp0):
            # plcp0 is exact at non-survivors and irreducible survivors;
            # the scan fills reducible survivors (and agrees elsewhere).
            known = in_text & (~surv_tb | need)
            src = jnp.where(known, plcp0 + idx, jnp.int32(-1))
            fill = jax.lax.cummax(src, axis=1) - idx
            plcp = jnp.where(surv_tb & red, fill, plcp0)
            _, lcp_slot = jax.lax.sort((rank_t, plcp), num_keys=1, dimension=1)
            return jnp.where(valid_k, lcp_slot, 0)

        def ir_pool(MG: int):
            """Cross-block POOLED descent bucket: the per-block buckets were
            gated on max(cnt_ir) over the batch, so one skewed block (ELF
            blocks with fragmented Φ runs) dragged all 8 blocks to a cap/8
            bucket — measured 298 ms adjacent-LCP on the binary corpus vs
            128 ms on text. Pool rungs sized by the batch TOTAL instead
            (cumsum offsets + binary-searched block ids, the ansv_tpu
            pattern)."""

            def fn(_):
                g = jnp.arange(MG, dtype=jnp.int32)
                bq = jnp.clip(
                    jnp.searchsorted(
                        off_ir[1:], g, side="right"
                    ).astype(jnp.int32),
                    0, B - 1,
                )
                li = g - off_ir[bq]
                validg = (g < off_ir[B])[None, :]
                gsrc = bq * cap + jnp.clip(li, 0, cap - 1)
                qi = jnp.clip(qi_all.reshape(-1)[gsrc], 0, cap - 1)[None, :]
                qphi = qphi_all.reshape(-1)[gsrc][None, :]
                vrow_g = (bq * cap)[None, :]
                nb_g = n[bq][None, :]
                l1 = _resolve(qphi, qi, validg, vrow_=vrow_g, nb_=nb_g)
                flat = jnp.where(validg[0], bq * cap + qi[0], B * cap)
                plcp0 = (
                    free_t.reshape(-1)
                    .at[flat]
                    .set(l1[0], mode="drop")
                    .reshape(B, cap)
                )
                return finish(plcp0)

            return fn

        def ir_full(_):
            l1 = _resolve(phi_t, slot_iota, need)
            return finish(jnp.where(need, l1, free_t))

        # Pool rungs on the batch TOTAL. Measured irreducible-survivor
        # rates: ELF binaries ~0.04% of n, license text ~0.5% (5.4K per
        # 1 MiB block); /1024 catches binaries, /128 catches text exactly
        # (the old per-block cap/128 bucket in aggregate), /32 absorbs
        # repeat-pathological blocks; adversarial inputs fall through to
        # the full-width descent.
        G0 = max(B * cap // 1024, 1024)
        G1 = max(B * cap // 128, 2048)
        G2 = max(B * cap // 32, 4096)
        tot_ir = off_ir[B]
        return jax.lax.cond(
            tot_ir <= G0,
            ir_pool(G0),
            lambda _: jax.lax.cond(
                tot_ir <= G1,
                ir_pool(G1),
                lambda _: jax.lax.cond(
                    tot_ir <= G2, ir_pool(G2), ir_full, 0
                ),
                0,
            ),
            0,
        )

    return jax.lax.cond(off_sv[B_] <= M_TINY, tiny_path, plcp_path, 0)


# ---------------------------------------------------------------------------
# PSV/NSV candidate lengths via range-min over lcp_adj (slot order)
# ---------------------------------------------------------------------------


def _shift_left(a, h, fill):
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    rolled = pltpu.roll(a, shift=_C - h, axis=1)
    return jnp.where(lane < _C - h, rolled, fill)


def _shift_right(a, h, fill):
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    rolled = pltpu.roll(a, shift=h, axis=1)
    return jnp.where(lane >= h, rolled, fill)


def _inrow_rangemin_kernel(
    lcp_ref, lslot_ref, rslot_ref,
    psv_ref, nsv_ref, suf_ref, pre_ref, *, R: int
):
    """Answer range-min queries whose range lies within the slot's own
    512-slot row (4 consecutive 128-lane tiles — see salz_tpu/ops/rowops);
    emit row suffix/prefix minima for the crossing bucket.

    For slot k (global-in-block s = base+pos): psv range is
    lcp[lslot+1 .. s], nsv range is lcp[s+1 .. rslot]. In-row iff
    lslot >= base-1 (psv) / rslot <= base+511 (nsv). Out-of-range lanes get
    INF; the caller selects. R = 512-rows per block."""
    br = lcp_ref.shape[0]
    r0 = pl.program_id(0) * br
    x = lcp_ref[:]
    ctx = Row512(br, r0)
    pos = ctx.pos
    base = (ctx.bigrow % R) * _RW

    # Row-local sparse tables: tabs[l][j] = min(x[j : j+2^l]).
    tabs = [x]
    t = x
    for l in range(1, _RLOGW + 1):
        t = jnp.minimum(t, ctx.shift_left(t, 1 << (l - 1), _INT_INF))
        tabs.append(t)

    # Row suffix/prefix minima (outputs for the crossing-bucket path).
    sm = x
    pm = x
    for l in range(_RLOGW):
        h = 1 << l
        sm = jnp.minimum(sm, ctx.shift_left(sm, h, _INT_INF))
        pm = jnp.minimum(pm, ctx.shift_right(pm, h, _INT_INF))
    suf_ref[:] = sm
    pre_ref[:] = pm

    def level_of(d):  # floor(log2(d)) for d in [1, _RW]
        j = jnp.zeros_like(d)
        for l in range(1, _RLOGW + 1):
            j = jnp.where(d >= (1 << l), l, j)
        return j

    lsl = lslot_ref[:]
    rsl = rslot_ref[:]

    # ---- psv: lo = lsl+1-base (dynamic), hi = pos (static).
    in_p = (lsl >= base - 1) & (lsl >= 0)
    lo_p = jnp.clip(lsl + 1 - base, 0, _RW - 1)
    d_p = jnp.clip(pos - lo_p + 1, 1, _RW)
    j_p = level_of(d_p)
    res_p = jnp.full((br, _T), _INT_INF, jnp.int32)
    for l in range(_RLOGW + 1):
        g1 = ctx.gather(tabs[l], lo_p)
        g2 = ctx.shift_right(tabs[l], (1 << l) - 1, _INT_INF) if l else tabs[l]
        res_p = jnp.where(j_p == l, jnp.minimum(g1, g2), res_p)
    psv_ref[:] = jnp.where(in_p, res_p, _INT_INF)

    # ---- nsv: lo = pos+1 (static), hi = rsl-base (dynamic).
    in_n = (rsl >= 0) & (rsl - base <= _RW - 1)
    hi_n = jnp.clip(rsl - base, 0, _RW - 1)
    d_n = jnp.clip(hi_n - pos, 1, _RW)
    j_n = level_of(d_n)
    res_n = jnp.full((br, _T), _INT_INF, jnp.int32)
    for l in range(_RLOGW + 1):
        g1 = ctx.shift_left(tabs[l], 1, _INT_INF)
        g2 = ctx.gather(tabs[l], jnp.clip(hi_n - (1 << l) + 1, 0, _RW - 1))
        res_n = jnp.where(j_n == l, jnp.minimum(g1, g2), res_n)
    nsv_ref[:] = jnp.where(in_n, res_n, _INT_INF)


def _rowmin_tables(lcp_adj, *, cap: int):
    """Per-row minima sparse table: (B, LR+1, R) with R = cap/512 rows."""
    B = lcp_adj.shape[0]
    R = cap // _RW
    rowmin = lcp_adj.reshape(B, R, _RW).min(axis=2)
    LR = max(1, (R - 1).bit_length())
    tabs = [rowmin]
    t = rowmin
    for l in range(1, LR + 1):
        h = 1 << (l - 1)
        t = jnp.minimum(
            t, jnp.concatenate([t[:, h:], jnp.full((B, h), _INF, jnp.int32)], axis=1)
        )
        tabs.append(t)
    return jnp.stack(tabs, axis=1), LR  # (B, LR+1, R)


def _crossing_rangemin(lcp_suf, lcp_pre, rowtab, LR, lo, hi, present, *,
                       cap: int, vrow=None, rrow=None):
    """Range-min of lcp_adj over [lo, hi] where lo and hi lie in DIFFERENT
    512-slot rows: min(suffix-min at lo, whole rows between, prefix-min at
    hi). Shapes: queries (B, m); lcp_suf/pre (B, cap); rowtab (B, LR+1, R).

    vrow/rrow: per-element base offsets into the flattened edge-minima /
    rowtab tables; default one block per batch row. The global-pool path
    passes per-element offsets (queries from many blocks in one bucket)."""
    B, m = lo.shape
    R = cap // _RW
    if vrow is None:
        vrow = (jnp.arange(lo.shape[0], dtype=jnp.int32) * cap)[:, None]
        rrow = (jnp.arange(B, dtype=jnp.int32) * (LR + 1) * R)[:, None]
    q = jnp.concatenate(
        [vrow + jnp.clip(lo, 0, cap - 1), vrow + jnp.clip(hi, 0, cap - 1)], axis=1
    )
    g = jnp.concatenate([lcp_suf.reshape(-1)[q[:, :m]], lcp_pre.reshape(-1)[q[:, m:]]], axis=1)
    # When lo and hi share a row, lo is necessarily the row START (only the
    # nsv lo=k+1 of a row-final slot can do this), so pre[hi] alone covers
    # [lo, hi] exactly; suf[lo] would overshoot past hi and must be dropped.
    same_row = (lo >> _RLOGW) == (hi >> _RLOGW)
    part_edge = jnp.minimum(jnp.where(same_row, _INF, g[:, :m]), g[:, m:])

    r_lo = (lo >> _RLOGW) + 1  # first full row
    r_hi = (hi >> _RLOGW) - 1  # last full row
    d = r_hi - r_lo + 1
    have_mid = present & (d >= 1)
    j = jnp.zeros_like(d)
    for l in range(1, LR + 1):
        j = jnp.where(d >= (1 << l), l, j)
    flat = rowtab.reshape(-1)
    q2 = jnp.concatenate(
        [
            rrow + j * R + jnp.clip(r_lo, 0, R - 1),
            rrow + j * R + jnp.clip(r_hi - (1 << j) + 1, 0, R - 1),
        ],
        axis=1,
    )
    g2 = flat[q2]
    part_mid = jnp.where(have_mid, jnp.minimum(g2[:, :m], g2[:, m:]), _INF)
    return jnp.where(present, jnp.minimum(part_edge, part_mid), 0)


def _rangemin_xla_full(lcp_adj, lslot, rslot, rank_iota, *, cap: int):
    """Backend-generic range-min: full stacked sparse table + 2-probe.
    CPU/test path (O(cap log cap) memory — the TPU path avoids this)."""
    B = lcp_adj.shape[0]
    LR = max(1, (cap - 1).bit_length())
    tables = [lcp_adj]
    t = lcp_adj
    for l in range(1, LR + 1):
        h = 1 << (l - 1)
        t = jnp.minimum(
            t, jnp.concatenate([t[:, h:], jnp.full((B, h), _INF, jnp.int32)], axis=1)
        )
        tables.append(t)
    rmq = jnp.stack(tables, axis=1).reshape(-1)
    rrow = (jnp.arange(B, dtype=jnp.int32) * (LR + 1) * cap)[:, None]

    def range_min(lo_excl, hi_incl, present):
        lo = lo_excl + 1
        d = jnp.maximum(hi_incl - lo_excl, 1)
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

    psv_len = range_min(lslot, rank_iota, lslot >= 0)
    nsv_len = range_min(rank_iota, rslot, rslot >= 0)
    return psv_len, nsv_len


@functools.partial(jax.jit, static_argnames=("cap",))
def candidate_lengths_slot_batch(
    lcp_adj: jax.Array,
    lslot: jax.Array,
    rslot: jax.Array,
    n: jax.Array,
    buckets=None,
    *,
    cap: int,
):
    """(psv_len, nsv_len) int32[B, cap] in SLOT order: entry k is the LCP of
    suffix sa[k] with its PSV / NSV candidate (0 where absent).

    lslot/rslot are slot indices of the nearest-smaller neighbors (-1 absent),
    as produced by the ANSV stage (slot order). `buckets` optionally carries
    the ANSV stage's compacted crossing buckets (qpos_l, count_l, qpos_r,
    count_r): every range-min crossing query's slot is in them (lslot outside
    the row implies no in-row ANSV answer), and the extra boundary slots they
    contain (lslot == rowbase-1 / rslot == rowbase+W) resolve exactly through
    the same-row / edge-minima logic — so reusing them skips this stage's own
    two full-width compaction sorts.
    """
    B = lcp_adj.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]

    if not (
        (jax.default_backend() == "tpu" or _FORCE_INTERPRET)
        and cap % 1024 == 0
    ):
        rank_iota = jnp.broadcast_to(idx, (B, cap)) + (lcp_adj - lcp_adj)
        return _rangemin_xla_full(lcp_adj, lslot, rslot, rank_iota, cap=cap)

    R = cap // _RW
    rows = B * cap // _T
    # The level-loop keeps all LOGW+1 sparse-table levels live, so the
    # scoped-VMEM stack grows ~95 KiB per block row: br=256 needs ~24 MiB
    # and exceeds the 16 MiB limit on v5e. br=128 fits with headroom.
    br = pick_br(rows, limit=128)
    kern = functools.partial(_inrow_rangemin_kernel, R=R)
    psv_in, nsv_in, suf, pre = pl.pallas_call(
        kern,
        grid=(rows // br,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, _T), jnp.int32) for _ in range(4)
        ),
        in_specs=[
            pl.BlockSpec((br, _T), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_specs=tuple(
            pl.BlockSpec((br, _T), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        interpret=_FORCE_INTERPRET,
    )(
        lcp_adj.reshape(rows, _T),
        lslot.reshape(rows, _T),
        rslot.reshape(rows, _T),
    )
    psv_in = psv_in.reshape(B, cap)
    nsv_in = nsv_in.reshape(B, cap)
    suf = suf.reshape(B, cap)
    pre = pre.reshape(B, cap)

    rowbase = idx & ~(_RW - 1)
    cross_p = (lslot >= 0) & (lslot < rowbase - 1)
    cross_n = (rslot >= 0) & (rslot > rowbase + _RW - 1)

    slot_iota = jnp.broadcast_to(idx, (B, cap)) + (lcp_adj - lcp_adj)
    if buckets is not None:
        # Reuse the ANSV crossing buckets (see docstring): gather the range
        # endpoints at the compacted slots (rung-width gathers) instead of
        # re-sorting two full-width arrays.
        qpos_l, cnt_p, qpos_r, cnt_n = buckets
    else:
        # Compact crossing queries (~1.3%/side at 512-wide rows) with
        # fused-key sorts (flag in bit 26; cap <= 2^24).
        cnt_p = jnp.sum(cross_p.astype(jnp.int32), axis=1)
        cnt_n = jnp.sum(cross_n.astype(jnp.int32), axis=1)
        flagbit = jnp.int32(1 << 26)
        (fused_p,) = jax.lax.sort(
            (jnp.where(cross_p, slot_iota, slot_iota | flagbit),),
            num_keys=1, dimension=1,
        )
        (fused_n,) = jax.lax.sort(
            (jnp.where(cross_n, slot_iota, slot_iota | flagbit),),
            num_keys=1, dimension=1,
        )
        qpos_l = fused_p & (flagbit - 1)
        qpos_r = fused_n & (flagbit - 1)
    rowtab, LR = _rowmin_tables(lcp_adj, cap=cap)
    R = cap // _RW

    # GLOBAL-POOL rungs (round 3, mirrors ops/ansv_tpu): pool sized by the
    # BATCH total so one skewed block cannot force a near-full-width rung
    # for everyone; block ids via binary search of the cumsum offsets.
    off_p = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(cnt_p)])
    off_n = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(cnt_n)])

    def make_pool(MG: int, left: bool):
        qpos, off = (qpos_l, off_p) if left else (qpos_r, off_n)
        base = psv_in if left else nsv_in

        def path(_):
            g = jnp.arange(MG, dtype=jnp.int32)
            bq = jnp.clip(
                jnp.searchsorted(off[1:], g, side="right").astype(jnp.int32),
                0, B - 1,
            )
            li = g - off[bq]
            valid = g < off[B]
            qk = jnp.clip(
                qpos.reshape(-1)[bq * cap + jnp.clip(li, 0, cap - 1)],
                0, cap - 1,
            )
            vrow = (bq * cap)[None, :]
            rrow = (bq * (LR + 1) * R)[None, :]
            if left:
                lo = lslot.reshape(-1)[bq * cap + qk] + 1
                hi = qk
            else:
                lo = qk + 1
                hi = rslot.reshape(-1)[bq * cap + qk]
            r = _crossing_rangemin(
                suf, pre, rowtab, LR, lo[None, :], hi[None, :],
                valid[None, :], cap=cap, vrow=vrow, rrow=rrow,
            )
            flat = jnp.where(valid, bq * cap + qk, B * cap)
            return (
                base.reshape(-1).at[flat].set(r[0], mode="drop")
                .reshape(B, cap)
            )

        return path

    def full_p(_):
        rp = _crossing_rangemin(
            suf, pre, rowtab, LR, lslot + 1, slot_iota, cross_p, cap=cap
        )
        return jnp.where(cross_p, rp, psv_in)

    def full_n(_):
        rn = _crossing_rangemin(
            suf, pre, rowtab, LR, slot_iota + 1, rslot, cross_n, cap=cap
        )
        return jnp.where(cross_n, rn, nsv_in)

    G1 = max(B * cap // 64, 1024)
    G2 = max(B * cap // 32, 2048)
    G3 = max(B * cap // 8, 4096)

    def ladder(off, left, full):
        tot = off[B]
        return jax.lax.cond(
            tot <= G1,
            make_pool(G1, left),
            lambda _: jax.lax.cond(
                tot <= G2,
                make_pool(G2, left),
                lambda _: jax.lax.cond(tot <= G3, make_pool(G3, left), full, 0),
                0,
            ),
            0,
        )

    psv_len = ladder(off_p, True, full_p)
    nsv_len = ladder(off_n, False, full_n)
    psv_len = jnp.where(lslot >= 0, psv_len, 0)
    nsv_len = jnp.where(rslot >= 0, nsv_len, 0)
    return psv_len, nsv_len
