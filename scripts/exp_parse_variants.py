#!/usr/bin/env python3
"""Timing experiments for the parse sweep kernel (TPU only).

Variants decompose the kernel's cost into vector-op work vs while-loop
convergence-sync overhead:
  v0      — production kernel (while_loop, group of 4 relaxes per check)
  fixK    — fixed K relaxes per sub-chunk, NO convergence check (K=44 is the
            exact in-row chain bound 128/3+1 -> correct; K=12 is timing-only)
  group8  — while_loop with 8 relaxes per check

Uses the cached inputs from gen_parse_inputs.py.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salz_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import salz_tpu.ops.parse as parse
from salz_tpu.ops.parse import _C, _INT_INF, _SUP, _K, _shift_left_lane

CAP = int(os.environ.get("CAP", str(1 << 20)))
B = int(os.environ.get("B", "8"))


def make_kernel(mode: str, K: int = 44):
    def kern(nb_ref, pw_ref, nw_ref, pt_ref, nt_ref, far_ref, out_ref, S, *,
             cap, window):
        c = pl.program_id(0)
        nsup = pl.num_programs(0)
        nb = nb_ref[:]
        Bb = nb.shape[0]
        lo_s = (nsup - 1 - c) * _SUP

        @pl.when(c == 0)
        def _init():
            gcol = jax.lax.broadcasted_iota(
                jnp.int32, (Bb, _SUP + window), 1
            ) + (cap - _SUP)
            S[:] = jnp.where((gcol >= nb) & (gcol <= cap), 0, _INT_INF).astype(
                jnp.int32
            )

        pw = pw_ref[:]
        nw = nw_ref[:]
        pt = pt_ref[:]
        nt = nt_ref[:]
        far = far_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (Bb, _C), 1)

        def wgather(win, j):
            tile = j >> 7
            lj = j & (_C - 1)
            g = jnp.full((Bb, _C), _INT_INF, jnp.int32)
            for wt in range(window // _C):
                cand = jnp.take_along_axis(
                    win[:, _C * wt: _C * (wt + 1)], lj, axis=1)
                g = jnp.where(tile == wt, cand, g)
            return g

        for i in range(_K - 1, -1, -1):
            sl = slice(_C * i, _C * (i + 1))
            win = S[:, _C * (i + 1): _C * (i + 1) + window]
            hi = lo_s + _C * (i + 1)
            boundary = win[:, 0:1]
            ptl = pt[:, sl]
            ntl = nt[:, sl]
            pwl = pw[:, sl]
            nwl = nw[:, sl]
            pos = lo_s + _C * i + lane
            act = (pos >= 1) & (pos < nb)
            rest = jnp.where(pos >= nb, 0, _INT_INF).astype(jnp.int32)

            dp = ptl - hi
            dn = ntl - hi
            p_near = (dp >= 0) & (dp < window)
            n_near = (dn >= 0) & (dn < window)
            gp = wgather(win, jnp.clip(dp, 0, window - 1))
            gn = wgather(win, jnp.clip(dn, 0, window - 1))
            pre = jnp.minimum(
                jnp.where(p_near, pwl + gp, _INT_INF),
                jnp.where(n_near, nwl + gn, _INT_INF),
            )
            pre = jnp.minimum(pre, far[:, sl])

            p_in = dp < 0
            n_in = dn < 0
            plo = jnp.where(p_in, ptl - (hi - _C), 0)
            nlo = jnp.where(n_in, ntl - (hi - _C), 0)
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

            ul0 = jnp.full((Bb, _C), _INT_INF, jnp.int32)
            if mode == "fix":
                ul = relax1(ul0)
                ul = jax.lax.fori_loop(0, K - 1, lambda t, u: relax1(u), ul)
            elif mode == "fixunroll":
                ul = ul0
                for _ in range(K):
                    ul = relax1(ul)
            else:  # group8 while
                def group(ul):
                    for _ in range(8):
                        ul = relax1(ul)
                    return ul

                state = (group(relax1(ul0)), ul0, jnp.int32(0))

                def cond(st):
                    ul, prev, it = st
                    return jnp.any(ul != prev) & (it < _C // 2)

                def body(st):
                    ul, _, it = st
                    return group(ul), ul, it + 1

                ul = jax.lax.while_loop(cond, body, state)[0]
            S[:, sl] = ul

        out_ref[:] = S[:, :_SUP]
        tail = S[:, :window]
        S[:, _SUP: _SUP + window] = tail

    return kern


def sweep_variant(mode, K, nb, pw, nw, pt, nt, pre_far, *, cap, window):
    Bb = pw.shape[0]
    nsup = cap // _SUP
    spec = lambda: pl.BlockSpec(
        (Bb, _SUP), lambda c: (0, nsup - 1 - c), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(make_kernel(mode, K), cap=cap, window=window),
        grid=(nsup,),
        out_shape=jax.ShapeDtypeStruct((Bb, cap), jnp.int32),
        in_specs=[
            pl.BlockSpec((Bb, 1), lambda c: (0, 0), memory_space=pltpu.VMEM),
            spec(), spec(), spec(), spec(), spec(),
        ],
        out_specs=spec(),
        scratch_shapes=[pltpu.VMEM((Bb, _SUP + window), jnp.int32)],
    )(nb, pw, nw, pt, nt, pre_far)


def main():
    from salz_tpu.format import FACTOR_LENGTH_MIN

    z = np.load(f"/tmp/parse_inputs_{CAP}_{B}.npz")
    po, pl_, no, nl_, n = (
        z["po"], z["pl"], z["no"], z["nl"], z["n"],
    )
    print(f"devices: {jax.devices()} cap={CAP} B={B}", flush=True)
    idx = jnp.arange(CAP, dtype=jnp.int32)[None, :]
    psv_offs = jnp.asarray(po)
    psv_len = jnp.asarray(pl_)
    nsv_offs = jnp.asarray(no)
    nsv_len = jnp.asarray(nl_)
    ns = jnp.asarray(n)

    psv_ok = psv_len >= FACTOR_LENGTH_MIN
    nsv_ok = nsv_len >= FACTOR_LENGTH_MIN
    psv_w = jnp.where(
        psv_ok, parse.factor_static_cost(psv_offs, psv_len) - 9 * psv_len,
        parse._INF,
    )
    nsv_w = jnp.where(
        nsv_ok, parse.factor_static_cost(nsv_offs, nsv_len) - 9 * nsv_len,
        parse._INF,
    )
    psv_tgt = jnp.clip(jnp.where(psv_ok, idx + psv_len, CAP), 0, CAP)
    nsv_tgt = jnp.clip(jnp.where(nsv_ok, idx + nsv_len, CAP), 0, CAP)
    nb2 = jnp.reshape(ns, (B, 1)).astype(jnp.int32)
    pre_far0 = jnp.full((B, CAP), parse._INF, jnp.int32)

    window = int(os.environ.get("WINDOW", "2048"))

    ref = None
    for name, mode, K in (
        ("fix12(timing-only)", "fix", 12),
        ("fix44", "fix", 44),
        ("group8", "group8", 0),
    ):
        fn = jax.jit(functools.partial(
            sweep_variant, mode, K, cap=CAP, window=window))
        out = fn(nb2, psv_w, nsv_w, psv_tgt, nsv_tgt, pre_far0)
        np.asarray(jax.device_get(out.ravel()[:1]))
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(nb2, psv_w, nsv_w, psv_tgt, nsv_tgt, pre_far0)
            np.asarray(jax.device_get(out.ravel()[:1]))
        dt = (time.perf_counter() - t0) / 3
        outh = np.asarray(out)
        if name == "fix44":
            ref = outh
        ok = "" if ref is None else f" match44={np.array_equal(outh, ref)}"
        print(f"{name:20s} {dt*1e3:8.1f} ms{ok}", flush=True)

    # production path for comparison
    fn0 = jax.jit(functools.partial(
        parse._sweep_tpu, cap=CAP, window=window))
    out = fn0(nb2, psv_w, nsv_w, psv_tgt, nsv_tgt, pre_far0)
    np.asarray(jax.device_get(out.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn0(nb2, psv_w, nsv_w, psv_tgt, nsv_tgt, pre_far0)
        np.asarray(jax.device_get(out.ravel()[:1]))
    dt = (time.perf_counter() - t0) / 3
    print(f"{'v0 (production)':20s} {dt*1e3:8.1f} ms "
          f"match44={np.array_equal(np.asarray(out), ref)}", flush=True)


if __name__ == "__main__":
    main()
