#!/usr/bin/env python3
"""Report the data-dependent bucket-ladder loads on the bench corpus:
LCP survivors (>=32-byte adjacent matches), ANSV row-crossing queries,
range-min row-crossing queries, and token counts. These pick the ladder
rungs every batch-level lax.cond selects, i.e. the actual gather volume.
Runs fine on CPU JAX (counts are data properties)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from bench import make_corpus
from salz_tpu.oracle import pycodec as oc

CAP = int(os.environ.get("CAP", str(1 << 20)))
B = int(os.environ.get("B", "4"))
W = 512


def main():
    data = make_corpus(B * CAP)
    for b in range(B):
        text = np.frombuffer(data[b * CAP : (b + 1) * CAP], np.uint8)[:-8]
        n = len(text)
        sa = np.asarray(oc.suffix_array(text))
        # adjacent LCPs via packed compare + numpy
        a = sa[:-1]
        c = sa[1:]
        lcp = np.zeros(n - 1, np.int64)
        rem = np.ones(n - 1, bool)
        step = 0
        while rem.any() and step < n:
            ai = a + lcp
            ci = c + lcp
            ok = rem & (ai < n) & (ci < n)
            eq = np.zeros(n - 1, bool)
            eq[ok] = text[ai[ok]] == text[ci[ok]]
            lcp[eq] += 1
            rem = eq
            step += 1
        surv = int((lcp >= 32).sum())
        # ANSV row crossing (512-slot rows): nearest smaller slot outside row
        psv, nsv = oc.psv_nsv(sa)  # text-order positions? check API
        # slot-order nearest-smaller via stack scan on sa values
        lslot = np.full(n, -1, np.int64)
        stack = []
        for k in range(n):
            while stack and sa[stack[-1]] > sa[k]:
                stack.pop()
            lslot[k] = stack[-1] if stack else -1
            stack.append(k)
        rslot = np.full(n, -1, np.int64)
        stack = []
        for k in range(n - 1, -1, -1):
            while stack and sa[stack[-1]] > sa[k]:
                stack.pop()
            rslot[k] = stack[-1] if stack else -1
            stack.append(k)
        ks = np.arange(n)
        rowbase = ks & ~(W - 1)
        ansv_l = int(((lslot >= 0) & (lslot < rowbase - 1) | ((lslot < 0) & (rowbase > 0))).sum())
        cross_l = int(((lslot >= 0) & (lslot < rowbase)).sum())
        cross_r = int(((rslot >= 0) & (rslot >= rowbase + W)).sum())
        # range-min crossing: psv range [lslot+1, k], nsv range [k+1, rslot]
        rm_l = int(((lslot >= 0) & (lslot < rowbase - 1)).sum())
        rm_r = int(((rslot >= 0) & (rslot > rowbase + W - 1)).sum())
        print(
            f"block {b}: n={n} lcp32_survivors={surv} ({surv/n:.1%}) "
            f"ansv_cross_l={cross_l} ({cross_l/n:.1%}) "
            f"ansv_cross_r={cross_r} ({cross_r/n:.1%}) "
            f"rm_cross_l={rm_l} ({rm_l/n:.1%}) rm_cross_r={rm_r} ({rm_r/n:.1%})",
            flush=True,
        )


if __name__ == "__main__":
    main()
