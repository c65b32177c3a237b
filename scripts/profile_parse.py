#!/usr/bin/env python3
"""Time the parse stage alone on realistic candidate inputs.

Builds (psv/nsv offs+len) for the bench corpus once via the Python oracle
(cached in /tmp), then times optimal_parse_chunked_batch on the device.
Knobs: CAP, B, WINDOW (the sweep-kernel crossing window).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salz_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

CAP = int(os.environ.get("CAP", str(1 << 20)))
B = int(os.environ.get("B", "8"))
WINDOW = int(os.environ.get("WINDOW", "2048"))


def inputs():
    cache = f"/tmp/parse_inputs_{CAP}_{B}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["po"], z["pl"], z["no"], z["nl"], z["n"]
    from bench import make_corpus
    from salz_tpu.oracle import pycodec as oc

    data = make_corpus(B * CAP)
    po = np.zeros((B, CAP), np.int32)
    pl = np.zeros((B, CAP), np.int32)
    no = np.zeros((B, CAP), np.int32)
    nl = np.zeros((B, CAP), np.int32)
    n = np.full(B, CAP - 8, np.int32)
    for b in range(B):
        text = np.frombuffer(data[b * CAP : (b + 1) * CAP], np.uint8)[:-8]
        sa = oc.suffix_array(text)
        psv, nsv = oc.psv_nsv(sa)
        posv, plen, nosv, nlen = oc.factorize(text, psv, nsv)
        m = len(text)
        po[b, :m] = posv
        pl[b, :m] = plen
        no[b, :m] = nosv
        nl[b, :m] = nlen
        print(f"block {b} factorized", flush=True)
    np.savez(cache, po=po, pl=pl, no=no, nl=nl, n=n)
    return po, pl, no, nl, n


def main():
    from salz_tpu.ops.parse import optimal_parse_chunked_batch

    po, pl, no, nl, n = inputs()
    print(f"devices: {jax.devices()}  cap={CAP} B={B} window={WINDOW}", flush=True)
    args = tuple(jnp.asarray(a) for a in (po, pl, no, nl, n))

    def run():
        out = optimal_parse_chunked_batch(*args, cap=CAP, window=WINDOW)
        np.asarray(jax.device_get(out[0].ravel()[:1]))
        return out

    t0 = time.perf_counter()
    offs, length, cost = run()
    print(f"first (compile): {time.perf_counter() - t0:.1f}s", flush=True)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    print(f"parse: {dt * 1e3:.1f} ms  ({B * CAP / dt / 1e6:.1f} MB/s)", flush=True)
    # sanity: factor stats
    ln = np.asarray(length)
    print(f"factors: {(ln > 1).sum()} tokens>1, max len {ln.max()}", flush=True)


if __name__ == "__main__":
    main()
