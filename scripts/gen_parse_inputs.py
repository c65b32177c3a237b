#!/usr/bin/env python3
"""Generate /tmp/parse_inputs_{CAP}_{B}.npz for profile_parse.py using the
DEVICE pipeline (SA -> ANSV -> LCP -> rangemin -> slot2text sort) instead of
the slow Python oracle. The parse inputs are conformance-checked elsewhere;
here they only need to be the real arrays the parse stage sees."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salz_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from bench import make_corpus
from salz_tpu.ops.ansv import ansv_slots_vals_batch
from salz_tpu.ops.lcp import adjacent_lcp_batch, candidate_lengths_slot_batch
from salz_tpu.ops.suffix_array import suffix_array_prefixes

CAP = int(os.environ.get("CAP", str(1 << 20)))
B = int(os.environ.get("B", "8"))


def main():
    out = f"/tmp/parse_inputs_{CAP}_{B}.npz"
    data = make_corpus(B * CAP)
    blocks = jnp.asarray(np.frombuffer(data, np.uint8).reshape(B, CAP))
    ns = jnp.full((B,), CAP - 8, jnp.int32)
    idx = jnp.arange(CAP, dtype=jnp.int32)[None, :]
    sa, ckpt, nlv, t32, p32 = jax.jit(
        jax.vmap(lambda b, n: suffix_array_prefixes(b, n, cap=CAP))
    )(blocks, ns)
    valid = idx < ns[:, None]
    vals = jnp.where(valid, sa, jnp.int32(2**31 - 1))
    lslot, psv_val, rslot, nsv_val = ansv_slots_vals_batch(vals, ns, cap=CAP)
    lcp_adj = adjacent_lcp_batch(ckpt, nlv, ns, sa, t32, p32, cap=CAP)
    pl_s, nl_s = candidate_lengths_slot_batch(lcp_adj, lslot, rslot, ns, cap=CAP)
    dest = jnp.where(valid, sa, CAP)
    _, psv, nsv, pl_, nl_ = jax.lax.sort(
        (dest, psv_val, nsv_val, pl_s, nl_s), num_keys=1, dimension=1
    )
    po = np.asarray(idx - psv, np.int32)
    no = np.asarray(idx - nsv, np.int32)
    np.savez(
        out,
        po=po,
        pl=np.asarray(pl_, np.int32),
        no=no,
        nl=np.asarray(nl_, np.int32),
        n=np.asarray(ns, np.int32),
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
