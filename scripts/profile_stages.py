"""Per-stage device timing for the encode pipeline (run on TPU or CPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salz_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from bench import make_corpus
from salz_tpu.ops.ansv import ansv_slots_vals_batch
from salz_tpu.ops.emit import emit_stream_batch, token_starts
from salz_tpu.ops.lcp import adjacent_lcp_batch, candidate_lengths_slot_batch

from salz_tpu.ops.suffix_array import suffix_array_prefixes_batch

CAP = int(os.environ.get("CAP", str(1 << 20)))
CHUNK = int(os.environ.get("CHUNK", "512"))


def _sync(out):
    # device_get of one element: block_until_ready alone does not reliably
    # block through the axon tunnel.
    first = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(first.ravel()[:1]))


def timeit(name, fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
        _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:24s} {dt*1000:9.1f} ms   ({CAP/dt/1e6:8.1f} MB/s)", flush=True)
    return out


def main():
    import jax.lax

    B = int(os.environ.get("B", "1"))
    src = os.environ.get("CORPUS", "")
    print(
        f"devices: {jax.devices()}  cap={CAP} batch={B} "
        f"corpus={src or 'synthetic'}",
        flush=True,
    )
    if src:
        data = open(src, "rb").read()[: B * CAP]
        if len(data) < B * CAP:
            data += make_corpus(B * CAP - len(data))
    else:
        data = make_corpus(B * CAP)
    blocks = jnp.asarray(
        np.frombuffer(data, np.uint8).reshape(B, CAP)
    )
    ns = jnp.full((B,), CAP - 8, jnp.int32)
    idx = jnp.arange(CAP, dtype=jnp.int32)[None, :]

    sa_fn = jax.jit(lambda b, n: suffix_array_prefixes_batch(b, n, cap=CAP))
    sa, ckpt, nlv, t32, p32 = timeit("suffix_array", sa_fn, blocks, ns)
    print(f"  (levels filled: {np.asarray(nlv)})", flush=True)
    valid = idx < ns[:, None]
    vals = jnp.where(valid, sa, jnp.int32(2**31 - 1))
    lslot, psv_val, rslot, nsv_val = timeit(
        "ansv_slots", ansv_slots_vals_batch, vals, ns, cap=CAP
    )
    lcp_adj = timeit(
        "adjacent_lcp", adjacent_lcp_batch, ckpt, nlv, ns, sa, t32, p32, cap=CAP
    )
    pl_s, nl_s = timeit(
        "rangemin", candidate_lengths_slot_batch, lcp_adj, lslot, rslot, ns,
        cap=CAP,
    )
    sort_fn = jax.jit(
        lambda d, a, b, c, e: jax.lax.sort((d, a, b, c, e), num_keys=1, dimension=1)
    )
    dest = jnp.where(valid, sa, CAP)
    _, psv, nsv, pl_, nl_ = timeit(
        "slot2text_sort", sort_fn, dest, psv_val, nsv_val, pl_s, nl_s
    )
    po = idx - psv
    no = idx - nsv
    from salz_tpu.ops.parse import optimal_parse_chunked_batch

    offs, length, _ = timeit(
        "parse_chunked", optimal_parse_chunked_batch, po, pl_, no, nl_, ns,
        cap=CAP, chunk=CHUNK,
    )
    starts_fn = jax.jit(jax.vmap(lambda l, n: token_starts(l, n, cap=CAP)))
    timeit("token_starts", starts_fn, length, ns)
    timeit(
        "emit", emit_stream_batch, blocks, jnp.full((B,), CAP, jnp.int32),
        offs, length, cap=CAP,
    )


if __name__ == "__main__":
    main()
