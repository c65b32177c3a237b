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
from salz_tpu.ops.ansv import psv_nsv_full
from salz_tpu.ops.emit import emit_stream, token_starts
from salz_tpu.ops.lcp import candidate_lcps
from salz_tpu.ops.parse import optimal_parse_chunked
from salz_tpu.ops.suffix_array import suffix_array_with_ranks

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
    print(f"devices: {jax.devices()}  cap={CAP}", flush=True)
    data = make_corpus(CAP)
    block = jnp.asarray(np.frombuffer(data, np.uint8))
    n = jnp.int32(CAP - 8)
    idx = jnp.arange(CAP, dtype=jnp.int32)

    sa, ckpt, nlv = timeit(
        "suffix_array", suffix_array_with_ranks, block, n, cap=CAP
    )
    print(f"  (levels filled: {int(nlv)})", flush=True)
    psv, nsv, lslot, rslot, rank = timeit(
        "ansv_full", psv_nsv_full, sa, n, cap=CAP
    )
    pl_, nl_ = timeit(
        "candidate_lcps", candidate_lcps, ckpt, nlv, n, sa, lslot, rslot,
        rank, cap=CAP,
    )
    po = idx - psv
    no = idx - nsv
    offs, length, _ = timeit(
        "parse_chunked", optimal_parse_chunked, po, pl_, no, nl_, n,
        cap=CAP, chunk=CHUNK,
    )
    timeit("token_starts", token_starts, length, n, cap=CAP)
    timeit("emit", emit_stream, block, jnp.int32(CAP), offs, length, cap=CAP)


if __name__ == "__main__":
    main()
