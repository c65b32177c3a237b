#!/usr/bin/env python3
"""Time emit sub-stages on realistic parse outputs (CAP, B knobs).

Builds (offs, length) for the bench corpus via the Python oracle (cached in
/tmp), then times emit_stream_batch and its pieces on the device.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salz_tpu.utils import jaxcache

jaxcache.enable()

import functools

import jax
import jax.numpy as jnp

CAP = int(os.environ.get("CAP", str(1 << 20)))
B = int(os.environ.get("B", "8"))


def sync(out):
    first = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(first.ravel()[:1]))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1000:8.1f} ms", flush=True)
    return out


def inputs():
    cache = f"/tmp/emit_inputs_{CAP}_{B}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["blocks"], z["lens"], z["offs"], z["lengths"]
    from bench import make_corpus
    from salz_tpu.ops.parse import optimal_parse_chunked_batch

    data = make_corpus(B * CAP)
    blocks = np.frombuffer(data, np.uint8).reshape(B, CAP).copy()
    lens = np.full(B, CAP, np.int32)
    pz = f"/tmp/parse_inputs_{CAP}_{B}.npz"
    if not os.path.exists(pz):
        import subprocess

        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "gen_parse_inputs.py")],
            check=True, env={**os.environ, "CAP": str(CAP), "B": str(B)},
        )
    z = np.load(pz)
    offs, lengths, _ = optimal_parse_chunked_batch(
        jnp.asarray(z["po"]), jnp.asarray(z["pl"]), jnp.asarray(z["no"]),
        jnp.asarray(z["nl"]), jnp.asarray(z["n"]), cap=CAP,
    )
    offs = np.asarray(offs)
    lengths = np.asarray(lengths)
    np.savez(cache, blocks=blocks, lens=lens, offs=offs, lengths=lengths)
    return blocks, lens, offs, lengths


def main():
    from salz_tpu.ops import emit as em

    blocks_np, lens_np, offs_np, len_np = inputs()
    blocks = jnp.asarray(blocks_np)
    lens = jnp.asarray(lens_np)
    offs = jnp.asarray(offs_np)
    length = jnp.asarray(len_np)
    print(f"devices: {jax.devices()}  cap={CAP} B={B}", flush=True)

    full = jax.jit(functools.partial(em.emit_stream_batch, cap=CAP))
    timeit("emit_full", full, blocks, lens, offs, length)

    ns = lens - em.TAIL_RESERVE

    @jax.jit
    def starts_only(length, ns):
        return jax.vmap(lambda l, n: em.token_starts(l, n, cap=CAP))(
            length, ns
        )

    is_start = timeit("token_starts", starts_only, length, ns)
    ntt = int(np.asarray(jnp.max(jnp.sum(is_start.astype(jnp.int32), axis=1))))
    print(f"  max text tokens: {ntt} ({ntt / CAP * 100:.1f}% of cap)",
          flush=True)

    tcap = CAP // 4 + em.TAIL_RESERVE

    @jax.jit
    def core_only(is_start, blocks, lens, offs, length):
        return em._emit_core(
            is_start, blocks, lens, offs, length, cap=CAP, tcap=tcap
        )

    timeit("emit_core(tcap=cap/4)", core_only, is_start, blocks, lens, offs,
           length)

    # compaction sort alone (5 operands, full cap width)
    idx = jnp.arange(CAP, dtype=jnp.int32)[None, :]

    @jax.jit
    def compaction(is_start, blocks, offs, length):
        return jax.lax.sort(
            (
                1 - is_start.astype(jnp.int32),
                jnp.broadcast_to(idx, (B, CAP)) + (length - length),
                length,
                offs,
                blocks,
            ),
            num_keys=1,
            is_stable=True,
            dimension=1,
        )

    timeit("compaction sort (5 ops)", compaction, is_start, blocks, offs,
           length)


if __name__ == "__main__":
    main()
