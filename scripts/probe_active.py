#!/usr/bin/env python3
"""Probe: active-set fraction per doubling level for real corpora.

Answers: how many FULL-width radix-4 rounds does phase 1 actually run at
the current threshold (batch_total/8), and what would a cheaper pooled
round (higher crossover) save?  Active = member of a non-singleton group
of the current prefix depth.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salz_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

CAP = int(os.environ.get("CAP", str(1 << 20)))
B = int(os.environ.get("B", "8"))


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "corpora/text.bin"
    data = open(src, "rb").read()
    need = B * CAP
    while len(data) < need:
        data = data + data
    blocks = jnp.asarray(np.frombuffer(data[:need], np.uint8).reshape(B, CAP))
    ns = jnp.full((B,), CAP - 8, jnp.int32)

    # depth-d active fraction via one sort per depth (16, 64, 256, ...)
    idx = jnp.arange(CAP, dtype=jnp.int32)[None, :]

    @jax.jit
    def rank16(blocks, ns):
        from salz_tpu.ops import suffix_array as sam

        packs = sam._packed_prefixes_batch(blocks, ns, cap=CAP)
        in_text = idx < ns[:, None]
        byte = jnp.where(in_text, blocks.astype(jnp.int32), 0)
        wide = jnp.concatenate([byte, jnp.zeros((B, 16), jnp.int32)], axis=1)

        def _sym(k):
            s = wide[:, k : k + CAP] + 1
            return jnp.where(idx + k < ns[:, None], s, 0)

        def _pack3(k):
            return (_sym(k) << 18) | (_sym(k + 1) << 9) | _sym(k + 2)

        keyA = jnp.where(in_text, _pack3(0), (1 << 27) + idx)
        keys_rest = [jnp.where(in_text, _pack3(k), 0) for k in (3, 6, 9, 12)]
        keyF = jnp.where(in_text, _sym(15), 0)
        packed16 = sam._pack_keys([keyA, *keys_rest, keyF], [28, 27, 27, 27, 27, 9])
        sorted16 = jax.lax.sort((*packed16, idx[0][None, :].repeat(B, 0)), num_keys=len(packed16), dimension=1)
        perm16 = sorted16[-1]
        eq = jnp.ones((B, CAP - 1), jnp.bool_)
        for kk in sorted16[:-1]:
            eq = eq & (kk[:, 1:] == kk[:, :-1])
        head_s = jnp.concatenate([jnp.ones((B, 1), jnp.bool_), ~eq], axis=1)
        rank_s = sam._heads_to_rank(head_s)
        _, r16 = jax.lax.sort((perm16, rank_s), num_keys=1, dimension=1)
        nxt = jnp.concatenate([head_s[:, 1:], jnp.ones((B, 1), jnp.bool_)], 1)
        act = ~(head_s & nxt)
        return r16, jnp.sum(act)

    @jax.jit
    def round4(rank, ns, m):
        nb = ns[:, None]
        wide_r = jnp.concatenate([rank, jnp.full((B, CAP), -1, jnp.int32)], 1)

        def sh(h):
            r2 = jax.lax.dynamic_slice(wide_r, (0, jnp.minimum(h, jnp.int32(CAP))), (B, CAP))
            return jnp.where(idx + h < nb, r2, jnp.int32(-1))

        keys = (rank, sh(m), sh(2 * m), sh(3 * m))
        *ks, perm = jax.lax.sort((*keys, jnp.broadcast_to(idx, (B, CAP))), num_keys=4, dimension=1)
        diff = jnp.zeros((B, CAP - 1), jnp.bool_)
        for kk in ks:
            diff = diff | (kk[:, 1:] != kk[:, :-1])
        head = jnp.concatenate([jnp.ones((B, 1), jnp.bool_), diff], axis=1)
        from salz_tpu.ops import suffix_array as sam

        nr_s = sam._heads_to_rank(head)
        _, nr = jax.lax.sort((perm, nr_s), num_keys=1, dimension=1)
        nxt = jnp.concatenate([head[:, 1:], jnp.ones((B, 1), jnp.bool_)], 1)
        act = ~(head & nxt)
        return nr, jnp.sum(act)

    rank, a0 = rank16(blocks, ns)
    tot = B * CAP
    print(f"{src} cap={CAP} B={B} total={tot}")
    print(f"depth {16:8d}: active {int(a0):9d}  ({int(a0)/tot*100:5.1f}%)")
    d = 16
    rd = 1
    while d < CAP and rd < 12:
        rank, a = round4(rank, ns, jnp.int32(d))
        d *= 4
        print(f"depth {d:8d}: active {int(a):9d}  ({int(a)/tot*100:5.1f}%)")
        rd += 1
        if int(a) == 0:
            break


if __name__ == "__main__":
    main()
