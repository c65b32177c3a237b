#!/usr/bin/env python3
"""On-device verification sweep: every-block conformance + kernel parity.

CPU pytest cannot reach the TPU-only Pallas paths (token starts, in-row
ANSV, parse fixpoint kernels), so this script drives them on the real chip:

  1. batch encode at several (cap, batch) shapes, EVERY block compared
     byte-for-byte against the native C++ codec (+ roundtrip);
  2. Pallas token-starts vs the XLA pointer-doubling path on random parses;
  3. Pallas ANSV (in-row kernel + bucket descent) vs the XLA descent,
     including adversarial monotone/vee permutations.

Run: python scripts/verify_tpu.py   (exits non-zero on any mismatch)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salz_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from bench import make_corpus
from salz_tpu import native
from salz_tpu.ops.encoder import encode_blocks_device
from salz_tpu.parallel.sharding import pad_blocks

FAIL = 0


def check(name, ok):
    global FAIL
    print(f"{'PASS' if ok else 'FAIL'}  {name}", flush=True)
    if not ok:
        FAIL = 1


def conformance():
    for cap, B in ((1 << 12, 8), (1 << 15, 3), (1 << 16, 4)):
        corpus = make_corpus(B * cap)
        blocks = [corpus[i : i + cap] for i in range(0, len(corpus), cap)]
        b, l = pad_blocks(blocks, cap)
        outs, out_lens, _ = encode_blocks_device(
            jnp.asarray(b), jnp.asarray(l), cap=cap
        )
        bad = [
            i
            for i, blk in enumerate(blocks)
            if bytes(np.asarray(outs[i])[: int(out_lens[i])])
            != native.encode_block(blk)
            or native.decode_block(
                bytes(np.asarray(outs[i])[: int(out_lens[i])]), cap
            )
            != blk
        ]
        check(f"every-block conformance cap={cap} B={B}", not bad)


def decoder_roundtrip():
    """Device decoder (vmapped lax.while_loop) on the real chip: decode the
    device-encoded segments back and compare, including a PLAIN stream."""
    from salz_tpu.ops.decoder import decode_blocks_device
    from salz_tpu import format as fmt

    cap, B = 1 << 15, 4
    rng = np.random.default_rng(11)
    corpus = make_corpus((B - 1) * cap)
    blocks = [corpus[i : i + cap] for i in range(0, len(corpus), cap)]
    blocks.append(rng.integers(0, 256, cap, dtype=np.uint8).tobytes())  # PLAIN
    segs = [native.encode_block(blk) for blk in blocks]
    seg_cap = fmt.encoded_len_max(cap)
    pad = np.zeros((B, seg_cap), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(segs):
        pad[i, : len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    out, out_len, status = decode_blocks_device(
        jnp.asarray(pad), jnp.asarray(lens), seg_cap=seg_cap, out_cap=cap
    )
    out = np.asarray(out)
    ok = bool((np.asarray(status) == 0).all()) and all(
        bytes(out[i, : int(np.asarray(out_len)[i])]) == blocks[i]
        for i in range(B)
    )
    # Malformed stream -> nonzero status, no crash.
    bad = np.zeros((B, seg_cap), np.uint8)
    bad[:, 3] = 7  # unknown stream type
    _, _, st_bad = decode_blocks_device(
        jnp.asarray(bad), jnp.asarray(np.full(B, 16, np.int32)),
        seg_cap=seg_cap, out_cap=cap,
    )
    ok &= bool((np.asarray(st_bad) != 0).all())
    check(f"device decoder roundtrip cap={cap} B={B} (+PLAIN, +malformed)", ok)


def starts_parity():
    from salz_tpu.ops.emit import token_starts_xla
    from salz_tpu.ops.starts import token_starts_chunked

    rng = np.random.default_rng(7)
    cap = 1 << 15
    ok = True
    for trial in range(4):
        n = int(rng.integers(cap // 2, cap - 8)) if trial else cap - 8
        length = np.ones(cap, np.int32)
        fac = rng.random(cap) < 0.3
        length[fac] = rng.integers(3, 40, fac.sum())
        huge = rng.random(cap) < 0.001
        length[huge] = rng.integers(100, 5000, huge.sum())
        a = token_starts_xla(jnp.asarray(length), jnp.int32(n), cap=cap)
        b = token_starts_chunked(jnp.asarray(length), jnp.int32(n), cap=cap)
        ok &= bool(jnp.all(a == b))
    check("pallas token starts == xla", ok)


def ansv_parity():
    from salz_tpu.ops.ansv import _ansv_slots_batch, _INF
    from salz_tpu.ops.ansv_tpu import ansv_slots_vals_tpu_batch

    rng = np.random.default_rng(3)
    cap = 1 << 14
    cases = []
    n = cap - 8
    cases.append(rng.permutation(n).astype(np.int64))
    cases.append(np.arange(n, dtype=np.int64))
    cases.append(np.arange(n, dtype=np.int64)[::-1].copy())
    R = cap // 128
    v = ((127 - np.arange(128)[None, :]) * R + np.arange(R)[:, None]).astype(
        np.int64
    ).reshape(-1)[:n]
    order = np.argsort(v, kind="stable")
    perm = np.empty(n, np.int64)
    perm[order] = np.arange(n)
    cases.append(perm)  # in-row descending -> bucket overflow -> fallback

    ok = True
    for arr in cases:
        vals_np = np.full(cap, 2**31 - 1, np.int64)
        vals_np[:n] = arr
        vals = jnp.asarray(vals_np.astype(np.int32))[None]
        nn = jnp.asarray([n], np.int32)
        ls0, rs0 = _ansv_slots_batch(vals, nn, cap=cap)
        ls1, _, rs1, _ = ansv_slots_vals_tpu_batch(vals, nn, cap=cap)
        ok &= bool(
            np.array_equal(np.asarray(ls0)[0, :n], np.asarray(ls1)[0, :n])
            and np.array_equal(np.asarray(rs0)[0, :n], np.asarray(rs1)[0, :n])
        )
    check("pallas ANSV == xla (incl. adversarial)", ok)


def parse_parity():
    """Pallas sweep-kernel DP vs the sequential reference DP, including
    factor lengths beyond the near window (forces the outer far iteration)."""
    from salz_tpu.ops.parse import (
        optimal_parse_chunked_batch,
        optimal_parse_sequential,
    )

    rng = np.random.default_rng(17)
    cap = 1 << 12
    B = 2
    n = np.array([cap - 8, cap // 2 + 11], np.int32)
    idx = np.arange(cap, dtype=np.int32)[None, :]
    pl_ = np.ones((B, cap), np.int32)
    fac = rng.random((B, cap)) < 0.4
    pl_[fac] = rng.integers(3, 60, fac.sum())
    huge = rng.random((B, cap)) < 0.004
    pl_[huge] = rng.integers(2100, 3900, huge.sum())  # > window -> far path
    # Candidate-length contract: a true LCP never exceeds n - p (the u-form
    # potential transform relies on edge targets <= n).
    pl_ = np.maximum(np.minimum(pl_, n[:, None] - idx), 1).astype(np.int32)
    nl_ = np.maximum(pl_ - rng.integers(0, 3, (B, cap)), 1).astype(np.int32)
    po = rng.integers(1, 1 << 20, (B, cap)).astype(np.int32)
    no = rng.integers(1, 1 << 20, (B, cap)).astype(np.int32)
    offs, length, _ = optimal_parse_chunked_batch(
        jnp.asarray(po), jnp.asarray(pl_), jnp.asarray(no), jnp.asarray(nl_),
        jnp.asarray(n), cap=cap,
    )
    ok = True
    for b in range(B):
        o2, l2, _ = optimal_parse_sequential(
            jnp.asarray(po[b]), jnp.asarray(pl_[b]), jnp.asarray(no[b]),
            jnp.asarray(nl_[b]), jnp.int32(int(n[b])), cap=cap,
        )
        nn = int(n[b])
        ok &= bool(
            np.array_equal(np.asarray(offs[b])[1:nn], np.asarray(o2)[1:nn])
            and np.array_equal(np.asarray(length[b])[1:nn], np.asarray(l2)[1:nn])
        )
    check("pallas parse sweep == sequential DP (incl. far edges)", ok)


def rangemin_parity():
    """Pallas in-row range-min + crossing bucket vs the full-table XLA path."""
    from salz_tpu.ops.lcp import _rangemin_xla_full, candidate_lengths_slot_batch

    rng = np.random.default_rng(23)
    cap = 1 << 14
    B = 2
    n = np.array([cap - 8, cap - 1000], np.int32)
    lcp = rng.integers(0, 300, (B, cap)).astype(np.int32)
    idx = np.arange(cap, dtype=np.int32)[None, :]
    span_l = rng.integers(1, 4000, (B, cap)).astype(np.int32)
    span_r = rng.integers(1, 4000, (B, cap)).astype(np.int32)
    lslot = np.where(rng.random((B, cap)) < 0.9, np.maximum(idx - span_l, -1), -1)
    rslot = np.where(
        rng.random((B, cap)) < 0.9, np.minimum(idx + span_r, n[:, None] - 1), -1
    ).astype(np.int32)
    rslot = np.where(rslot > idx, rslot, -1).astype(np.int32)
    lslot = lslot.astype(np.int32)
    got_p, got_n = candidate_lengths_slot_batch(
        jnp.asarray(lcp), jnp.asarray(lslot), jnp.asarray(rslot), jnp.asarray(n),
        cap=cap,
    )
    rank_iota = jnp.broadcast_to(jnp.arange(cap, dtype=jnp.int32)[None, :], (B, cap))
    ref_p, ref_n = _rangemin_xla_full(
        jnp.asarray(lcp), jnp.asarray(lslot), jnp.asarray(rslot), rank_iota, cap=cap
    )
    ok = bool(
        np.array_equal(np.asarray(got_p), np.asarray(ref_p))
        and np.array_equal(np.asarray(got_n), np.asarray(ref_n))
    )
    check("pallas range-min == xla full-table", ok)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    conformance()
    decoder_roundtrip()
    starts_parity()
    ansv_parity()
    parse_parity()
    rangemin_parity()
    sys.exit(FAIL)
