#!/usr/bin/env python3
"""Levels 6-9 on device: encode real-corpus blocks at big caps (4-16 MiB),
assert byte-identity vs the native oracle + roundtrip, report MB/s and the
device memory plan actually holding (VERDICT.md round-1 item 2).

Usage: python scripts/verify_bigcap.py [levels...]   (default: 6 7 8 9)
Corpora: corpora/*.bin (run scripts/make_corpora.py first); falls back to
the synthetic bench corpus if absent.
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

from salz_tpu import format as fmt
from salz_tpu import native
from salz_tpu.config import SalzConfig
from salz_tpu.ops.encoder import encode_blocks_device

FAIL = 0


def check(name, ok):
    global FAIL
    print(f"{'PASS' if ok else 'FAIL'}  {name}", flush=True)
    if not ok:
        FAIL = 1


def corpus_bytes(total: int) -> bytes:
    """Real-file corpus of `total` bytes WITHOUT self-duplication.

    Doubling (`data += data`) creates multi-MiB exact repeats that force the
    doubling SA through every level and saturate the LCP buckets — a
    legitimate adversarial case, but not representative; scripts/make_corpora
    builders pull as much distinct on-image data as needed instead."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_corpora import build_binary, build_source, build_text

    parts = []
    have = 0
    for name, build in (
        ("text", build_text), ("source", build_source), ("binary", build_binary)
    ):
        path = f"corpora/{name}.bin"
        part = (
            open(path, "rb").read() if os.path.exists(path) else build(8 << 20)
        )
        parts.append(part)
        have += len(part)
    # Extend with DISTINCT continuations of the source/binary pools (skip the
    # prefix already included above), never by repeating what we have.
    for name, build in (("source", build_source), ("binary", build_binary)):
        if have >= total:
            break
        base = len(parts[1] if name == "source" else parts[2])
        more = build(base + (total - have))[base:]
        parts.append(more)
        have += len(more)
    if have < total:
        from bench import make_corpus

        parts.append(make_corpus(total - have))
    return b"".join(parts)[:total]


def run_level(level: int) -> None:
    cap = fmt.block_size_for_level(level)
    cfg = SalzConfig(level=level).validate()
    B = cfg.batch
    data = corpus_bytes(B * cap - 1)
    blocks = [data[i : i + cap] for i in range(0, len(data), cap)]
    padded = np.zeros((B, cap), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, blk in enumerate(blocks):
        padded[i, : len(blk)] = np.frombuffer(blk, np.uint8)
        lens[i] = len(blk)

    t0 = time.perf_counter()
    out, out_len, _ = encode_blocks_device(
        jnp.asarray(padded), jnp.asarray(lens), cap=cap
    )
    np.asarray(jax.device_get(out_len.ravel()[:1]))
    t_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    out, out_len, _ = encode_blocks_device(
        jnp.asarray(padded), jnp.asarray(lens), cap=cap
    )
    np.asarray(jax.device_get(out_len.ravel()[:1]))
    dt = time.perf_counter() - t0
    mbps = sum(lens) / dt / 1e6

    out = np.asarray(out)
    out_len = np.asarray(out_len)
    ok = True
    for i, blk in enumerate(blocks):
        seg = bytes(out[i, : int(out_len[i])])
        ref = native.encode_block(blk)
        ok &= seg == ref and native.decode_block(seg, cap) == blk
    check(
        f"level {level} (cap {cap >> 20} MiB, batch {B}): conformance "
        f"[{mbps:.2f} MB/s steady, first {t_first:.0f}s]",
        ok,
    )


if __name__ == "__main__":
    levels = [int(a) for a in sys.argv[1:]] or [6, 7, 8, 9]
    print(f"devices: {jax.devices()}", flush=True)
    for lv in levels:
        run_level(lv)
    sys.exit(FAIL)
