"""Emission tests: the closed-form scatter layout vs the scalar bit writer.

Random *synthetic* parses (not just DP outputs) exercise the writer state
machine — slot claiming, split bit writes, long GR3 unary runs — beyond what
real parses produce.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from salz_tpu import format as fmt
from salz_tpu.oracle import pycodec as oc
from salz_tpu.ops.emit import emit_stream, token_starts
from conftest import make_corpus

CAP = 1024


def _random_parse(rng, n):
    """A random structurally-valid parse of [0, n): offs/len arrays."""
    offs = np.zeros(n, np.int64)
    length = np.ones(n, np.int64)
    p = 1 if n > 1 else n
    while p < n:
        max_len = n - p
        if max_len >= 3 and rng.random() < 0.5:
            ln = int(rng.integers(3, min(max_len, 120) + 1))
            length[p] = ln
            offs[p] = int(rng.integers(1, p + 1))
            p += ln
        else:
            p += 1
    return offs, length


def _emit_device(data, offs, length):
    block = np.zeros(CAP, np.uint8)
    block[: len(data)] = np.frombuffer(data, np.uint8)
    o = np.zeros(CAP, np.int32)
    l = np.ones(CAP, np.int32)
    n = len(data) - fmt.TAIL_RESERVE
    o[:n] = offs
    l[:n] = length
    out, out_len, salz_len = emit_stream(
        jnp.asarray(block), jnp.int32(len(data)), jnp.asarray(o), jnp.asarray(l),
        cap=CAP,
    )
    return bytes(np.asarray(out)[: int(out_len)]), int(salz_len)


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("n", [9, 100, 1000])
def test_random_parse_streams_match_scalar_writer(seed, n):
    rng = np.random.default_rng(seed)
    data = make_corpus("text", n, seed=seed)
    offs, length = _random_parse(rng, n - fmt.TAIL_RESERVE)
    ref = oc.emit(np.frombuffer(data, np.uint8), offs, length)
    got, _ = _emit_device(data, offs, length)
    assert got == ref, f"seed={seed} n={n}"


def test_long_factor_gr3_unary_run():
    """A very long factor emits thousands of unary zero bits spanning slots."""
    data = b"\x00" * 1000
    n = 1000 - fmt.TAIL_RESERVE
    offs = np.zeros(n, np.int64)
    length = np.ones(n, np.int64)
    offs[1] = 1
    length[1] = n - 1  # one giant factor covering the rest of the text
    ref = oc.emit(np.frombuffer(data, np.uint8), offs, length)
    got, _ = _emit_device(data, offs, length)
    assert got == ref


def test_all_literals_exact_slot_fill():
    """W = multiple of 64 exercises the no-pending-claim finalization path."""
    data = make_corpus("random", 1024, seed=3)
    n = 1024 - fmt.TAIL_RESERVE
    offs = np.zeros(n, np.int64)
    length = np.ones(n, np.int64)
    ref = oc.emit(np.frombuffer(data, np.uint8), offs, length)
    got, _ = _emit_device(data, offs, length)
    assert got == ref


def test_token_starts_chain():
    length = np.ones(CAP, np.int32)
    length[1] = 5
    length[6] = 3
    starts = np.asarray(token_starts(jnp.asarray(length), jnp.int32(20), cap=CAP))
    expect = np.zeros(CAP, bool)
    # chain: 0 ->1 ->6 ->9 ->10 -> ... ->20
    expect[[0, 1, 6] + list(range(9, 20))] = True
    assert np.array_equal(starts[:20], expect[:20])


def test_multi_nibble_offsets_match_scalar_writer():
    """Offsets needing 2- and 3-nibble vnibbles ((o-1)>>8 >= 8) — regression
    for the terminator-digit bug only reachable with caps > 2048."""
    cap = 32768
    n = cap - fmt.TAIL_RESERVE
    rng = np.random.default_rng(17)
    data = make_corpus("text", cap, seed=17)
    offs = np.zeros(n, np.int64)
    length = np.ones(n, np.int64)
    # Plant factors at fixed spots with offsets across all vnibble classes
    # reachable in a 32 KiB block: m=1 (o<=2048), m=2 (<=18688), m=3.
    for p, o in [(3000, 300), (5000, 2500), (9000, 5000), (21000, 20000),
                 (25000, 18700), (30000, 29999)]:
        length[p] = 40
        offs[p] = o
    ref = oc.emit(np.frombuffer(data, np.uint8), offs, length)
    block = np.zeros(cap, np.uint8)
    block[:] = np.frombuffer(data, np.uint8)
    o32 = np.zeros(cap, np.int32); o32[:n] = offs
    l32 = np.ones(cap, np.int32); l32[:n] = length
    out, out_len, _ = emit_stream(
        jnp.asarray(block), jnp.int32(cap), jnp.asarray(o32), jnp.asarray(l32),
        cap=cap,
    )
    assert bytes(np.asarray(out)[: int(out_len)]) == ref


def test_salz_len_reports_raw_layout():
    data = make_corpus("random", 1000, seed=1)
    n = 1000 - fmt.TAIL_RESERVE
    got, salz_len = _emit_device(data, np.zeros(n, np.int64), np.ones(n, np.int64))
    # all-literal layout: 4 + K + 8*ceil(K/64), K = 1000 tokens
    assert salz_len == 4 + 1000 + 8 * ((1000 + 63) // 64)
    # PLAIN fallback chosen (raw layout bigger than plain + 4)
    assert got[3] == fmt.STREAM_TYPE_PLAIN
    assert len(got) == 4 + 1000
