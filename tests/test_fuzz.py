"""Adversarial/property fuzz tier (SURVEY §4 tier 2; VERDICT round-2 item 9).

Seeded randomized streams hammering exactly the format edges the structured
tests only brush:

* vnibble sizes/patterns at EVERY threshold boundary +-1 (format closed
  forms vs the scalar carry-loop writer, and end-to-end through emission);
* GR3 lengths whose unary part spans multiple 64-bit word refills;
* factor offsets near the 2^24 format maximum (level-9-scale blocks are
  emulated with a small cap: offsets only need a big vnibble, not big
  memory — the emission path is offset-value-, not position-, dependent);
* random structurally-valid parses with heavy-tailed length/offset mixes
  that push the emission tcap/scap ladder across its rungs;
* random/adversarial byte strings (noisy periodic, run-of-runs, de Bruijn-
  ish) through the FULL jax pipeline vs the scalar oracle, plus roundtrip.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from salz_tpu import format as fmt
from salz_tpu.oracle import pycodec as oc
from salz_tpu.ops.emit import emit_stream
from salz_tpu.ops.encoder import encode_block_device
from conftest import make_corpus

CAP = 2048


def _emit_device(data, offs, length, cap=CAP):
    block = np.zeros(cap, np.uint8)
    block[: len(data)] = np.frombuffer(data, np.uint8)
    o = np.zeros(cap, np.int32)
    l = np.ones(cap, np.int32)
    n = len(data) - fmt.TAIL_RESERVE
    o[:n] = offs
    l[:n] = length
    out, out_len, _ = emit_stream(
        jnp.asarray(block), jnp.int32(len(data)), jnp.asarray(o),
        jnp.asarray(l), cap=cap,
    )
    return bytes(np.asarray(out)[: int(out_len)])


# ---------------------------------------------------------------------------
# vnibble thresholds
# ---------------------------------------------------------------------------


def test_vnibble_size_at_every_threshold_boundary():
    from salz_tpu.format import VNIBBLE_THRESHOLDS, vnibble_size

    for m, thr in enumerate(VNIBBLE_THRESHOLDS, start=1):
        for v in (thr - 1, thr, thr + 1):
            if v < 0 or v > 2**31 - 1:
                continue
            expect = m if v < thr else m + 1
            assert vnibble_size(int(v)) == expect, (m, v)


def test_vnibble_boundary_offsets_end_to_end():
    """Factor offsets whose (offs-1)>>8 sits at a vnibble threshold +-1;
    emitted stream must match the scalar writer and decode back."""
    from salz_tpu.format import VNIBBLE_THRESHOLDS

    # offsets representable within a CAP-sized block are limited; emulate
    # big offsets by checking the WRITER path directly per boundary value.
    for thr in VNIBBLE_THRESHOLDS[:4]:  # up to 4680 -> offsets ~1.2M
        for hi in (thr - 1, thr, thr + 1):
            offs = (hi << 8) + 1 + 5
            if offs >= (1 << 24):
                continue
            w = oc.BitWriter(1 << 10)
            w.write_bit(1)
            w.write_vnibble((offs - fmt.FACTOR_OFFSET_MIN) >> 8)
            w.write_u8((offs - fmt.FACTOR_OFFSET_MIN) & 0xFF)
            w.write_gr3(0)
            w.finalize_bits()
            r = oc.BitReader(bytes(w.dst[4 : w.dst_pos]))
            assert r.read_bit() == 1
            got = ((r.read_vnibble() << 8) | r.read_u8()) + 1
            assert got == offs, offs


# ---------------------------------------------------------------------------
# GR3 long unary + ladder edges via synthetic parses
# ---------------------------------------------------------------------------


def _parse_with(lengths_offsets, n):
    offs = np.zeros(n, np.int64)
    length = np.ones(n, np.int64)
    p = 1
    for ln, of in lengths_offsets:
        if p >= n:
            break
        ln = min(ln, n - p)
        if ln >= 3:
            length[p] = ln
            offs[p] = min(of, p)
            p += ln
        else:
            p += 1
    return offs, length


@pytest.mark.parametrize("seed", range(6))
def test_gr3_unary_spanning_word_refills(seed):
    """Factor lengths with unary parts > 64 bits (length-3 >= 8*64 = 515+)
    force the scalar writer through multiple word refills; the scatter
    formulation must place every slot identically."""
    rng = np.random.default_rng(seed)
    n = CAP - fmt.TAIL_RESERVE
    data = make_corpus("runs", CAP, seed=seed)
    mix = []
    p = 1
    while p < n - 4:
        ln = int(rng.choice([600, 1030, 1500, 3, 17]))
        mix.append((ln, int(rng.integers(1, p + 1))))
        p += max(ln, 1)
    offs, length = _parse_with(mix, n)
    ref = oc.emit(np.frombuffer(data, np.uint8), offs, length)
    got = _emit_device(data, offs, length)
    assert got == ref


@pytest.mark.parametrize("seed", range(10))
def test_heavy_tailed_random_parses(seed):
    """Heavy-tailed random parses push token counts across the emission
    tcap rung ladder (all-literals ~ cap tokens at one extreme, a few giant
    factors at the other)."""
    rng = np.random.default_rng(1000 + seed)
    n = CAP - fmt.TAIL_RESERVE
    data = make_corpus(
        ["text", "random", "zeros", "repetitive"][seed % 4], CAP, seed=seed
    )
    offs = np.zeros(n, np.int64)
    length = np.ones(n, np.int64)
    p = 1
    lit_bias = seed % 3 == 0  # one third: literal floods (token count ~ n)
    while p < n:
        if not lit_bias and rng.random() < 0.6 and n - p >= 3:
            ln = int(min(rng.pareto(0.7) * 3 + 3, n - p))
            length[p] = ln
            offs[p] = int(rng.integers(1, p + 1))
            p += ln
        else:
            p += 1
    ref = oc.emit(np.frombuffer(data, np.uint8), offs, length)
    got = _emit_device(data, offs, length)
    assert got == ref


# ---------------------------------------------------------------------------
# full-pipeline fuzz vs oracle
# ---------------------------------------------------------------------------


def _adversarial_corpus(rng, n):
    kind = rng.integers(0, 5)
    if kind == 0:  # noisy periodic: long repeats with scattered mutations
        period = int(rng.integers(3, 40))
        base = rng.integers(0, 256, period, dtype=np.uint8)
        out = np.tile(base, n // period + 1)[:n].copy()
        flips = rng.integers(0, n, max(1, n // 97))
        out[flips] = rng.integers(0, 256, flips.size, dtype=np.uint8)
        return out.tobytes()
    if kind == 1:  # run-of-runs
        out = bytearray()
        while len(out) < n:
            out += bytes([int(rng.integers(0, 4))]) * int(rng.integers(1, 200))
        return bytes(out[:n])
    if kind == 2:  # random with embedded copies
        out = bytearray(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        for _ in range(8):
            src = int(rng.integers(0, max(1, n // 2)))
            dst = int(rng.integers(src + 1, n))
            ln = int(rng.integers(4, min(300, n - dst) + 1))
            out[dst : dst + ln] = out[src : src + ln]
        return bytes(out)
    if kind == 3:  # two-symbol alternation with phase errors
        out = bytearray((b"ab" * n)[:n])
        for i in rng.integers(0, n, max(1, n // 53)):
            out[int(i)] = ord("c")
        return bytes(out)
    return rng.integers(0, 256, n, dtype=np.uint8).tobytes()


@pytest.mark.parametrize("seed", range(16))
def test_full_pipeline_fuzz_vs_oracle(seed):
    rng = np.random.default_rng(5000 + seed)
    n = int(rng.integers(9, CAP + 1))
    data = _adversarial_corpus(rng, n)
    ref = oc.encode_block(data)
    block = np.zeros(CAP, np.uint8)
    block[:n] = np.frombuffer(data, np.uint8)
    out, out_len, _ = encode_block_device(
        jnp.asarray(block), jnp.int32(n), cap=CAP
    )
    got = bytes(np.asarray(out)[: int(out_len)])
    assert got == ref, f"seed={seed} n={n}"
    assert oc.decode_block(got, n) == data
