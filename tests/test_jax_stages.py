"""Golden tests: JAX pipeline stages vs the Python oracle (CPU backend)."""

import numpy as np
import pytest
import jax.numpy as jnp

from salz_tpu.oracle import pycodec as oc
from salz_tpu.ops.ansv import psv_nsv
from salz_tpu.ops.lcp import pair_lcp
from salz_tpu.ops.suffix_array import suffix_array_prefixes, suffix_array_with_ranks
from conftest import CORPUS_KINDS, make_corpus

CAP = 1024


def _pad(data: bytes, cap=CAP):
    buf = np.zeros(cap, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    return jnp.asarray(buf)


@pytest.mark.parametrize("kind", CORPUS_KINDS)
@pytest.mark.parametrize("n", [1, 2, 37, 500, 1024])
def test_suffix_array_matches_oracle(kind, n):
    data = make_corpus(kind, n, seed=n + 31)
    sa, _, _ = suffix_array_with_ranks(_pad(data), jnp.int32(n), cap=CAP)
    ref = oc.suffix_array(np.frombuffer(data, np.uint8))
    assert np.array_equal(np.asarray(sa)[:n], ref)


@pytest.mark.parametrize("kind", CORPUS_KINDS)
@pytest.mark.parametrize("n", [1, 2, 40, 777, 1024])
def test_psv_nsv_matches_oracle(kind, n):
    data = make_corpus(kind, n, seed=n + 37)
    sa, _, _ = suffix_array_with_ranks(_pad(data), jnp.int32(n), cap=CAP)
    psv, nsv = psv_nsv(sa, jnp.int32(n), cap=CAP)
    ref_psv, ref_nsv = oc.psv_nsv(oc.suffix_array(np.frombuffer(data, np.uint8)))
    assert np.array_equal(np.asarray(psv)[:n], ref_psv)
    assert np.array_equal(np.asarray(nsv)[:n], ref_nsv)


@pytest.mark.parametrize("kind", ["text", "runs", "zeros", "random"])
@pytest.mark.parametrize("n", [2, 100, 1000])
def test_candidate_lcps_match_oracle(kind, n):
    data = make_corpus(kind, n, seed=n + 41)
    text = np.frombuffer(data, np.uint8)
    sa, ckpt, _, t32, _ = suffix_array_prefixes(_pad(data), jnp.int32(n), cap=CAP)
    psv, nsv = psv_nsv(sa, jnp.int32(n), cap=CAP)
    idx = jnp.arange(CAP, dtype=jnp.int32)
    pl = pair_lcp(ckpt, t32, jnp.int32(n), psv, idx, cap=CAP)
    nl = pair_lcp(ckpt, t32, jnp.int32(n), nsv, idx, cap=CAP)
    _, ref_pl, _, ref_nl = oc.factorize(text, *oc.psv_nsv(oc.suffix_array(text)))
    assert np.array_equal(np.asarray(pl)[1:n], ref_pl[1:n])
    assert np.array_equal(np.asarray(nl)[1:n], ref_nl[1:n])


def test_pair_lcp_arbitrary_pairs():
    """pair_lcp against naive LCP for random (i, j) pairs."""
    rng = np.random.default_rng(5)
    n = 800
    data = make_corpus("runs", n, seed=5)
    text = np.frombuffer(data, np.uint8)
    _, ckpt, _, t32, _ = suffix_array_prefixes(_pad(data), jnp.int32(n), cap=CAP)
    i = rng.integers(0, n, size=CAP).astype(np.int32)
    j = rng.integers(0, n, size=CAP).astype(np.int32)
    lo, hi = np.minimum(i, j), np.maximum(i, j)
    got = np.asarray(
        pair_lcp(ckpt, t32, jnp.int32(n), jnp.asarray(lo), jnp.asarray(hi), cap=CAP)
    )
    for k in range(0, CAP, 17):
        a, b = int(lo[k]), int(hi[k])
        expect = 0
        while b + expect < n and text[a + expect] == text[b + expect]:
            expect += 1
        if a == b:
            expect = n - b  # degenerate equal pair: capped at suffix length
        assert got[k] == expect, (a, b)


def test_suffix_array_pool_rows_path_batch():
    """Exercise the phase-2 ROWS path (segmented pool sorts engage only at
    rung size >= 2^17, i.e. batch*cap >= 2^20): 32 x 32 KiB repetitive
    blocks vs the oracle SA. Data mixes long shared prefixes (deep tied
    groups) with text-like tails so the pool stays populated for several
    rounds (PERFORMANCE.md round-5 segmented pooled rounds)."""
    from salz_tpu.ops.suffix_array import suffix_array_prefixes_batch

    capb = 1 << 15
    B = 32
    rng = np.random.default_rng(7)
    blocks = []
    ns = []
    base = (b"abracadabra salz suffix doubling " * 64)[: 1 << 11]
    for b in range(B):
        # each block: repeated shared chunk + small unique perturbations
        reps = bytearray(base * ((capb // len(base)) + 1))
        for _ in range(8):
            p = int(rng.integers(0, capb - 4))
            reps[p] = int(rng.integers(0, 256))
        data = bytes(reps[:capb])
        n = capb - int(rng.integers(8, 64))
        blocks.append(np.frombuffer(data, np.uint8))
        ns.append(n)
    arr = jnp.asarray(np.stack(blocks))
    sa, _, _, _, _ = suffix_array_prefixes_batch(
        arr, jnp.asarray(np.array(ns, np.int32)), cap=capb
    )
    sa = np.asarray(sa)
    for b in range(B):
        ref = oc.suffix_array(blocks[b][: ns[b]])
        assert np.array_equal(sa[b][: ns[b]], ref), f"block {b}"


def test_suffix_array_pool_rows_fallback_zero_pages():
    """Huge tied runs (all-zero pages) must trip the max-run guard and take
    the global-sort fallback: SA still exact."""
    from salz_tpu.ops.suffix_array import suffix_array_prefixes_batch

    capb = 1 << 15
    B = 32
    rng = np.random.default_rng(11)
    blocks = []
    for b in range(B):
        data = bytearray(rng.integers(0, 4, capb, dtype=np.uint8).tobytes())
        data[1000:30000] = b"\x00" * 29000  # one dominant zero run
        blocks.append(np.frombuffer(bytes(data), np.uint8))
    arr = jnp.asarray(np.stack(blocks))
    ns = jnp.full((B,), capb - 8, jnp.int32)
    sa, _, _, _, _ = suffix_array_prefixes_batch(arr, ns, cap=capb)
    sa = np.asarray(sa)
    for b in (0, 7, 31):
        ref = oc.suffix_array(blocks[b][: capb - 8])
        assert np.array_equal(sa[b][: capb - 8], ref), f"block {b}"
