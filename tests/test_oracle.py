"""Tests for the scalar Python oracle codec against brute-force ground truth.

Strategy per SURVEY.md §4: the oracle is the conformance anchor for the TPU
pipeline, so it is itself validated stage-by-stage against naive O(n^2)
implementations on small inputs, plus roundtrip on all corpus kinds.
"""

import numpy as np
import pytest

from salz_tpu import format as fmt
from salz_tpu.oracle import pycodec as oc
from conftest import CORPUS_KINDS, make_corpus


def naive_suffix_array(text: bytes) -> np.ndarray:
    return np.array(
        sorted(range(len(text)), key=lambda i: text[i:]), dtype=np.int32
    )


def naive_psv_nsv(sa: np.ndarray):
    n = len(sa)
    psv = np.full(n, -1, dtype=np.int64)
    nsv = np.full(n, -1, dtype=np.int64)
    for k in range(n):
        p = sa[k]
        for j in range(k - 1, -1, -1):
            if sa[j] < p:
                psv[p] = sa[j]
                break
        for j in range(k + 1, n):
            if sa[j] < p:
                nsv[p] = sa[j]
                break
    return psv, nsv


def naive_lcp(text: bytes, i: int, j: int) -> int:
    n = len(text)
    l = 0
    while j + l < n and text[i + l] == text[j + l]:
        l += 1
    return l


@pytest.mark.parametrize("kind", CORPUS_KINDS)
@pytest.mark.parametrize("n", [1, 2, 3, 17, 100, 513])
def test_suffix_array_matches_naive(kind, n):
    data = make_corpus(kind, n, seed=n)
    text = np.frombuffer(data, dtype=np.uint8)
    assert np.array_equal(oc.suffix_array(text), naive_suffix_array(data))


@pytest.mark.parametrize("kind", CORPUS_KINDS)
@pytest.mark.parametrize("n", [1, 2, 40, 257])
def test_psv_nsv_matches_naive(kind, n):
    data = make_corpus(kind, n, seed=n + 1)
    text = np.frombuffer(data, dtype=np.uint8)
    sa = oc.suffix_array(text)
    psv, nsv = oc.psv_nsv(sa)
    npsv, nnsv = naive_psv_nsv(sa)
    assert np.array_equal(psv, npsv)
    assert np.array_equal(nsv, nnsv)


@pytest.mark.parametrize("kind", CORPUS_KINDS)
@pytest.mark.parametrize("n", [2, 50, 300])
def test_factorize_lengths_are_true_lcps(kind, n):
    """The seeded LCP skip must equal the unseeded true LCP (KKP lemma)."""
    data = make_corpus(kind, n, seed=n + 2)
    text = np.frombuffer(data, dtype=np.uint8)
    sa = oc.suffix_array(text)
    psv, nsv = oc.psv_nsv(sa)
    psv_offs, psv_len, nsv_offs, nsv_len = oc.factorize(text, psv, nsv)
    for pos in range(1, n):
        if psv[pos] != -1:
            assert psv_len[pos] == naive_lcp(data, int(psv[pos]), pos), pos
            assert psv_offs[pos] == pos - psv[pos]
        else:
            assert psv_len[pos] == 0
        if nsv[pos] != -1:
            assert nsv_len[pos] == naive_lcp(data, int(nsv[pos]), pos), pos
        else:
            assert nsv_len[pos] == 0


def naive_optimal_cost(cands, n):
    """Independent forward Dijkstra-free DP (graph is a DAG ordered by position)."""
    psv_offs, psv_len, nsv_offs, nsv_len = cands
    INF = 1 << 60
    cost = [INF] * (n + 1)
    cost[n] = 0
    for p in range(n - 1, 0, -1):
        best = 9 + cost[p + 1]
        for offs, ln in ((psv_offs[p], psv_len[p]), (nsv_offs[p], nsv_len[p])):
            if ln >= 3:
                c = 1 + fmt.factor_offs_bitsize(int(offs)) + \
                    fmt.factor_len_bitsize(int(ln)) + cost[p + ln]
                best = min(best, c)
        cost[p] = best
    return cost


@pytest.mark.parametrize("kind", ["text", "repetitive", "runs", "random"])
@pytest.mark.parametrize("n", [2, 64, 400])
def test_optimize_costs_match_independent_dp(kind, n):
    data = make_corpus(kind, n, seed=n + 3)
    text = np.frombuffer(data, dtype=np.uint8)
    sa = oc.suffix_array(text)
    cands = oc.factorize(text, *oc.psv_nsv(sa))
    offs, length, cost = oc.optimize(*cands)
    ncost = naive_optimal_cost(cands, n)
    for p in range(1, n):
        assert cost[p] == ncost[p], p
    # Chosen parse must be achievable and consistent with costs.
    p = 1 if n > 1 else 0
    while 0 < p < n:
        ln = int(length[p])
        if ln == 1:
            assert cost[p] == 9 + cost[p + 1]
            p += 1
        else:
            o = int(offs[p])
            assert ln >= 3 and p + ln <= n
            assert cost[p] == 1 + fmt.factor_offs_bitsize(o) + \
                fmt.factor_len_bitsize(ln) + cost[p + ln]
            p += ln


@pytest.mark.parametrize("kind", CORPUS_KINDS)
@pytest.mark.parametrize("n", [8, 9, 10, 16, 100, 1000, 4096, 65 * 1024])
def test_roundtrip(kind, n):
    data = make_corpus(kind, n, seed=n + 4)
    seg = oc.encode_block(data)
    assert oc.decode_block(seg, dst_cap=n) == data


def test_roundtrip_all_bytes():
    data = bytes(range(256)) * 5
    seg = oc.encode_block(data)
    assert oc.decode_block(seg) == data


def test_block_too_short_raises():
    for n in range(0, 8):
        with pytest.raises(oc.SalzEncodeError):
            oc.encode_block(b"x" * n)


def test_block_exactly_8_bytes():
    # Divergence from reference UB (FORMAT.md §4): valid PLAIN stream.
    data = b"abcdefgh"
    seg = oc.encode_block(data)
    hdr = int.from_bytes(seg[:4], "little")
    assert hdr >> 24 == fmt.STREAM_TYPE_PLAIN
    assert oc.decode_block(seg) == data


def test_plain_fallback_on_incompressible():
    data = make_corpus("random", 4096, seed=99)
    seg = oc.encode_block(data)
    hdr = int.from_bytes(seg[:4], "little")
    assert hdr >> 24 == fmt.STREAM_TYPE_PLAIN
    assert len(seg) == 4 + 4096
    assert oc.decode_block(seg) == data


def test_compressible_beats_plain():
    data = make_corpus("zeros", 4096)
    seg = oc.encode_block(data)
    hdr = int.from_bytes(seg[:4], "little")
    assert hdr >> 24 == fmt.STREAM_TYPE_SALZ
    assert len(seg) < 200
    assert oc.decode_block(seg) == data


def test_stream_header_fields():
    data = make_corpus("text", 1000, seed=1)
    seg = oc.encode_block(data)
    hdr = int.from_bytes(seg[:4], "little")
    assert (hdr & 0xFFFFFF) == len(seg) - 4


def test_exact_capacity_abort_matches_reference():
    """Near-incompressible full blocks can overflow encoded_len_max mid-emission;
    the reference then FAILS (no PLAIN fallback) because the fallback check only
    runs after successful emission (salz.c:755). FORMAT.md §1.2 / quirk note."""
    data = make_corpus("random", 4096, seed=2)  # seed known to pick 1-3 factors
    seg = oc.encode_block(data)  # unbounded cap -> PLAIN fallback
    assert int.from_bytes(seg[:4], "little") >> 24 == fmt.STREAM_TYPE_PLAIN
    with pytest.raises(oc.SalzEncodeError):
        oc.encode_block(data, dst_cap=fmt.encoded_len_max(4096))


def test_decode_rejects_garbage():
    with pytest.raises(oc.SalzDecodeError):
        oc.decode_block(b"")
    with pytest.raises(oc.SalzDecodeError):
        oc.decode_block(bytes([0, 0, 0, 0xFF]))  # type 255
    with pytest.raises(oc.SalzDecodeError):
        oc.decode_block(bytes([10, 0, 0, 0]))  # truncated payload
