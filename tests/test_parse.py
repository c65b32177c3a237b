"""Parse DP tests: sequential and chunked-fixpoint vs the oracle DP."""

import numpy as np
import pytest
import jax.numpy as jnp

from salz_tpu.oracle import pycodec as oc
from salz_tpu.ops.parse import optimal_parse_chunked, optimal_parse_sequential
from conftest import CORPUS_KINDS, make_corpus

CAP = 1024


def _oracle_parse(data: bytes):
    text = np.frombuffer(data, np.uint8)
    sa = oc.suffix_array(text)
    cands = oc.factorize(text, *oc.psv_nsv(sa))
    offs, length, cost = oc.optimize(*cands)
    return cands, offs, length, cost


def _padded_cands(cands, n):
    out = []
    for a in cands:
        buf = np.zeros(CAP, np.int32)
        buf[:n] = a
        out.append(jnp.asarray(buf))
    return out


@pytest.mark.parametrize("kind", CORPUS_KINDS)
@pytest.mark.parametrize("n", [2, 64, 555, 1024])
@pytest.mark.parametrize("impl", ["sequential", "chunked"])
def test_parse_matches_oracle(kind, n, impl):
    data = make_corpus(kind, n, seed=n + 51)
    cands, ref_offs, ref_len, ref_cost = _oracle_parse(data)
    po, pl, no, nl = _padded_cands(cands, n)
    fn = optimal_parse_sequential if impl == "sequential" else optimal_parse_chunked
    kw = {"cap": CAP} if impl == "sequential" else {"cap": CAP, "chunk": 128}
    offs, length, cost = fn(po, pl, no, nl, jnp.int32(n), **kw)
    offs, length, cost = map(np.asarray, (offs, length, cost))
    assert np.array_equal(length[1:n], ref_len[1:n]), kind
    assert np.array_equal(offs[1:n], ref_offs[1:n])
    assert np.array_equal(cost[1:n], ref_cost[1:n])


@pytest.mark.parametrize("chunk", [64, 256, 1024])
def test_chunked_chunk_size_invariance(chunk):
    data = make_corpus("repetitive", 1000, seed=77)
    cands, ref_offs, ref_len, _ = _oracle_parse(data)
    po, pl, no, nl = _padded_cands(cands, 1000)
    offs, length, _ = optimal_parse_chunked(
        po, pl, no, nl, jnp.int32(1000), cap=CAP, chunk=chunk
    )
    assert np.array_equal(np.asarray(length)[1:1000], ref_len[1:1000])
    assert np.array_equal(np.asarray(offs)[1:1000], ref_offs[1:1000])


def test_parse_adversarial_nested_factors():
    """Deep chains of dependent short factors stress the fixpoint iteration."""
    rng = np.random.default_rng(9)
    base = bytes(rng.integers(0, 4, size=12, dtype=np.uint8))
    data = (base * 90)[:1000]
    cands, ref_offs, ref_len, _ = _oracle_parse(data)
    po, pl, no, nl = _padded_cands(cands, len(data))
    offs, length, _ = optimal_parse_chunked(
        po, pl, no, nl, jnp.int32(len(data)), cap=CAP, chunk=64
    )
    assert np.array_equal(np.asarray(length)[1:1000], ref_len[1:1000])
    assert np.array_equal(np.asarray(offs)[1:1000], ref_offs[1:1000])


def test_chunked_far_edges_match_sequential():
    """Factors longer than the near-window (8192) exercise the outer
    value-iteration sweep; results must still equal the sequential DP."""
    import numpy as np
    from salz_tpu.ops.parse import (
        optimal_parse_chunked,
        optimal_parse_sequential,
    )

    cap = 1 << 15
    n = cap - 8
    rng = np.random.default_rng(11)
    # long repeats: 12K-periodic text gives candidate lengths ~ n - p - 12K
    base = rng.integers(0, 4, 12000, dtype=np.uint8)
    text = np.tile(base, cap // 12000 + 1)[:cap]
    from salz_tpu.oracle import pycodec as oc

    sa = oc.suffix_array(text[:n])
    psv, nsv = oc.psv_nsv(sa)
    po, pl_, no, nl_ = oc.factorize(text[:n], psv, nsv)
    pad = lambda a: jnp.asarray(
        np.concatenate([a.astype(np.int32), np.zeros(cap - n, np.int32)])
    )
    args = (pad(po), pad(pl_), pad(no), pad(nl_), jnp.int32(n))
    o1, l1, c1 = optimal_parse_chunked(*args, cap=cap)
    o2, l2, c2 = optimal_parse_sequential(*args, cap=cap)
    assert int(max(pl_.max(), nl_.max())) > 8192  # far edges present
    assert np.array_equal(np.asarray(c1)[: n + 1], np.asarray(c2)[: n + 1])
    assert np.array_equal(np.asarray(o1)[:n], np.asarray(o2)[:n])
    assert np.array_equal(np.asarray(l1)[:n], np.asarray(l2)[:n])
