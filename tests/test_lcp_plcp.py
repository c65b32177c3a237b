"""Direct conformance tests for adjacent_lcp_batch's Φ/PLCP path.

The PLCP (irreducible-LCP) path engages when a block has more than cap/128
adjacent SA pairs sharing >= 32-byte prefixes (survivor-heavy blocks). These
tests pin its exactness against a naive per-slot LCP on corpora chosen to
hit each ladder rung, alongside the tiny-bucket path taken by ordinary text.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from salz_tpu.ops.lcp import adjacent_lcp_batch
from salz_tpu.ops.suffix_array import suffix_array_prefixes_batch
from conftest import make_corpus


def _naive_adjacent_lcp(data: bytes, sa: np.ndarray) -> np.ndarray:
    """lcp_adj[k] = LCP(sa[k-1], sa[k]) capped at n - max(pair), 0 at k=0."""
    n = len(data)
    t = np.frombuffer(data, np.uint8)
    out = np.zeros(n, np.int64)
    for k in range(1, n):
        a, b = int(sa[k - 1]), int(sa[k])
        limit = n - max(a, b)
        l = 0
        while l < limit and t[a + l] == t[b + l]:
            l += 1
        out[k] = l
    return out


def _device_lcp(data: bytes, cap: int) -> np.ndarray:
    buf = np.zeros(cap, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    blocks = jnp.asarray(buf)[None]
    ns = jnp.asarray([len(data)], jnp.int32)
    sa, ckpt, nlv, t32, p32 = suffix_array_prefixes_batch(blocks, ns, cap=cap)
    lcp = adjacent_lcp_batch(ckpt, nlv, ns, sa, t32, p32, cap=cap)
    return np.asarray(sa[0]), np.asarray(lcp[0])


def _paired_motifs(n_pairs: int, motif_len: int, seed: int) -> bytes:
    """Distinct random motifs, each written twice in a row: every pair
    contributes one long match whose PLCP is irreducible — scales the
    irreducible-survivor count directly."""
    rng = np.random.default_rng(seed)
    out = bytearray()
    for _ in range(n_pairs):
        m = rng.integers(0, 256, size=motif_len, dtype=np.uint8).tobytes()
        out += m + m
    return bytes(out)


@pytest.mark.parametrize(
    "kind,n,cap",
    [
        ("zeros", 4090, 4096),        # saturated: ~all survivors, 1 irreducible
        ("runs", 4090, 4096),         # run-heavy: plcp path, few irreducible
        ("repetitive", 4000, 4096),   # long motif repeats
        ("text", 1018, 1024),         # survivor count > 512 floor at tiny cap
    ],
)
def test_plcp_path_matches_naive(kind, n, cap):
    data = make_corpus(kind, n, seed=n + 7)
    sa, got = _device_lcp(data, cap)
    want = _naive_adjacent_lcp(data, sa[: len(data)])
    assert np.array_equal(got[: len(data)], want)


def test_plcp_mid_rung_many_irreducible():
    """~800 paired 40-byte motifs at cap 64 KiB: irreducible survivors land
    between the cap/128 (512) and cap/32 (2048) rungs, exercising bucket
    selection and the descent + cummax fill together."""
    cap = 1 << 16
    data = _paired_motifs(n_pairs=815, motif_len=40, seed=3)[: cap - 8]
    sa, got = _device_lcp(data, cap)
    want = _naive_adjacent_lcp(data, sa[: len(data)])
    assert np.array_equal(got[: len(data)], want)


def test_plcp_mixed_survivors_and_short():
    """Mixed block: a long-repeat half plus a high-entropy half — reducible
    fills must not leak across the regime boundary."""
    cap = 8192
    half = make_corpus("repetitive", 3500, seed=11)
    rnd = make_corpus("random", 4000, seed=12)
    data = (half + rnd)[: cap - 8]
    sa, got = _device_lcp(data, cap)
    want = _naive_adjacent_lcp(data, sa[: len(data)])
    assert np.array_equal(got[: len(data)], want)


def test_reducible_survivor_with_zero_predecessor():
    """Φ(i) = Φ(i-1)+1 with PLCP[i-1] = 0 voids the reducibility identity
    (the mismatching byte pair is not part of the shifted comparison):
    construct 'aY...bY...' with a unique 40-byte high-alphabet motif Y so
    the suffix after 'b' is a >= 32-byte survivor whose predecessor ('bY',
    PLCP 0 against 'aY') is a non-survivor. The old fill produced -1 here
    (found on real source-code corpora at level 0)."""
    rng = np.random.default_rng(7)
    Y = rng.integers(0x80, 0x100, 40, dtype=np.uint8).tobytes()
    P = rng.integers(0x80, 0x100, 300, dtype=np.uint8).tobytes()
    Q = rng.integers(0x80, 0x100, 300, dtype=np.uint8).tobytes()
    # Survivor-heavy filler (one long repeat) forces the Φ/PLCP path
    # (survivors > cap/128); the aY/bY construct plants the void identity.
    motif = rng.integers(0x80, 0x100, 64, dtype=np.uint8).tobytes()
    filler = motif * 60  # ~3840 survivor positions
    data = filler + b"a" + Y + P + b"b" + Y + Q
    cap = 8192
    sa, lcp = _device_lcp(data, cap)
    ref = _naive_adjacent_lcp(data, sa[: len(data)])
    got = lcp[: len(data)]
    assert np.array_equal(got[1:], ref[1:]), (
        np.nonzero(got[1 : len(data)] != ref[1:])[0][:10],
    )
