"""sortops.sort_rows must be byte-identical to stable jax.lax.sort.

The merge path only engages for long rows (>= 512 KiB), so these tests
lower _MIN_LEN and exercise both the XLA-substage path and the Pallas tile
pass (interpret mode on CPU), across duplicate-heavy and unique keys,
multiple key counts, payloads, and non-engaging shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from salz_tpu.ops import sortops


@pytest.fixture(autouse=True)
def _small_min_len(monkeypatch):
    monkeypatch.setattr(sortops, "_MIN_LEN", 1 << 10)


def _ref(ops, num_keys):
    return jax.lax.sort(tuple(ops), num_keys=num_keys, dimension=1)


def _check(ops, num_keys, **kw):
    got = sortops.sort_rows(ops, num_keys, **kw)
    want = _ref(ops, num_keys)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("B,L", [(1, 4096), (2, 2048), (1, 8192), (4, 1024)])
@pytest.mark.parametrize("nkeys", [1, 2, 3])
def test_matches_stable_sort_duplicates(B, L, nkeys):
    rng = np.random.default_rng(B * 100 + L + nkeys)
    # heavy duplicates: few distinct values so stability is really exercised
    ops = [
        jnp.asarray(rng.integers(0, 7, (B, L), dtype=np.int32))
        for _ in range(nkeys)
    ] + [jnp.asarray(rng.integers(0, 1 << 30, (B, L), dtype=np.int32))]
    _check(ops, nkeys, tile=512)


def test_unique_keys_skip_tiebreak():
    rng = np.random.default_rng(7)
    B, L = 1, 4096
    perm = rng.permutation(L).astype(np.int32)[None, :]
    pay = rng.integers(0, 1 << 30, (B, L), dtype=np.int32)
    got = sortops.sort_rows(
        [jnp.asarray(perm), jnp.asarray(pay)], 1, unique=True, tile=512
    )
    want = _ref([jnp.asarray(perm), jnp.asarray(pay)], 1)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_adversarial_patterns():
    B, L = 1, 4096
    cases = [
        np.zeros((B, L), np.int32),
        np.arange(L, dtype=np.int32)[None, :],
        np.arange(L, dtype=np.int32)[None, ::-1].copy(),
        np.tile(np.array([3, 1, 2, 1], np.int32), L // 4)[None, :],
        np.concatenate(
            [np.full(L // 2, -5, np.int32), np.full(L // 2, 2**31 - 1, np.int32)]
        )[None, :],
    ]
    for arr in cases:
        pay = np.arange(L, dtype=np.int32)[None, :] * 3
        _check([jnp.asarray(arr), jnp.asarray(pay)], 1, tile=512)


def test_negative_keys():
    rng = np.random.default_rng(3)
    B, L = 2, 2048
    k = rng.integers(-(1 << 30), 1 << 30, (B, L), dtype=np.int32)
    _check([jnp.asarray(k)], 1, tile=256)


def test_short_rows_fall_back_to_lax_sort():
    # L below _MIN_LEN (not patched here beyond 1024): shape (8, 64)
    rng = np.random.default_rng(5)
    k = jnp.asarray(rng.integers(0, 100, (8, 64), dtype=np.int32))
    _check([k], 1)


def test_wide_batch_falls_back():
    rng = np.random.default_rng(6)
    k = jnp.asarray(rng.integers(0, 100, (16, 2048), dtype=np.int32))
    _check([k], 1, tile=512)


def test_pallas_interpret_tile_pass(monkeypatch):
    """Exercise the real Pallas kernel via interpret mode on CPU."""
    monkeypatch.setattr(sortops, "_FORCE_INTERPRET", True)
    rng = np.random.default_rng(11)
    B, L = 1, 4096
    ops = [
        jnp.asarray(rng.integers(0, 50, (B, L), dtype=np.int32)),
        jnp.asarray(rng.integers(0, 1 << 30, (B, L), dtype=np.int32)),
    ]
    _check(ops, 1, tile=512)


def test_pallas_interpret_multilevel(monkeypatch):
    monkeypatch.setattr(sortops, "_FORCE_INTERPRET", True)
    rng = np.random.default_rng(12)
    B, L = 1, 16384
    ops = [
        jnp.asarray(rng.integers(0, 9, (B, L), dtype=np.int32)),
        jnp.asarray(rng.integers(0, 9, (B, L), dtype=np.int32)),
        jnp.asarray(rng.integers(0, 1 << 30, (B, L), dtype=np.int32)),
    ]
    _check(ops, 2, tile=2048)
