"""Unit tests for the two-level (row-decomposed) range-min used by the TPU
candidate-length path (salz_tpu/ops/lcp.py): crossing queries against brute
force, including the lo-at-row-start same-row edge case. Rows are 512 slots
(salz_tpu/ops/rowops)."""

import numpy as np
import jax.numpy as jnp

from salz_tpu.ops.lcp import _crossing_rangemin, _rowmin_tables

CAP = 4096
_C = 512


def _suf_pre(vals):
    B, cap = vals.shape
    R = cap // _C
    v = vals.reshape(B, R, _C)
    suf = np.minimum.accumulate(v[:, :, ::-1], axis=2)[:, :, ::-1]
    pre = np.minimum.accumulate(v, axis=2)
    return suf.reshape(B, cap), pre.reshape(B, cap)


def test_crossing_rangemin_random():
    rng = np.random.default_rng(11)
    B = 3
    vals = rng.integers(0, 1000, size=(B, CAP)).astype(np.int32)
    suf, pre = _suf_pre(vals)
    rowtab, LR = _rowmin_tables(jnp.asarray(vals), cap=CAP)

    m = 256
    lo = rng.integers(0, CAP - 1, size=(B, m)).astype(np.int32)
    span = rng.integers(1, CAP // 2, size=(B, m)).astype(np.int32)
    hi = np.minimum(lo + span, CAP - 1).astype(np.int32)
    # Only ranges whose endpoints lie in different rows are legal inputs,
    # except lo exactly at a row start (the nsv row-final case).
    cross = ((lo >> 9) != (hi >> 9)) | (lo % _C == 0)
    got = np.asarray(
        _crossing_rangemin(
            jnp.asarray(suf), jnp.asarray(pre), rowtab, LR,
            jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(cross), cap=CAP,
        )
    )
    for b in range(B):
        for k in range(m):
            if not cross[b, k]:
                continue
            expect = vals[b, lo[b, k] : hi[b, k] + 1].min()
            assert got[b, k] == expect, (b, k, lo[b, k], hi[b, k])


def test_crossing_rangemin_same_row_start():
    """lo at a row start with hi in the same row (nsv of a row-final slot)."""
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 50, size=(1, CAP)).astype(np.int32)
    suf, pre = _suf_pre(vals)
    rowtab, LR = _rowmin_tables(jnp.asarray(vals), cap=CAP)
    lo = np.array([[512, 1024, 2048, 2048]], np.int32)
    hi = np.array([[515, 1024, 2559, 2060]], np.int32)
    present = np.ones((1, 4), bool)
    got = np.asarray(
        _crossing_rangemin(
            jnp.asarray(suf), jnp.asarray(pre), rowtab, LR,
            jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(present), cap=CAP,
        )
    )
    for k in range(4):
        assert got[0, k] == vals[0, lo[0, k] : hi[0, k] + 1].min()
