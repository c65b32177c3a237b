"""The Pallas far path (segment walk in optimal_parse_chunked_batch) on CPU.

The TPU-only sweep kernel normally runs just on the chip (verify_tpu.py);
interpret mode lets the CPU tier pin the far-edge SEGMENT WALK — one sweep
per WINDOW-sized segment, far contributions gathered from already-final
later segments — against the sequential DP. Long-period text guarantees
factor candidates far beyond the near window.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from salz_tpu.ops import parse as parse_mod
from salz_tpu.oracle import pycodec as oc


@pytest.fixture()
def force_interpret(monkeypatch):
    monkeypatch.setattr(parse_mod, "_FORCE_INTERPRET", True)


def test_far_segment_walk_matches_sequential(force_interpret):
    cap = 1 << 14
    n = cap - 8
    rng = np.random.default_rng(21)
    # 3000-periodic text: candidate lengths up to ~n - p - 3000 — far edges
    # (> WINDOW = 2048) are dense, and chains of them span many segments.
    base = rng.integers(0, 4, 3000, dtype=np.uint8)
    text = np.tile(base, cap // 3000 + 1)[:cap]

    sa = oc.suffix_array(text[:n])
    psv, nsv = oc.psv_nsv(sa)
    po, pl_, no, nl_ = oc.factorize(text[:n], psv, nsv)
    pad = lambda a: jnp.asarray(
        np.concatenate([a.astype(np.int32), np.zeros(cap - n, np.int32)])
    )
    args = (pad(po), pad(pl_), pad(no), pad(nl_), jnp.int32(n))
    assert int(max(pl_.max(), nl_.max())) > 2048  # far edges present

    o1, l1, c1 = parse_mod.optimal_parse_chunked(*args, cap=cap)
    o2, l2, c2 = parse_mod.optimal_parse_sequential(*args, cap=cap)
    assert np.array_equal(np.asarray(c1)[: n + 1], np.asarray(c2)[: n + 1])
    assert np.array_equal(np.asarray(o1)[:n], np.asarray(o2)[:n])
    assert np.array_equal(np.asarray(l1)[:n], np.asarray(l2)[:n])
