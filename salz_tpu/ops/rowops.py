"""Shared Pallas helpers for 512-slot row-local kernels.

Mosaic's layout pass rejects 512-wide vectors (vector_extract_strided_slice
checks fail), so wide-row kernels lay a 512-slot row out as 4 consecutive
128-lane tiles: cross-tile shifts become sublane rolls (axis 0) combined
with lane rolls, and row-internal gathers probe the 7 possible tile offsets
with rolled take_along_axis. Used by the ANSV in-row kernel
(salz_tpu/ops/ansv_tpu.py) and the range-min in-row kernel
(salz_tpu/ops/lcp.py).

All helpers operate on (br, 128) int32 refs where br is a multiple of 4 and
rows r, r+1, r+2, r+3 (r % 4 == 0) hold one 512-slot row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

W = 512  # row width in slots
LOGW = 9
T = 128  # lane-tile width
NT = W // T


class Row512:
    """Per-kernel context: iotas + shift/gather primitives for 512 rows."""

    def __init__(self, br: int, r0):
        self.br = br
        self.lane = jax.lax.broadcasted_iota(jnp.int32, (br, T), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (br, T), 0)
        self.sub = (row + r0) % NT  # tile index within the 512-row
        self.pos = self.sub * T + self.lane  # position in the row [0, W)
        self.bigrow = (row + r0) // NT

    def rollrows(self, a, d):
        """out[r] = a[r + d] with window wrap-around; valid uses stay inside
        one 4-row group (br % 4 == 0), so wrapped values are always masked
        by the callers."""
        if d % self.br == 0:
            return a
        return pltpu.roll(a, shift=(-d) % self.br, axis=0)

    def shift_left(self, a, h, fill):
        """out[pos] = a[pos + h] within the 512-row, fill past the end."""
        q, rl = h // T, h % T
        if rl == 0:
            sel = self.rollrows(a, q)
        else:
            t0 = pltpu.roll(self.rollrows(a, q), shift=T - rl, axis=1)
            t1 = pltpu.roll(self.rollrows(a, q + 1), shift=T - rl, axis=1)
            sel = jnp.where(self.lane < T - rl, t0, t1)
        return jnp.where(self.pos < W - h, sel, fill)

    def shift_right(self, a, h, fill):
        """out[pos] = a[pos - h] within the 512-row, fill before the start."""
        q, rl = h // T, h % T
        if rl == 0:
            sel = self.rollrows(a, -q)
        else:
            t0 = pltpu.roll(self.rollrows(a, -q), shift=rl, axis=1)
            t1 = pltpu.roll(self.rollrows(a, -q - 1), shift=rl, axis=1)
            sel = jnp.where(self.lane >= rl, t0, t1)
        return jnp.where(self.pos >= h, sel, fill)

    def gather(self, tab, j):
        """out = tab value at 512-row position j (j (br, T) in [0, W))."""
        st = j >> 7
        jl = j & (T - 1)
        d = st - self.sub  # tile offset, in (-NT, NT)
        g = jnp.zeros((self.br, T), jnp.int32)
        for dd in range(-(NT - 1), NT):
            cand = jnp.take_along_axis(self.rollrows(tab, dd), jl, axis=1)
            g = jnp.where(d == dd, cand, g)
        return g


def pick_br(rows: int, limit: int = 256) -> int:
    """Largest step height <= limit that divides `rows` in whole 4-row
    groups (rows % 4 == 0 required)."""
    br = NT
    while br < limit and rows % (2 * br) == 0:
        br *= 2
    br = min(br, limit)
    assert rows % br == 0 and br % NT == 0
    return br
