"""The jitted per-block SALZ encoder: SA -> ANSV -> LCP -> parse -> emit.

This is the TPU replacement for the reference's salz_encode_safe pipeline
(salz.c:777-823): one traced program per block-capacity, fully static shapes,
dynamic valid length. Batch across blocks with jax.vmap; shard the batch axis
over a mesh with salz_tpu.parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from salz_tpu import format as fmt
from salz_tpu.format import TAIL_RESERVE
from salz_tpu.ops.ansv import ansv_slots_vals_batch
from salz_tpu.ops.emit import emit_stream_batch
from salz_tpu.ops.lcp import adjacent_lcp_batch, candidate_lengths_slot_batch
from salz_tpu.ops.parse import (
    optimal_parse_chunked_batch,
    optimal_parse_sequential,
)
from salz_tpu.ops.suffix_array import suffix_array_prefixes_batch


def out_capacity(cap: int) -> int:
    """Static output buffer size for a block capacity (emit_stream contract)."""
    return 4 + cap + ((cap + 63) // 64) * 8 + 16


@functools.partial(jax.jit, static_argnames=("cap", "parse"))
def encode_blocks_device(
    blocks: jax.Array, block_lens: jax.Array, *, cap: int, parse: str = "chunked"
):
    """Encode a batch of padded blocks (uint8[B, cap], valid prefixes >= 8).

    The heavy irregular stages (ANSV, LCP, parse) are BATCH-NATIVE — flat
    1-D gathers with per-block offsets and batch-level conds — because
    vmapped gathers and vmapped lax.cond (which executes both branches) are
    an order of magnitude slower on TPU. The sort-bound suffix array and the
    emission (incl. the Pallas token-start kernels) vmap fine.

    Returns (out, out_len, salz_len):
      out: uint8[B, out_capacity(cap)] — segments (header included), padded.
      out_len: int32[B] — segment lengths after the PLAIN-fallback decision.
      salz_len: int32[B] — raw SALZ layout sizes; callers reproduce the
        reference's capacity-abort by erroring when salz_len > dst_cap
        (FORMAT.md §1.2).
    """
    return encode_blocks_device_staged(
        blocks, block_lens, cap=cap, parse=parse
    )


@functools.partial(jax.jit, static_argnames=("cap",))
def _stage_sa(blocks, block_lens, *, cap: int):
    """Valid-length derivation + suffix array (one staged dispatch)."""
    ns = block_lens - TAIL_RESERVE
    sa, ckpt, n_levels, t32, p32 = suffix_array_prefixes_batch(
        blocks, ns, cap=cap
    )
    return ns, sa, ckpt, n_levels, t32, p32


@functools.partial(jax.jit, static_argnames=("cap",))
def _stage_mid(sa, ckpt, n_levels, t32, p32, ns, *, cap: int):
    """ANSV + adjacent LCP + candidate range-mins + the slot->text sort."""
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    valid = idx < ns[:, None]
    vals = jnp.where(valid, sa, jnp.int32(2**31 - 1))
    (lslot, psv_val, rslot, nsv_val), buckets = ansv_slots_vals_batch(
        vals, ns, cap=cap, with_buckets=True
    )
    lcp_adj = adjacent_lcp_batch(ckpt, n_levels, ns, sa, t32, p32, cap=cap)
    psv_len_s, nsv_len_s = candidate_lengths_slot_batch(
        lcp_adj, lslot, rslot, ns, buckets, cap=cap
    )
    dest = jnp.where(valid, sa, cap)
    _, psv_pos, nsv_pos, psv_len, nsv_len = jax.lax.sort(
        (dest, psv_val, nsv_val, psv_len_s, nsv_len_s),
        num_keys=1,
        dimension=1,
    )
    psv_offs = idx - psv_pos
    nsv_offs = idx - nsv_pos
    return psv_offs, psv_len, nsv_offs, nsv_len


@functools.lru_cache(maxsize=None)
def _staged_fns(cap: int):
    """Per-cap jitted stage closures with the static cap folded in —
    exportable as pure functions of their array arguments (aotstore)."""
    sa = jax.jit(lambda b, l: _stage_sa(b, l, cap=cap))
    mid = jax.jit(
        lambda s, c, n_lv, t, p, ns: _stage_mid(s, c, n_lv, t, p, ns, cap=cap)
    )
    chunk = min(512, cap)

    def _parse(po, pl_, no, nl_, ns):
        offs, length, _ = optimal_parse_chunked_batch(
            po, pl_, no, nl_, ns, cap=cap, chunk=chunk
        )
        return offs, length

    parse = jax.jit(_parse)
    emitf = jax.jit(
        lambda b, l, o, ln: emit_stream_batch(b, l, o, ln, cap=cap)
    )
    return sa, mid, parse, emitf


def encode_blocks_device_staged(
    blocks, block_lens, *, cap: int, parse: str = "chunked"
):
    """encode_blocks_device as FOUR separately-jitted stage dispatches.

    Byte-identical to the fused program (same stage functions, same glue),
    but each stage compiles as its own XLA module: the fused 1 MiB program
    hit a superlinear XLA compile (>40 min on the axon compile server)
    while its stages compile in ~1-2 min each — and an edit to one stage
    re-uses every other stage's persistent-cache entry. Dispatch is async,
    so the extra host->device call boundaries hide behind the ~1 s of
    device compute per batch. Use the fused entry point inside jit/shard_map
    contexts (this one is host-driven on purpose)."""
    host_driven = not isinstance(blocks, jax.core.Tracer)
    if host_driven and parse == "chunked":
        # AOT store: each stage round-trips through jax.export so later
        # processes skip the 20-40 s Python re-trace (utils/aotstore.py).
        from salz_tpu.utils.aotstore import cached_call

        fns = _staged_fns(cap)
        ns, sa, ckpt, n_levels, t32, p32 = cached_call(
            f"sa-c{cap}", fns[0], blocks, block_lens
        )
        psv_offs, psv_len, nsv_offs, nsv_len = cached_call(
            f"mid-c{cap}", fns[1], sa, ckpt, n_levels, t32, p32, ns
        )
        offs, length = cached_call(
            f"parse-c{cap}", fns[2], psv_offs, psv_len, nsv_offs, nsv_len, ns
        )
        return cached_call(
            f"emit-c{cap}", fns[3], blocks, block_lens, offs, length
        )

    ns, sa, ckpt, n_levels, t32, p32 = _stage_sa(blocks, block_lens, cap=cap)
    psv_offs, psv_len, nsv_offs, nsv_len = _stage_mid(
        sa, ckpt, n_levels, t32, p32, ns, cap=cap
    )
    if parse == "chunked":
        chunk = min(512, cap)
        offs, length, _ = optimal_parse_chunked_batch(
            psv_offs, psv_len, nsv_offs, nsv_len, ns, cap=cap, chunk=chunk
        )
    else:
        offs, length, _ = jax.vmap(
            lambda po, pl_, no, nl_, n: optimal_parse_sequential(
                po, pl_, no, nl_, n, cap=cap
            )
        )(psv_offs, psv_len, nsv_offs, nsv_len, ns)
    return emit_stream_batch(blocks, block_lens, offs, length, cap=cap)


@functools.partial(jax.jit, static_argnames=("cap", "parse"))
def encode_block_device(
    block: jax.Array, block_len: jax.Array, *, cap: int, parse: str = "chunked"
):
    """Encode one padded block (uint8[cap], valid prefix block_len >= 8).

    Single-block wrapper over encode_blocks_device; same contract per block.
    """
    out, out_len, salz_len = encode_blocks_device(
        block[None], jnp.asarray(block_len)[None], cap=cap, parse=parse
    )
    return out[0], out_len[0], salz_len[0]


class BatchBlockEncoder:
    """Host-side throughput wrapper: encodes lists of blocks in device
    batches (the batch-native pipeline amortizes loop dispatch overheads
    across the batch; single-block encode_block_device is the latency path).
    """

    def __init__(self, cap: int, batch: int = 8, parse: str = "chunked"):
        if cap % 64 != 0:
            raise ValueError("block capacity must be a multiple of 64")
        self.cap = cap
        self.batch = max(1, batch)
        self.parse = parse
        from salz_tpu.utils import jaxcache

        jaxcache.enable()

    #: per-block status codes (SURVEY.md §5 failure model)
    OK = 0
    ERR_CAPACITY = 1  # emitted stream exceeds caller's dst capacity
    ERR_TOO_SHORT = 2  # block < 8 bytes (reference salz.c:197 underflow)
    ERR_TOO_LONG = 3  # block exceeds the encoder's block capacity

    def encode_many_status(
        self, blocks: list[bytes], dst_cap: int | None = None
    ) -> tuple[list[bytes | None], list[int]]:
        """Encode blocks with PER-BLOCK error status: a poisoned block fails
        alone and its siblings still encode (SURVEY.md §5 failure model; the
        reference's equivalent is salz_encode_safe's per-call -1 return).

        Returns (segments, status): segments[i] is None iff status[i] != 0.

        Blocks much shorter than the capacity (a file's trailing block, or a
        whole small file at a high level) are ROUTED to a smaller cap class
        (cap/4^k, floor 32 KiB): the stream depends only on the block bytes
        — the capacity merely pads — and cap/4^k equals the cap of level-2k,
        whose program shapes the compile cache already holds, so a 380 KiB
        file at level 9 stops paying for 16 MiB arrays (~40x).
        """
        segs: list[bytes | None] = [None] * len(blocks)
        status = [self.OK] * len(blocks)
        by_cap: dict[int, list[int]] = {}
        for i, blk in enumerate(blocks):
            if len(blk) < TAIL_RESERVE:
                status[i] = self.ERR_TOO_SHORT
            elif len(blk) > self.cap:
                status[i] = self.ERR_TOO_LONG
            else:
                c = self.cap
                while c >= 4 * (32 << 10) and len(blk) <= c // 4:
                    c //= 4
                by_cap.setdefault(c, []).append(i)
        for cap_c, idxs in sorted(by_cap.items(), reverse=True):
            self._encode_class(blocks, idxs, cap_c, dst_cap, segs, status)
        return segs, status

    def _encode_class(self, blocks, good, cap_c, dst_cap, segs, status):
        """Encode the blocks routed to one cap class (mutates segs/status)."""
        # Keep ~the same bytes per dispatch as the class's native level.
        batch = (
            self.batch
            if cap_c == self.cap
            else max(1, (8 << 20) // cap_c)
        )
        # Full batches, then the remainder in at most TWO power-of-two
        # sub-batches (largest pow2 <= rem, then pow2-ceil of the rest,
        # padded with empty lanes): a 1-block file must not pay for `batch`
        # lanes of encode work (whole-batch padding made one-block files ~8x
        # slower), while capping the number of distinct program shapes the
        # XLA cache must hold (one compile per shape).
        groups: list[tuple[list[int], int]] = []  # (block ids, lane count)
        lo = 0
        while len(good) - lo >= batch:
            groups.append((good[lo : lo + batch], batch))
            lo += batch
        rem = len(good) - lo
        if rem > 0:
            s1 = 1 << (rem.bit_length() - 1)  # largest pow2 <= rem
            groups.append((good[lo : lo + s1], s1))
            lo += s1
            rem -= s1
        if rem > 0:
            s2 = 1 << max(rem - 1, 0).bit_length()  # pow2 ceil
            groups.append((good[lo:], s2))
        # Two-phase dispatch/collect with a bounded in-flight window: every
        # group's upload + 4 staged programs are ISSUED (async) before any
        # group's results are pulled back, so H2D, compute, and D2H of
        # consecutive groups overlap instead of serializing (the axon tunnel
        # moves ~40 MB/s: a blocking 8 MB upload + 9 MB download costs
        # ~450 ms against ~1 s of compute per group). The window caps device
        # memory at WINDOW in+out buffers (~80 MB at the 8 MB default).
        WINDOW = 4
        inflight: list[tuple[list[int], object, object, object]] = []

        def _collect(entry):
            group, out, out_len, salz_len = entry
            out = np.asarray(out)
            out_len = np.asarray(out_len)
            salz_len = np.asarray(salz_len)
            for j, i in enumerate(group):
                if dst_cap is not None and int(salz_len[j]) > dst_cap:
                    # Reference parity: emission overflows the caller's buffer
                    # before the PLAIN fallback is evaluated (salz.c:274-275).
                    status[i] = self.ERR_CAPACITY
                else:
                    segs[i] = bytes(out[j, : int(out_len[j])])

        for group, gb in groups:
            padded = np.zeros((gb, cap_c), np.uint8)
            lens = np.full(gb, TAIL_RESERVE, np.int32)
            for j, i in enumerate(group):
                padded[j, : len(blocks[i])] = np.frombuffer(blocks[i], np.uint8)
                lens[j] = len(blocks[i])
            out, out_len, salz_len = encode_blocks_device_staged(
                jax.device_put(padded),
                jax.device_put(lens),
                cap=cap_c,
                parse=self.parse,
            )
            inflight.append((group, out, out_len, salz_len))
            if len(inflight) >= WINDOW:
                _collect(inflight.pop(0))
        for entry in inflight:
            _collect(entry)
        return segs, status

    def encode_many(
        self, blocks: list[bytes], dst_cap: int | None = None
    ) -> list[bytes]:
        """Encode blocks; raises on the FIRST failed block (wholesale API —
        prefer encode_many_status for block-granular error handling)."""
        segs, status = self.encode_many_status(blocks, dst_cap)
        msgs = {
            self.ERR_CAPACITY: "encoded stream exceeds destination capacity",
            self.ERR_TOO_SHORT: "block too short to encode (< 8 bytes)",
            self.ERR_TOO_LONG: f"block exceeds capacity {self.cap}",
        }
        for st in status:
            if st != self.OK:
                raise ValueError(msgs[st])
        return segs  # type: ignore[return-value]


class BlockEncoder:
    """Host-side convenience wrapper around the jitted device encoder."""

    def __init__(self, cap: int, parse: str = "chunked"):
        if cap % 64 != 0:
            raise ValueError("block capacity must be a multiple of 64")
        self.cap = cap
        self.parse = parse
        from salz_tpu.utils import jaxcache

        jaxcache.enable()  # persistent XLA cache: compile each cap once

    def __call__(self, block: bytes, dst_cap: int | None = None) -> bytes:
        if len(block) < TAIL_RESERVE:
            raise ValueError(
                f"block too short to encode ({len(block)} < 8 bytes)"
            )
        if len(block) > self.cap:
            raise ValueError(f"block exceeds capacity {self.cap}")
        padded = np.zeros(self.cap, dtype=np.uint8)
        padded[: len(block)] = np.frombuffer(block, dtype=np.uint8)
        out, out_len, salz_len = encode_block_device(
            jnp.asarray(padded),
            jnp.int32(len(block)),
            cap=self.cap,
            parse=self.parse,
        )
        if dst_cap is not None and int(salz_len) > dst_cap:
            # Reference parity: emission overflows the caller's buffer before
            # the PLAIN fallback is ever evaluated (salz.c:274-275).
            raise ValueError("encoded stream exceeds destination capacity")
        return bytes(np.asarray(out)[: int(out_len)])
