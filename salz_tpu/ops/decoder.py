"""On-device SALZ segment decoder: serial tokenizer + parallel reconstruction.

Reading the token stream is inherently serial (each token's position depends
on all previous lengths — salz.c:1170-1192), but only the BIT READING is:
once the (length, offset) records exist, every output byte's value is the
literal at the root of its copy chain, and all chains resolve in parallel by
pointer doubling. So the decoder runs two phases:

  A. a lax.while_loop tokenizer whose per-token work is a few bit reads and
     two one-element array writes (NO per-byte copy loop — the old
     single-phase design's byte-copy fori_loop ran speculatively for every
     literal token under vmap and took the TPU worker down at 1 MiB caps);
  B. a fully vectorized reconstruction: token starts by prefix sum, per-byte
     token ids by scatter+cumsum, copy-chain roots by pointer doubling
     (<= log2(cap) gather rounds, early-exit when pointers stop moving).

This is the conformance/roundtrip-on-TPU facility; the production scalar
decoder is the native C++ one (salz_tpu/native). Batch decode vmaps over
this function.

The 64-bit reference bit reader is modeled as a pair of uint32 words (x64 mode
stays off). Bounds are tracked like the reference; malformed input yields
status != 0 rather than out-of-bounds access (all indices clamped).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from salz_tpu.format import (
    FACTOR_LENGTH_MIN,
    FACTOR_OFFSET_MIN,
    STREAM_TYPE_PLAIN,
    STREAM_TYPE_SALZ,
)


@functools.partial(jax.jit, static_argnames=("seg_cap", "out_cap"))
def decode_block_device(segment: jax.Array, seg_len: jax.Array, *, seg_cap: int, out_cap: int):
    """Decode one segment (uint8[seg_cap], valid prefix seg_len).

    Returns (out uint8[out_cap], out_len int32, status int32); status 0 = ok,
    1 = malformed stream / capacity exceeded.
    """
    seg = segment
    idx = jnp.arange(out_cap, dtype=jnp.int32)

    hdr = (
        seg[0].astype(jnp.uint32)
        | (seg[1].astype(jnp.uint32) << 8)
        | (seg[2].astype(jnp.uint32) << 16)
        | (seg[3].astype(jnp.uint32) << 24)
    )
    stream_type = (hdr >> 24).astype(jnp.int32)
    stream_len = (hdr & 0xFFFFFF).astype(jnp.int32)
    hdr_bad = (
        (seg_len < 4)
        | (stream_type >= 2)
        | (stream_len > seg_len - 4)
    )

    # ---- PLAIN path: shifted copy.
    plain_ok = stream_len <= out_cap
    plain_out = jnp.where(
        idx < stream_len, seg[jnp.clip(idx + 4, 0, seg_cap - 1)], 0
    ).astype(jnp.uint8)

    # ---- SALZ path: sequential token loop.
    # State: (src_pos, dst_pos, bits_hi, bits_lo, bits_avail, out, fail)
    def queue_ok(src_pos):
        return src_pos + 8 <= stream_len

    def queue(state):
        src_pos, out, fail = state
        base = jnp.clip(src_pos + 4, 0, seg_cap - 8)
        b = [seg[base + k].astype(jnp.uint32) for k in range(8)]
        # LE u64 -> (hi, lo) with MSB-first semantics: hi holds bytes 7..4.
        hi = b[7] << 24 | b[6] << 16 | b[5] << 8 | b[4]
        lo = b[3] << 24 | b[2] << 16 | b[1] << 8 | b[0]
        return hi, lo, src_pos + 8

    def shift_left(hi, lo, k):
        # (hi, lo) <<= k for 0 <= k <= 32 (logical, within the 64-bit pair).
        k = k.astype(jnp.uint32)
        hi2 = jnp.where(
            k == 0,
            hi,
            jnp.where(k == 32, lo, (hi << k) | (lo >> (32 - k))),
        )
        lo2 = jnp.where(k == 0, lo, jnp.where(k == 32, 0, lo << k))
        return hi2, lo2

    def read_bits(carry, count):
        """Read `count` (traced, 1..4) bits MSB-first, reference semantics."""
        src_pos, hi, lo, avail, fail = carry

        def do_queue(args):
            src_pos, hi, lo, avail, fail = args
            fail = fail | ~queue_ok(src_pos)
            nhi, nlo, nsp = queue((src_pos, None, None))
            return nsp, nhi, nlo, jnp.int32(64), fail

        src_pos, hi, lo, avail, fail = jax.lax.cond(
            avail == 0, do_queue, lambda a: a, (src_pos, hi, lo, avail, fail)
        )

        def take(hi, lo, avail, k):
            res = jnp.where(
                k == 0, jnp.uint32(0), hi >> (32 - k).astype(jnp.uint32)
            )
            hi, lo = shift_left(hi, lo, k)
            return res, hi, lo, avail - k

        # counts here are <= 4 so a split spans at most one refill; take
        # min(count, avail) then the remainder after a refill.
        take1 = jnp.minimum(count, avail)
        part1, hi, lo, avail = take(hi, lo, avail, take1)
        rem = count - take1

        def refill_and_take(args):
            src_pos, hi, lo, avail, fail, part1 = args
            fail = fail | ~queue_ok(src_pos)
            nhi, nlo, nsp = queue((src_pos, None, None))
            part2, nhi, nlo, navail = take(nhi, nlo, jnp.int32(64), rem)
            return nsp, nhi, nlo, navail, fail, (part1 << rem.astype(jnp.uint32)) | part2

        def no_refill(args):
            src_pos, hi, lo, avail, fail, part1 = args
            return src_pos, hi, lo, avail, fail, part1

        src_pos, hi, lo, avail, fail, res = jax.lax.cond(
            rem > 0, refill_and_take, no_refill,
            (src_pos, hi, lo, avail, fail, part1),
        )
        return res, (src_pos, hi, lo, avail, fail)

    def read_unary(carry):
        src_pos, hi, lo, avail, fail = carry

        def do_queue(args):
            src_pos, hi, lo, avail, fail, acc = args
            fail = fail | ~queue_ok(src_pos)
            nhi, nlo, nsp = queue((src_pos, None, None))
            return nsp, nhi, nlo, jnp.int32(64), fail, acc

        src_pos, hi, lo, avail, fail, acc = jax.lax.cond(
            avail == 0, do_queue, lambda a: a,
            (src_pos, hi, lo, avail, fail, jnp.int32(0)),
        )

        def word_empty(state):
            src_pos, hi, lo, avail, fail, acc = state
            return ((hi | lo) == 0) & ~fail

        def consume_word(state):
            src_pos, hi, lo, avail, fail, acc = state
            acc = acc + avail
            fail = fail | ~queue_ok(src_pos)
            nhi, nlo, nsp = queue((src_pos, None, None))
            return nsp, nhi, nlo, jnp.int32(64), fail, acc

        src_pos, hi, lo, avail, fail, acc = jax.lax.while_loop(
            word_empty, consume_word, (src_pos, hi, lo, avail, fail, acc)
        )
        # Count leading zeros of the 64-bit pair (nonzero by loop invariant).
        clz64 = jnp.where(
            hi == 0, 32 + jax.lax.clz(lo), jax.lax.clz(hi)
        ).astype(jnp.int32)
        shift = clz64 + 1
        # shift can exceed 32; do it in two steps.
        s1 = jnp.minimum(shift, 32)
        hi, lo = shift_left(hi, lo, s1)
        hi, lo = shift_left(hi, lo, shift - s1)
        avail = avail - shift
        acc = acc + clz64
        return acc, (src_pos, hi, lo, avail, fail)

    # ---- phase A: serial TOKENIZER. Only bit reads and two one-element
    # writes per token; the per-byte factor-copy fori_loop of the old
    # single-phase decoder is GONE. That loop was the TPU killer: under
    # vmap lax.cond executes both branches, so every literal token
    # speculatively ran the copy loop on garbage factor_len (clamped only
    # to out_cap), turning a 1 MiB-cap batch decode into hours of kernel
    # time — which the runtime surfaced as a TPU worker crash (round-3
    # bench). Token records: tlen[t] = token length (1 for literals);
    # tofs[t] = factor offset >= 1, or -(byte + 1) for literals.
    def token_step(state):
        src_pos, dst_pos, tok_i, hi, lo, avail, tlen, tofs, fail = state
        bitcarry = (src_pos, hi, lo, avail, fail)
        token, bitcarry = read_bits(bitcarry, jnp.int32(1))
        src_pos, hi, lo, avail, fail = bitcarry

        # Both branches return SCALARS only (vmapped cond executes both and
        # selects) — the token-array writes happen once, unconditionally,
        # after the branch so no (B, cap) select materializes per token.
        def literal(args):
            src_pos, dst_pos, hi, lo, avail, fail = args
            fail = fail | (src_pos >= stream_len) | (dst_pos >= out_cap)
            val = seg[jnp.clip(src_pos + 4, 0, seg_cap - 1)].astype(jnp.int32)
            return (
                src_pos + 1, hi, lo, avail, fail,
                jnp.int32(1), -(val + 1),
            )

        def factor(args):
            src_pos, dst_pos, hi, lo, avail, fail = args
            carry = (src_pos, hi, lo, avail, fail)
            # vnibble
            nib, carry = read_bits(carry, jnp.int32(4))

            def vn_cond(s):
                carry, var, nib = s
                return (nib < 0x8) & ~carry[4]

            def vn_body(s):
                carry, var, nib = s
                nib2, carry = read_bits(carry, jnp.int32(4))
                var = ((var + 1) << 3) | (nib2 & 0x7)
                return carry, var, nib2

            carry, var, _ = jax.lax.while_loop(
                vn_cond, vn_body, (carry, nib & 0x7, nib)
            )
            src_pos, hi, lo, avail, fail = carry
            fail = fail | (src_pos >= stream_len)
            fixed = seg[jnp.clip(src_pos + 4, 0, seg_cap - 1)].astype(jnp.uint32)
            src_pos = src_pos + 1
            factor_offs = ((var << 8) | fixed).astype(jnp.int32) + FACTOR_OFFSET_MIN
            carry = (src_pos, hi, lo, avail, fail)
            unary, carry = read_unary(carry)
            low3, carry = read_bits(carry, jnp.int32(3))
            src_pos, hi, lo, avail, fail = carry
            factor_len = (
                (unary.astype(jnp.int32) << 3) | low3.astype(jnp.int32)
            ) + FACTOR_LENGTH_MIN
            fail = fail | (factor_offs > dst_pos) | (dst_pos + factor_len > out_cap)
            return src_pos, hi, lo, avail, fail, factor_len, factor_offs

        src_pos, hi, lo, avail, fail, t_len, t_ofs = jax.lax.cond(
            token == 0, literal, factor,
            (src_pos, dst_pos, hi, lo, avail, fail),
        )
        ti = jnp.clip(tok_i, 0, out_cap - 1)
        tlen = tlen.at[ti].set(t_len)
        tofs = tofs.at[ti].set(t_ofs)
        return (
            src_pos, dst_pos + t_len, tok_i + 1, hi, lo, avail,
            tlen, tofs, fail,
        )

    def loop_cond(state):
        src_pos = state[0]
        fail = state[-1]
        return (src_pos < stream_len) & ~fail

    init = (
        jnp.int32(0), jnp.int32(0), jnp.int32(0),
        jnp.uint32(0), jnp.uint32(0), jnp.int32(0),
        jnp.zeros(out_cap, jnp.int32), jnp.zeros(out_cap, jnp.int32),
        hdr_bad,
    )
    (
        src_pos, dst_pos, tok_n, _, _, _, tlen, tofs, salz_fail
    ) = jax.lax.while_loop(loop_cond, token_step, init)

    # ---- phase B: vectorized reconstruction. Every output byte's value is
    # the literal byte at the root of its copy chain out[i] <- out[i - offs]
    # (strictly decreasing, so chains terminate at literals); pointer
    # doubling reaches all roots in <= log2(out_cap) gather rounds, with an
    # early exit once the pointers stop moving (real corpora: a handful of
    # rounds — long chains only arise from self-overlapping repeats).
    tvalid = idx < tok_n
    lens = jnp.where(tvalid, tlen, 0)
    starts = jnp.cumsum(lens) - lens  # exclusive prefix sum
    dst_total = jnp.clip(dst_pos, 0, out_cap)
    flag = (
        jnp.zeros(out_cap, jnp.int32)
        .at[jnp.where(tvalid, jnp.clip(starts, 0, out_cap - 1), out_cap)]
        .add(1, mode="drop")
    )
    tid = jnp.clip(jnp.cumsum(flag) - 1, 0, out_cap - 1)
    ofs_b = tofs[tid]  # per output byte: its token's offset record
    in_out = idx < dst_total
    is_lit = (ofs_b < 0) & in_out
    lit_val = jnp.where(is_lit, -ofs_b - 1, 0)
    ptr = jnp.where(
        is_lit | ~in_out, idx, jnp.clip(idx - jnp.maximum(ofs_b, 1), 0, out_cap - 1)
    )

    def pd_cond(st):
        ptr, moved, r = st
        return moved & (r < out_cap.bit_length())

    def pd_body(st):
        ptr, moved, r = st
        nxt = ptr[ptr]
        return nxt, jnp.any(nxt != ptr), r + 1

    ptr, _, _ = jax.lax.while_loop(
        pd_cond, pd_body, (ptr, jnp.bool_(True), jnp.int32(0))
    )
    salz_out = jnp.where(in_out, lit_val[ptr], 0).astype(jnp.uint8)

    is_plain = stream_type == STREAM_TYPE_PLAIN
    out = jnp.where(is_plain, plain_out, salz_out)
    out_len = jnp.where(is_plain, stream_len, dst_pos)
    status = jnp.where(
        hdr_bad | jnp.where(is_plain, ~plain_ok, salz_fail), 1, 0
    ).astype(jnp.int32)
    return out, out_len, status


@functools.partial(jax.jit, static_argnames=("seg_cap", "out_cap"))
def decode_blocks_device(
    segments: jax.Array, seg_lens: jax.Array, *, seg_cap: int, out_cap: int
):
    """Batch decode (uint8[B, seg_cap], int32[B]) -> (out, out_len, status).

    vmap over the sequential per-block while_loop: lanes step together until
    the longest block finishes (the decoder is the conformance path; the
    throughput path is the native scalar decoder, salz_tpu/native)."""
    return jax.vmap(
        lambda s, l: decode_block_device(s, l, seg_cap=seg_cap, out_cap=out_cap)
    )(segments, seg_lens)


class BatchBlockDecoder:
    """Host-side wrapper: decodes lists of segments in device batches.

    Mirrors BatchBlockEncoder; pads segments to the container's
    encoded_len_max, runs the vmapped device decoder, trims, and raises
    SalzDecodeError on any malformed stream (reference salz_decode_safe
    returns -1, salz.c:1194-1228)."""

    def __init__(self, block_size: int, batch: int = 8):
        from salz_tpu import format as fmt
        from salz_tpu.utils import jaxcache

        jaxcache.enable()
        self.out_cap = block_size
        self.seg_cap = fmt.encoded_len_max(block_size)
        self.batch = max(1, batch)

    def decode_many(self, segments: list[bytes]) -> list[bytes]:
        from salz_tpu.oracle.pycodec import SalzDecodeError

        blocks: list[bytes] = []
        for lo in range(0, len(segments), self.batch):
            group = segments[lo : lo + self.batch]
            B = len(group)
            # Unused lanes stay empty (status != 0, ignored below). Round 2
            # replayed the last real segment here because empty lanes
            # appeared to crash the TPU runtime at big caps; the root cause
            # was the decoder's unclamped factor-copy trip count (see the
            # safe_len comment in decode_block_device) — fixed, so empty
            # lanes are safe and cost nothing.
            padded = np.zeros((self.batch, self.seg_cap), np.uint8)
            lens = np.zeros(self.batch, np.int32)
            for i in range(B):
                seg = group[i]
                if len(seg) > self.seg_cap:
                    raise SalzDecodeError("encoded segment too large")
                padded[i, : len(seg)] = np.frombuffer(seg, np.uint8)
                lens[i] = len(seg)
            out, out_len, status = decode_blocks_device(
                jnp.asarray(padded), jnp.asarray(lens),
                seg_cap=self.seg_cap, out_cap=self.out_cap,
            )
            out = np.asarray(out)
            out_len = np.asarray(out_len)
            status = np.asarray(status)
            for i in range(B):
                if int(status[i]) != 0:
                    raise SalzDecodeError(
                        f"malformed stream (block {lo + i})"
                    )
                blocks.append(bytes(out[i, : int(out_len[i])]))
        return blocks

    def __call__(self, segment: bytes, dst_cap: int | None = None) -> bytes:
        return self.decode_many([segment])[0]
