"""Parallel token emission: the interleaved bit/byte stream as scatter ops.

The reference writes the stream with a sequential stateful writer
(salz.c:258-457,664-775). FORMAT.md §1.3 derives the closed form this module
implements: because every token contributes exactly one byte and a known
number of bits, all byte positions, bit-word ("slot") positions and slot
contents follow from prefix sums over per-token sizes — the whole stream is
produced by three vectorized scatters:

  1. token bytes at 4 + t + 8*ceil((bits_before + w1_t)/64)
  2. slot j's 8 bytes at 4 + 8(j-1) + #{t : bits_before_t + w1_t <= 64(j-1)}
  3. nonzero bit chunks OR-scattered into a uint32 word array

Equivalence with the scalar writer is pinned by tests/test_emit.py over random
token streams and by full-stream equality with the oracle.

Everything is static-shape; `n` (text length) and the token count are dynamic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from salz_tpu.format import TAIL_RESERVE, VNIBBLE_THRESHOLDS


def _vnibble_size_vec(v):
    m = jnp.ones(v.shape, jnp.int32)
    for thr in VNIBBLE_THRESHOLDS[:-1]:
        m = m + (v >= jnp.int32(min(thr, 2**31 - 1))).astype(jnp.int32)
    return m


def _vnibble_pattern_vec(v, m):
    """MSB-first nibble pattern (int32; max 6 nibbles = 24 bits for offsets).

    Digit form (FORMAT.md §1.5): base-8 digits of v - bias(m), terminator |= 8.
    """
    # bias(m) = thresholds[m-2] for m >= 2, 0 for m = 1.
    bias = jnp.zeros(v.shape, jnp.int32)
    for k in range(2, 8):  # offsets need at most 6 nibbles; margin to 7
        bias = jnp.where(m == k, jnp.int32(VNIBBLE_THRESHOLDS[k - 2]), bias)
    r = v - bias
    pattern = jnp.zeros(v.shape, jnp.int32)
    for d in range(7):  # digit index from least significant
        digit = (r >> (3 * d)) & 0x7
        # Terminator 0x8 goes on the last-emitted nibble = the least
        # significant digit (d == 0), per FORMAT.md §1.5.
        digit = jnp.where(jnp.int32(d) == 0, digit | 0x8, digit)
        pattern = jnp.where(jnp.int32(d) < m, pattern | (digit << (4 * d)), pattern)
    return pattern


@functools.partial(jax.jit, static_argnames=("cap",))
def token_starts_xla(length: jax.Array, n: jax.Array, *, cap: int) -> jax.Array:
    """bool[cap]: which text positions start a token of the chosen parse.

    The parse is the chain 0 -> len[0] -> ... -> n. Computed by pointer
    doubling: repeatedly scatter reachability through the successor map while
    squaring it — log2(cap) rounds of one gather + one scatter each. This is
    the backend-generic path; TPU uses the chunked Pallas formulation in
    salz_tpu/ops/starts.py.
    """
    idx = jnp.arange(cap, dtype=jnp.int32)
    nxt = jnp.where(idx < n, idx + jnp.maximum(length, 1), cap)
    nxt = jnp.clip(nxt, 0, cap)
    reach = jnp.zeros(cap + 1, jnp.int32).at[0].set((n > 0).astype(jnp.int32))
    nxt_ext = jnp.concatenate([nxt, jnp.full((1,), cap, jnp.int32)])
    rounds = max(1, cap.bit_length())
    for _ in range(rounds):
        reach = reach.at[nxt_ext].max(reach)
        nxt_ext = nxt_ext[nxt_ext]
    return (reach[:cap] > 0) & (idx < n)


def token_starts(length: jax.Array, n: jax.Array, *, cap: int) -> jax.Array:
    """Backend-dispatching token-start selection (see token_starts_xla)."""
    if jax.default_backend() == "tpu" and cap % 1024 == 0:
        from salz_tpu.ops.starts import token_starts_chunked

        return token_starts_chunked(length, n, cap=cap)
    return token_starts_xla(length, n, cap=cap)


@functools.partial(jax.jit, static_argnames=("cap",))
def emit_stream(
    block: jax.Array,  # uint8[cap] padded block (text + 8 tail bytes)
    block_len: jax.Array,  # dynamic total block length (n + 8)
    offs: jax.Array,  # int32[cap] chosen factor offsets (text positions)
    length: jax.Array,  # int32[cap] chosen factor lengths (1 = literal)
    *,
    cap: int,
):
    """Produce the complete segment: header + interleaved stream + fallback.

    Returns (out, out_len, overflow_bits) where out is uint8[out_cap] with
    out_cap = encoded_len_max(cap) + 16; out_len is the segment length after
    the PLAIN-fallback decision; overflow_bits reports the raw SALZ layout
    size so callers can reproduce the reference's capacity-abort semantics.
    """
    n = block_len - TAIL_RESERVE
    idx = jnp.arange(cap, dtype=jnp.int32)

    is_start = token_starts(length, n, cap=cap)

    # ---- compact tokens (text tokens first, then the 8 forced tail literals)
    # Stable sort by ~is_start carries (position, length, offset, byte) of
    # every token start to the front in text order — one sort instead of a
    # compaction scatter plus three full-size gathers (sorts are much cheaper
    # than 1-D gathers on TPU).
    num_text_tokens = jnp.sum(is_start.astype(jnp.int32))
    K = num_text_tokens + TAIL_RESERVE  # total tokens

    tcap = cap + TAIL_RESERVE  # static max token count
    _, pos_s, len_s, offs_s, byte_s = jax.lax.sort(
        (1 - is_start.astype(jnp.int32), idx, length, offs, block),
        num_keys=1,
        is_stable=True,
    )

    tids = jnp.arange(tcap, dtype=jnp.int32)
    tok_valid = tids < K
    is_tail = (tids >= num_text_tokens) & tok_valid
    # Tail literals: token ids K-8 .. K-1, positions n .. n+7.
    tail_pos = n + tids - num_text_tokens
    pad = jnp.zeros(TAIL_RESERVE, jnp.int32)
    tok_pos = jnp.where(
        is_tail, tail_pos, jnp.concatenate([pos_s, pad])
    )
    tok_pos = jnp.where(tok_valid, tok_pos, cap)
    pos_c = jnp.clip(tok_pos, 0, cap - 1)
    tok_len = jnp.where(
        is_tail | ~tok_valid, 1, jnp.concatenate([len_s, pad])
    )
    tok_offs = jnp.where(
        tok_valid & ~is_tail, jnp.concatenate([offs_s, pad]), 0
    )
    is_factor = tok_valid & (tok_len > 1)

    # ---- per-token sizes and bit patterns
    offs_val = jnp.where(is_factor, (tok_offs - 1) >> 8, 0)
    m = _vnibble_size_vec(offs_val)
    vpat = _vnibble_pattern_vec(offs_val, m)
    lv = jnp.where(is_factor, tok_len - 3, 0)
    z = lv >> 3  # GR3 unary zero count
    w1 = jnp.where(is_factor, 1 + 4 * m, 1)  # bits before the token byte
    bits_t = jnp.where(is_factor, w1 + z + 4, 1)
    bits_t = jnp.where(tok_valid, bits_t, 0)

    bits_before = jnp.cumsum(bits_t) - bits_t  # exclusive prefix sum
    total_bits = jnp.sum(bits_t)
    num_slots = (total_bits + 63) >> 6

    # ---- byte scatter
    # Literal bytes came through the compaction sort; the 8 tail literal bytes
    # live at block[n : n+8] (contiguous — a dynamic slice, not a gather) and
    # land at token ids num_text_tokens..K-1 (contiguous — an update slice).
    lit_bytes = jnp.concatenate([byte_s, jnp.zeros(TAIL_RESERVE, jnp.uint8)])
    tail_bytes = jax.lax.dynamic_slice(block, (jnp.maximum(n, 0),), (TAIL_RESERVE,))
    lit_bytes = jax.lax.dynamic_update_slice(
        lit_bytes, tail_bytes, (num_text_tokens,)
    )
    byte_val = jnp.where(
        is_factor, ((tok_offs - 1) & 0xFF).astype(jnp.uint8), lit_bytes
    )
    byte_bits = bits_before + w1  # bits written before this token's byte
    byte_pos = 4 + tids + 8 * ((byte_bits + 63) >> 6)

    out_cap = 4 + cap + ((cap + 63) // 64) * 8 + 16  # encoded_len_max(cap)+16
    out = jnp.zeros(out_cap, jnp.uint8)
    out = out.at[jnp.where(tok_valid, byte_pos, out_cap)].set(
        byte_val, mode="drop"
    )

    # ---- bit chunks -> uint32 word array (word w holds bits [32w, 32w+32),
    # MSB-first within the word)
    nwords = 2 * ((9 * cap + 63) // 64) + 2  # >= 2*ceil(total_bits/64)
    words = jnp.zeros(nwords, jnp.uint32)

    def scatter_chunk(words, value, width, bitpos, valid):
        """OR value (width bits, MSB-aligned to bitpos) into the word array."""
        value = value.astype(jnp.uint32)
        w = bitpos >> 5
        r = (bitpos & 31).astype(jnp.uint32)
        space = 32 - r  # bits available in word w at offset r
        wide = width.astype(jnp.uint32)
        # Contribution to word w: top part of value (or all of it).
        shift_left = jnp.where(wide <= space, space - wide, 0)
        shift_right = jnp.where(wide > space, wide - space, 0)
        contrib0 = jnp.where(
            wide > space, value >> shift_right, value << shift_left
        )
        # Contribution to word w+1: the remaining low bits, MSB-aligned.
        rem = jnp.where(wide > space, wide - space, 0)
        low = value & ((jnp.uint32(1) << rem) - 1)
        contrib1 = jnp.where(rem > 0, low << (32 - rem), 0)
        wi = jnp.where(valid, w, nwords)
        words = words.at[wi].add(contrib0, mode="drop")
        words = words.at[jnp.where(valid & (rem > 0), w + 1, nwords)].add(
            contrib1, mode="drop"
        )
        return words

    # Chunk A: token bit + vnibble pattern (factors) / the 0 token bit
    # (literals contribute no set bits; scatter value 0 with width 1).
    chunkA_val = jnp.where(is_factor, (1 << (4 * m)) | vpat, 0)
    chunkA_w = jnp.where(is_factor, 1 + 4 * m, 1)
    words = scatter_chunk(words, chunkA_val, chunkA_w, bits_before, tok_valid)
    # Chunk B: GR3 stop bit + 3 low bits, after z zeros (factors only).
    chunkB_val = (1 << 3) | (lv & 0x7)
    chunkB_pos = bits_before + w1 + z
    words = scatter_chunk(
        words, chunkB_val, jnp.full(chunkB_val.shape, 4, jnp.int32),
        chunkB_pos, is_factor,
    )

    # ---- slot scatter: slot j (0-based) holds global bits [64j, 64j+64)
    scap = (9 * cap + 8 * TAIL_RESERVE) // 64 + 2  # static max slot count
    j = jnp.arange(scap, dtype=jnp.int32)
    slot_valid = j < num_slots
    # bytes before slot j+1's claim = #{t : byte_bits_t <= 64j}. byte_bits >= 1
    # for every valid token, so byte_bits <= 64j iff ceil(byte_bits/64) <= j:
    # histogram the per-token slot ordinal and prefix-sum — one small scatter
    # plus a cumsum instead of a binary search (gather cascade) per slot.
    s_ord = (byte_bits + 63) >> 6
    s_ord = jnp.where(tok_valid, s_ord, scap)
    cnt = jnp.zeros(scap + 1, jnp.int32).at[jnp.clip(s_ord, 0, scap)].add(
        1, mode="drop"
    )
    bytes_before = jnp.cumsum(cnt)[:scap].astype(jnp.int32)
    slot_pos = 4 + 8 * j + bytes_before

    hi = words[jnp.clip(2 * j, 0, nwords - 1)]
    lo = words[jnp.clip(2 * j + 1, 0, nwords - 1)]
    # LE u64 whose MSB is the earliest bit: bytes [lo&255, .., lo>>24, hi&255,
    # .., hi>>24] reversed per FORMAT.md §1.3.
    slot_bytes = jnp.stack(
        [
            (lo >> 0) & 0xFF, (lo >> 8) & 0xFF, (lo >> 16) & 0xFF, (lo >> 24) & 0xFF,
            (hi >> 0) & 0xFF, (hi >> 8) & 0xFF, (hi >> 16) & 0xFF, (hi >> 24) & 0xFF,
        ],
        axis=1,
    ).astype(jnp.uint8)
    slot_dst = slot_pos[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :]
    slot_dst = jnp.where(slot_valid[:, None], slot_dst, out_cap)
    out = out.at[slot_dst.reshape(-1)].set(slot_bytes.reshape(-1), mode="drop")

    salz_len = 4 + K + 8 * num_slots

    # ---- PLAIN fallback (salz.c:755-767): strictly larger than plain + 4.
    use_plain = salz_len > block_len + 4
    # PLAIN layout = header gap + raw block bytes: a concatenation (shift),
    # not a scatter.
    plain_out = jnp.concatenate(
        [jnp.zeros(4, jnp.uint8), block, jnp.zeros(out_cap - 4 - cap, jnp.uint8)]
    )
    plain_out = jnp.where(
        jnp.arange(out_cap) < block_len + 4, plain_out, 0
    ).astype(jnp.uint8)

    out = jnp.where(use_plain, plain_out, out)
    out_len = jnp.where(use_plain, block_len + 4, salz_len)

    # ---- stream header
    stream_type = jnp.where(use_plain, 0, 1).astype(jnp.uint32)
    payload = (out_len - 4).astype(jnp.uint32) & 0xFFFFFF
    hdr = (stream_type << 24) | payload
    hdr_bytes = jnp.stack(
        [(hdr >> 0) & 0xFF, (hdr >> 8) & 0xFF, (hdr >> 16) & 0xFF, (hdr >> 24) & 0xFF]
    ).astype(jnp.uint8)
    out = out.at[0:4].set(hdr_bytes)

    return out, out_len, salz_len
