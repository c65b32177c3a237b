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

BATCH-NATIVE on purpose: all scatters are flat 1-D with per-block offsets
(vmapped scatters lower an order of magnitude slower on TPU). A batch-level
lax.cond shrinks every token-indexed array to cap/2 when every block's token
count allows it (the common case for compressible data — token count is
roughly cap/4 on text); the full-width branch covers literal-heavy blocks.

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


def _emit_core(
    is_start, blocks, block_lens, offs, length, *, cap: int, tcap: int,
    scap: int | None = None,
):
    """Stream assembly for token arrays truncated to width `tcap` and slot
    arrays truncated to `scap` 64-bit slots.

    Correctness contract: whenever some block's token count K exceeds
    tcap - TAIL_RESERVE (or its slot count exceeds scap - 2), that block's
    `out` bytes may be wrong, and its (out_len, salz_len) accounting and the
    PLAIN decision may also be wrong — so callers must pick tcap >= max(K) +
    TAIL_RESERVE and scap >= max(num_slots) + 2 (the ladder conds below use
    exact precomputed counts).
    """
    B = blocks.shape[0]
    ns = block_lens - TAIL_RESERVE
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]

    # ---- compact tokens (text tokens first, then the 8 forced tail literals)
    # Stable sort by ~is_start carries (position, length, offset, byte) of
    # every token start to the front in text order — one sort instead of a
    # compaction scatter plus three full-size gathers.
    num_text_tokens = jnp.sum(is_start.astype(jnp.int32), axis=1)  # (B,)
    K = num_text_tokens + TAIL_RESERVE  # total tokens per block

    # Fused key (flag in bit 26; cap <= 2^24 always) makes the stable
    # compaction a plain single-key sort and yields pos_s from the key
    # itself — two fewer cap-wide sort operands than flag+iota+payloads.
    flagbit = jnp.int32(1 << 26)
    slot_iota = jnp.broadcast_to(idx, (B, cap)) + (length - length)
    fused = jnp.where(is_start, slot_iota, slot_iota | flagbit)
    fused_s, len_s, offs_s, byte_s = jax.lax.sort(
        (fused, length, offs, blocks), num_keys=1, dimension=1
    )
    pos_s = fused_s & (flagbit - 1)
    pos_s = pos_s[:, : tcap - TAIL_RESERVE]
    len_s = len_s[:, : tcap - TAIL_RESERVE]
    offs_s = offs_s[:, : tcap - TAIL_RESERVE]
    byte_s = byte_s[:, : tcap - TAIL_RESERVE]

    tids = jnp.arange(tcap, dtype=jnp.int32)[None, :]
    Kb = K[:, None]
    ntt = num_text_tokens[:, None]
    tok_valid = tids < Kb
    is_tail = (tids >= ntt) & tok_valid
    pad = jnp.zeros((B, TAIL_RESERVE), jnp.int32)
    tail_pos = ns[:, None] + tids - ntt
    tok_pos = jnp.where(is_tail, tail_pos, jnp.concatenate([pos_s, pad], axis=1))
    tok_pos = jnp.where(tok_valid, tok_pos, cap)
    tok_len = jnp.where(
        is_tail | ~tok_valid, 1, jnp.concatenate([len_s, pad], axis=1)
    )
    tok_offs = jnp.where(
        tok_valid & ~is_tail, jnp.concatenate([offs_s, pad], axis=1), 0
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

    bits_before = jnp.cumsum(bits_t, axis=1) - bits_t  # exclusive prefix sum
    total_bits = jnp.sum(bits_t, axis=1)  # (B,)
    num_slots = (total_bits + 63) >> 6

    out_cap = 4 + cap + ((cap + 63) // 64) * 8 + 16  # encoded_len_max(cap)+16
    pay_cap = out_cap - 4

    # ---- token bytes
    # Literal bytes came through the compaction sort; the 8 tail literal bytes
    # live at blocks[b, n : n+8] (a tiny per-row gather) and land at token ids
    # num_text_tokens..K-1.
    lit_bytes = jnp.concatenate(
        [byte_s, jnp.zeros((B, TAIL_RESERVE), jnp.uint8)], axis=1
    )
    tail_cols = jnp.clip(
        ns[:, None] + jnp.arange(TAIL_RESERVE, dtype=jnp.int32)[None, :],
        0,
        cap - 1,
    )
    tail_bytes = jnp.take_along_axis(blocks, tail_cols, axis=1)
    # Place tail bytes at token ids ntt..K-1 with a small flat scatter.
    trow = (jnp.arange(B, dtype=jnp.int32) * tcap)[:, None]
    lit_flat = lit_bytes.reshape(-1)
    tail_dst = trow + jnp.clip(
        ntt + jnp.arange(TAIL_RESERVE, dtype=jnp.int32)[None, :], 0, tcap - 1
    )
    lit_bytes = (
        lit_flat.at[tail_dst.reshape(-1)]
        .set(tail_bytes.reshape(-1), mode="drop")
        .reshape(B, tcap)
    )
    byte_val = jnp.where(
        is_factor, ((tok_offs - 1) & 0xFF).astype(jnp.uint8), lit_bytes
    )
    byte_bits = bits_before + w1  # bits written before this token's byte
    byte_pos = 4 + tids + 8 * ((byte_bits + 63) >> 6)
    # The bound keeps an overflowing (necessarily PLAIN-destined) block's
    # entries out of the payload merge below.
    byte_ok = tok_valid & (byte_pos < out_cap)

    # ---- bit chunks -> uint32 word array (word w holds bits [32w, 32w+32),
    # MSB-first within the word). Default size = the non-PLAIN slot bound:
    # salz_len = 4 + K + 8*num_slots <= block_len + 4 implies
    # num_slots <= (n + 8 - K)/8 <= cap/8 + 1; any stream that overflows this
    # is provably PLAIN (discarded), so dropped contributions are harmless.
    # The ladder passes a smaller exact-count-backed scap for typical data.
    if scap is None:
        scap = cap // 8 + 2
    nwords = 2 * scap
    wrow = (jnp.arange(B, dtype=jnp.int32) * nwords)[:, None]
    words = jnp.zeros(B * nwords, jnp.uint32)

    def scatter_chunk(words, value, width, bitpos, valid):
        """OR value (width bits, MSB-aligned to bitpos) into the word array."""
        value = value.astype(jnp.uint32)
        w = bitpos >> 5
        r = (bitpos & 31).astype(jnp.uint32)
        space = 32 - r  # bits available in word w at offset r
        wide = width.astype(jnp.uint32)
        shift_left = jnp.where(wide <= space, space - wide, 0)
        shift_right = jnp.where(wide > space, wide - space, 0)
        contrib0 = jnp.where(
            wide > space, value >> shift_right, value << shift_left
        )
        rem = jnp.where(wide > space, wide - space, 0)
        low = value & ((jnp.uint32(1) << rem) - 1)
        contrib1 = jnp.where(rem > 0, low << (32 - rem), 0)
        valid0 = valid & (w < nwords)
        wi = jnp.where(valid0, wrow + w, B * nwords)
        words = words.at[wi.reshape(-1)].add(contrib0.reshape(-1), mode="drop")
        valid1 = valid & (rem > 0) & (w + 1 < nwords)
        words = words.at[
            jnp.where(valid1, wrow + w + 1, B * nwords).reshape(-1)
        ].add(contrib1.reshape(-1), mode="drop")
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
        words,
        chunkB_val,
        jnp.full(chunkB_val.shape, 4, jnp.int32),
        chunkB_pos,
        is_factor,
    )
    words = words.reshape(B, nwords)

    # ---- slot positions: slot j (0-based) holds global bits [64j, 64j+64)
    j = jnp.arange(scap, dtype=jnp.int32)[None, :]
    slot_valid = j < num_slots[:, None]
    # bytes before slot j+1's claim = #{t : byte_bits_t <= 64j}. byte_bits >= 1
    # for every valid token, so byte_bits <= 64j iff ceil(byte_bits/64) <= j:
    # histogram the per-token slot ordinal and prefix-sum.
    srow = (jnp.arange(B, dtype=jnp.int32) * (scap + 1))[:, None]
    s_ord = (byte_bits + 63) >> 6
    s_ord = jnp.where(tok_valid & (s_ord <= scap), s_ord, scap)
    cnt = (
        jnp.zeros(B * (scap + 1), jnp.int32)
        .at[(srow + s_ord).reshape(-1)]
        .add(1, mode="drop")
        .reshape(B, scap + 1)
    )
    bytes_before = jnp.cumsum(cnt, axis=1)[:, :scap].astype(jnp.int32)
    slot_pos = 4 + 8 * j + bytes_before

    hi = words[:, 0::2]
    lo = words[:, 1::2]
    # LE u64 whose MSB is the earliest bit: bytes [lo&255, .., lo>>24, hi&255,
    # .., hi>>24] per FORMAT.md §1.3.
    slot_bytes = jnp.stack(
        [
            (lo >> 0) & 0xFF, (lo >> 8) & 0xFF, (lo >> 16) & 0xFF, (lo >> 24) & 0xFF,
            (hi >> 0) & 0xFF, (hi >> 8) & 0xFF, (hi >> 16) & 0xFF, (hi >> 24) & 0xFF,
        ],
        axis=2,
    ).astype(jnp.uint8)
    slot_ok = slot_valid & (slot_pos + 7 < out_cap)

    salz_len = 4 + K + 8 * num_slots

    # ---- merged payload assembly. Token bytes and slot bytes tile the
    # payload region [4, salz_len) exactly once (FORMAT.md §1.3), so ONE
    # ascending sort of (position, byte) pairs lays the stream out
    # contiguously — cheaper than byte-granular scatters on TPU (~2.1 vs
    # ~4.9 ns/elem) and it kills the B*out_cap scratch buffer.
    slot_q = (slot_pos - 4)[:, :, None] + jnp.arange(8, dtype=jnp.int32)[
        None, None, :
    ]
    slot_q = jnp.where(slot_ok[:, :, None], slot_q, pay_cap).reshape(B, -1)
    tok_q = jnp.where(byte_ok, byte_pos - 4, pay_cap)
    keys = jnp.concatenate([tok_q, slot_q], axis=1)
    vals8 = jnp.concatenate([byte_val, slot_bytes.reshape(B, -1)], axis=1)
    _, pay = jax.lax.sort((keys, vals8), num_keys=1, dimension=1)
    width = keys.shape[1]
    pidx = jnp.arange(width, dtype=jnp.int32)[None, :]
    pay = jnp.where(pidx < (salz_len - 4)[:, None], pay, 0)
    if width >= pay_cap:
        pay = pay[:, :pay_cap]
    else:
        pay = jnp.concatenate(
            [pay, jnp.zeros((B, pay_cap - width), jnp.uint8)], axis=1
        )

    # ---- PLAIN fallback (salz.c:755-767): strictly larger than plain + 4.
    use_plain = (salz_len > block_lens + 4)[:, None]
    oidx = jnp.arange(pay_cap, dtype=jnp.int32)[None, :]
    plain_pay = jnp.concatenate(
        [blocks, jnp.zeros((B, pay_cap - cap), jnp.uint8)], axis=1
    )
    plain_pay = jnp.where(oidx < block_lens[:, None], plain_pay, 0).astype(
        jnp.uint8
    )
    pay = jnp.where(use_plain, plain_pay, pay)
    out_len = jnp.where(use_plain[:, 0], block_lens + 4, salz_len)

    # ---- stream header
    stream_type = jnp.where(use_plain[:, 0], 0, 1).astype(jnp.uint32)
    payload = (out_len - 4).astype(jnp.uint32) & 0xFFFFFF
    hdr = (stream_type << 24) | payload
    hdr_bytes = jnp.stack(
        [(hdr >> 0) & 0xFF, (hdr >> 8) & 0xFF, (hdr >> 16) & 0xFF, (hdr >> 24) & 0xFF],
        axis=1,
    ).astype(jnp.uint8)
    out = jnp.concatenate([hdr_bytes, pay], axis=1)

    return out, out_len, salz_len


@functools.partial(jax.jit, static_argnames=("cap",))
def emit_stream_batch(
    blocks: jax.Array,  # uint8[B, cap] padded blocks (text + 8 tail bytes)
    block_lens: jax.Array,  # int32[B] total block lengths (n + 8)
    offs: jax.Array,  # int32[B, cap] chosen factor offsets (text positions)
    length: jax.Array,  # int32[B, cap] chosen factor lengths (1 = literal)
    *,
    cap: int,
):
    """Produce complete segments: header + interleaved stream + fallback.

    Returns (out, out_len, salz_len): out uint8[B, out_cap]; out_len after the
    PLAIN-fallback decision; salz_len the raw SALZ layout size (callers
    reproduce the reference's capacity-abort semantics from it).
    """
    ns = block_lens - TAIL_RESERVE
    is_start = jax.vmap(lambda l, n: token_starts(l, n, cap=cap))(length, ns)
    tcap_full = cap + TAIL_RESERVE
    if cap < 2048:
        return _emit_core(
            is_start, blocks, block_lens, offs, length, cap=cap, tcap=tcap_full
        )
    num_text = jnp.sum(is_start.astype(jnp.int32), axis=1)
    max_text = jnp.max(num_text)

    # Exact bitstream size per block (cheap elementwise + row sum): every
    # token's bit width is a closed form of (offs, length), and the 8 tail
    # literals add 8 bits — this sizes the slot arrays exactly BEFORE the
    # core runs, so the slot rung is backed by real counts, not the cap/8
    # worst case (measured text: ~1.3% of the bound).
    is_fac = is_start & (length > 1)
    mm = _vnibble_size_vec(jnp.where(is_fac, (offs - 1) >> 8, 0))
    zz = jnp.where(is_fac, (length - 3) >> 3, 0)
    bits_pos = jnp.where(is_fac, 5 + 4 * mm + zz, is_start.astype(jnp.int32))
    total_bits = jnp.sum(bits_pos, axis=1) + TAIL_RESERVE
    max_slots = jnp.max((total_bits + 63) >> 6)

    S_SMALL = cap // 32 + 2
    S_FULL = cap // 8 + 2

    def core(tcap, scap):
        return lambda _: _emit_core(
            is_start, blocks, block_lens, offs, length, cap=cap, tcap=tcap,
            scap=scap,
        )

    # Token-width x slot-count bucket ladder: every token-indexed scatter/
    # cumsum costs linearly in tcap, and the slot-byte synthesis plus the
    # payload merge sort cost linearly in scap. Measured loads
    # (scripts/ladder_stats.py): text/source tokens are 2-10% of cap with
    # slots well under S_SMALL; ELF binaries run to ~29% tokens but their
    # slots STILL fit S_SMALL — which is why the slot rung is decoupled
    # from the token rung (a coupled ladder forced S_FULL slot arrays and
    # a 2x-wider payload merge on binaries).
    s_fit = max_slots <= S_SMALL - 2
    return jax.lax.cond(
        (max_text <= cap // 8) & s_fit,
        core(cap // 8 + TAIL_RESERVE, S_SMALL),
        lambda _: jax.lax.cond(
            # 3/8 rung: ELF binaries measure ~29% tokens — just over cap/4 —
            # and every token-indexed scatter costs linearly in tcap, so
            # rounding them up to cap/2 wasted ~25% of the dominant
            # scatter_chunk volume.
            (max_text <= 3 * cap // 8) & s_fit,
            core(3 * cap // 8 + TAIL_RESERVE, S_SMALL),
            lambda _: jax.lax.cond(
                (max_text <= cap // 2) & s_fit,
                core(cap // 2 + TAIL_RESERVE, S_SMALL),
                lambda _: jax.lax.cond(
                    max_text <= cap // 2,
                    core(cap // 2 + TAIL_RESERVE, S_FULL),
                    core(tcap_full, S_FULL),
                    0,
                ),
                0,
            ),
            0,
        ),
        0,
    )


@functools.partial(jax.jit, static_argnames=("cap",))
def emit_stream(
    block: jax.Array,  # uint8[cap] padded block (text + 8 tail bytes)
    block_len: jax.Array,  # dynamic total block length (n + 8)
    offs: jax.Array,  # int32[cap] chosen factor offsets (text positions)
    length: jax.Array,  # int32[cap] chosen factor lengths (1 = literal)
    *,
    cap: int,
):
    """Single-block wrapper over emit_stream_batch (same contract)."""
    out, out_len, salz_len = emit_stream_batch(
        block[None], jnp.asarray(block_len)[None], offs[None], length[None],
        cap=cap,
    )
    return out[0], out_len[0], salz_len[0]
