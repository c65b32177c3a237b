"""Scalar Python oracle codec — the executable specification of FORMAT.md.

This module mirrors the reference semantics (/root/reference/lib/salz.c) stage by
stage in plain Python/numpy, exposing every intermediate (SA, PSV/NSV, candidates,
optimal parse, stream) so the JAX/TPU pipeline can be golden-tested per stage.
It is written for clarity and exactness, not speed; the fast scalar path is the
C++ oracle in salz_tpu/native/.
"""

from __future__ import annotations

import numpy as np

from salz_tpu import format as fmt


class SalzEncodeError(ValueError):
    pass


class SalzDecodeError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Stage C6: suffix array (reference: libsais call at salz.c:463-469).
# SA of a text is unique, so prefix doubling reproduces SA-IS output exactly.
# ---------------------------------------------------------------------------

def suffix_array(text: np.ndarray) -> np.ndarray:
    """Suffix array of uint8 array `text` via prefix doubling (O(n log^2 n))."""
    n = int(text.shape[0])
    if n == 0:
        return np.empty(0, dtype=np.int32)
    rank = text.astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        rank2 = np.full(n, -1, dtype=np.int64)
        rank2[: n - k] = rank[k:]
        order = np.lexsort((rank2, rank))
        pair = np.stack([rank[order], rank2[order]], axis=1)
        new_rank = np.empty(n, dtype=np.int64)
        diff = np.any(pair[1:] != pair[:-1], axis=1)
        ranks_sorted = np.concatenate([[0], np.cumsum(diff)])
        new_rank[order] = ranks_sorted
        rank = new_rank
        if ranks_sorted[-1] == n - 1:
            return order.astype(np.int32)
        k *= 2
        if k >= n:
            # All ranks distinct at the latest once k >= n.
            final = np.empty(n, dtype=np.int64)
            final[rank] = idx
            return final.astype(np.int32)


# ---------------------------------------------------------------------------
# Stage C7: PSV/NSV arrays (salz.c:471-490, KKP stack scan).
# ---------------------------------------------------------------------------

def psv_nsv(sa: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Text-order PSV/NSV text positions (-1 = absent) from the suffix array."""
    n = int(sa.shape[0])
    psv = np.full(n, -1, dtype=np.int64)
    nsv = np.full(n, -1, dtype=np.int64)
    # Mirror of the in-place stack scan with -1 sentinels at both ends.
    arr = np.empty(n + 2, dtype=np.int64)
    arr[0] = -1
    arr[1 : n + 1] = sa
    arr[n + 1] = -1
    stack = [arr[0]]
    for i in range(1, n + 2):
        cur = arr[i]
        while stack[-1] > cur:
            top = stack.pop()
            psv[top] = stack[-1]
            nsv[top] = cur
        stack.append(cur)
    return psv, nsv


# ---------------------------------------------------------------------------
# Stage C8+C9: factorization candidates (salz.c:492-560).
# ---------------------------------------------------------------------------

def _lcp_cmp(text: np.ndarray, common_len: int, pos1: int, pos2: int) -> int:
    """LCP of suffixes pos1 < pos2, seeded at common_len (salz.c:492-514).

    Comparison is capped so that it never inspects beyond the text end:
    result <= len(text) - pos2.
    """
    n = int(text.shape[0])
    length = common_len
    # Vectorized: find first mismatch from `length` onward.
    limit = n - pos2
    if length >= limit:
        return length  # reference loop conditions stop immediately
    a = text[pos1 + length : pos1 + limit]
    b = text[pos2 + length : pos2 + limit]
    neq = np.nonzero(a != b)[0]
    if neq.size:
        return length + int(neq[0])
    return limit


def factorize(
    text: np.ndarray, psv: np.ndarray, nsv: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-position candidate (psv_offs, psv_len, nsv_offs, nsv_len).

    Replicates salz.c:516-560 including the `prev_len - 1` LCP seeding and the
    offsets written even for absent (-1) candidates (never admissible: len=0).
    Position 0 entries match the forced-literal initialization (salz.c:546-548).
    """
    n = int(text.shape[0])
    psv_offs = np.zeros(n, dtype=np.int64)
    psv_len = np.zeros(n, dtype=np.int64)
    nsv_offs = np.zeros(n, dtype=np.int64)
    nsv_len = np.zeros(n, dtype=np.int64)
    if n > 0:
        psv_len[0] = 1
        nsv_len[0] = 1
    prev_psv_len = 0
    prev_nsv_len = 0
    for pos in range(1, n):
        p, q = int(psv[pos]), int(nsv[pos])
        if p != -1:
            seed = prev_psv_len - 1 if prev_psv_len > 0 else 0
            plen = _lcp_cmp(text, seed, p, pos)
        else:
            plen = 0
        if q != -1:
            seed = prev_nsv_len - 1 if prev_nsv_len > 0 else 0
            qlen = _lcp_cmp(text, seed, q, pos)
        else:
            qlen = 0
        prev_psv_len, prev_nsv_len = plen, qlen
        psv_offs[pos] = pos - p
        psv_len[pos] = plen
        nsv_offs[pos] = pos - q
        nsv_len[pos] = qlen
    return psv_offs, psv_len, nsv_offs, nsv_len


# ---------------------------------------------------------------------------
# Stage C10: cost-optimal parse (salz.c:610-662).
# ---------------------------------------------------------------------------

def optimize(
    psv_offs: np.ndarray,
    psv_len: np.ndarray,
    nsv_offs: np.ndarray,
    nsv_len: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Backward DP -> (offs, len, cost) per position.

    Tie-breaking is strict `<`: literal beats PSV beats NSV on equal cost
    (salz.c:636,651). Position 0 keeps the forced-literal candidate.
    """
    n = int(psv_offs.shape[0])
    offs = np.zeros(n + 1, dtype=np.int64)
    length = np.ones(n + 1, dtype=np.int64)
    cost = np.zeros(n + 1, dtype=np.int64)
    fob = _factor_offs_bitsize_np
    flb = _factor_len_bitsize_np
    for p in range(n - 1, 0, -1):
        best_offs = 0
        best_len = 1
        best_cost = 9 + cost[p + 1]
        alt_len = psv_len[p]
        if alt_len >= fmt.FACTOR_LENGTH_MIN:
            alt_offs = psv_offs[p]
            alt_cost = 1 + fob(alt_offs) + flb(alt_len) + cost[p + alt_len]
            if alt_cost < best_cost:
                best_cost, best_offs, best_len = alt_cost, alt_offs, alt_len
        alt_len = nsv_len[p]
        if alt_len >= fmt.FACTOR_LENGTH_MIN:
            alt_offs = nsv_offs[p]
            alt_cost = 1 + fob(alt_offs) + flb(alt_len) + cost[p + alt_len]
            if alt_cost < best_cost:
                best_cost, best_offs, best_len = alt_cost, alt_offs, alt_len
        offs[p] = best_offs
        length[p] = best_len
        cost[p] = best_cost
    if n > 0:
        cost[0] = 0  # never computed by the reference (aux slot holds PSV leftovers)
    return offs[:n], length[:n], cost[: n + 1]


def _vnibble_size_np(v):
    m = np.ones_like(v)
    for thr in fmt.VNIBBLE_THRESHOLDS[:-1]:
        m += v >= thr
    return m


def _factor_offs_bitsize_np(offs):
    return 8 + 4 * _vnibble_size_np((offs - fmt.FACTOR_OFFSET_MIN) >> 8)


def _factor_len_bitsize_np(length):
    v = length - fmt.FACTOR_LENGTH_MIN
    return (v >> 3) + 1 + 3


# ---------------------------------------------------------------------------
# Stage C3-C5, C11, C12: bit writer and emission (salz.c:258-457,664-775).
# ---------------------------------------------------------------------------

class BitWriter:
    """Exact mirror of the reference's interleaved bit/byte writer."""

    def __init__(self, capacity: int):
        self.dst = bytearray(capacity)
        self.dst_pos = 4  # stream header reserved (salz.c:223)
        self.bits = 0
        self.bits_avail = 0
        self.bits_pos = 0

    def _flush_bits(self) -> None:
        # salz.c:268-283: store accumulator at its slot, claim a new slot here.
        self.dst[self.bits_pos : self.bits_pos + 8] = self.bits.to_bytes(8, "little")
        if self.dst_pos + 8 > len(self.dst):
            raise SalzEncodeError("dst overflow")
        self.bits = 0
        self.bits_avail = 64
        self.bits_pos = self.dst_pos
        self.dst_pos += 8

    def write_bit(self, val: int) -> None:
        if self.bits_avail == 0:
            self._flush_bits()
        self.bits = ((self.bits << 1) | (val & 1)) & 0xFFFFFFFFFFFFFFFF
        self.bits_avail -= 1

    def write_bits(self, bits: int, count: int) -> None:
        if self.bits_avail == 0:
            self._flush_bits()
        if count > self.bits_avail:
            take = self.bits_avail
            self.bits = ((self.bits << take) | ((bits >> (count - take)) & ((1 << take) - 1))) & 0xFFFFFFFFFFFFFFFF
            count -= take
            self._flush_bits()
        self.bits = ((self.bits << count) | (bits & ((1 << count) - 1))) & 0xFFFFFFFFFFFFFFFF
        self.bits_avail -= count

    def write_zeros(self, count: int) -> None:
        while count:
            if self.bits_avail == 0:
                self._flush_bits()
            take = min(self.bits_avail, count)
            self.bits = (self.bits << take) & 0xFFFFFFFFFFFFFFFF
            self.bits_avail -= take
            count -= take

    def write_unary(self, val: int) -> None:
        self.write_zeros(val)
        self.write_bit(1)

    def write_gr3(self, val: int) -> None:
        self.write_unary(val >> 3)
        self.write_bits(val & 0x7, 3)

    def write_vnibble(self, val: int) -> None:
        pattern, nbits = fmt.encode_vnibble(val)
        self.write_bits(pattern, nbits)

    def write_u8(self, val: int) -> None:
        if self.dst_pos >= len(self.dst):
            raise SalzEncodeError("dst overflow")
        self.dst[self.dst_pos] = val & 0xFF
        self.dst_pos += 1

    def finalize_bits(self) -> None:
        # salz.c:752-753: left-align and store the final partial word.
        self.bits = (self.bits << self.bits_avail) & 0xFFFFFFFFFFFFFFFF
        self.dst[self.bits_pos : self.bits_pos + 8] = self.bits.to_bytes(8, "little")


def emit(
    block: np.ndarray,
    offs: np.ndarray,
    length: np.ndarray,
    dst_cap: int | None = None,
) -> bytes:
    """Token emission + finalization for a full block (salz.c:664-775).

    `offs`/`length` cover text positions [0, n) with n = len(block) - 8; the last
    8 bytes are emitted as forced literal tokens. Returns the complete segment
    including the 4-byte stream header, after the PLAIN fallback decision.

    `dst_cap` models the caller-provided output capacity: like the reference,
    emission *fails* (no PLAIN fallback) if the SALZ stream outgrows it
    (salz.c:274-275,260-262) — reachable on near-incompressible blocks where a
    few cheap factors save fewer stream bytes than the extra 8-byte bit-word
    slot they cause. The reference CLI passes encoded_len_max(level block size)
    (salzcli.c:129). None = unbounded (library convenience).
    """
    plain_len = int(block.shape[0])
    n = plain_len - fmt.TAIL_RESERVE
    if dst_cap is None:
        # True worst case: total bits = DP cost <= 9*plain, so the SALZ layout
        # never exceeds encoded_len_max by more than one slot + alignment.
        dst_cap = fmt.encoded_len_max(plain_len) + 16
    w = BitWriter(dst_cap)
    pos = 0
    while pos < n:
        flen = int(length[pos])
        if flen == 1:
            w.write_bit(fmt.TOKEN_LITERAL)
            w.write_u8(int(block[pos]))
            pos += 1
        else:
            foffs = int(offs[pos])
            w.write_bit(fmt.TOKEN_FACTOR)
            w.write_vnibble((foffs - fmt.FACTOR_OFFSET_MIN) >> 8)
            w.write_u8((foffs - fmt.FACTOR_OFFSET_MIN) & 0xFF)
            w.write_gr3(flen - fmt.FACTOR_LENGTH_MIN)
            pos += flen
    for i in range(fmt.TAIL_RESERVE):
        w.write_bit(fmt.TOKEN_LITERAL)
        w.write_u8(int(block[n + i]))
    w.finalize_bits()

    if w.dst_pos > plain_len + 4:
        # PLAIN fallback (salz.c:755-767): strictly larger than plain + header.
        hdr = (fmt.STREAM_TYPE_PLAIN << 24) | (plain_len & 0xFFFFFF)
        out = bytearray(4 + plain_len)
        out[0:4] = hdr.to_bytes(4, "little")
        out[4:] = block.tobytes()
        return bytes(out)
    hdr = (fmt.STREAM_TYPE_SALZ << 24) | ((w.dst_pos - 4) & 0xFFFFFF)
    w.dst[0:4] = hdr.to_bytes(4, "little")
    return bytes(w.dst[: w.dst_pos])


# ---------------------------------------------------------------------------
# Full block encode/decode.
# ---------------------------------------------------------------------------

def encode_block(block: bytes | np.ndarray, dst_cap: int | None = None) -> bytes:
    """Encode one plain block into a SALZ segment (salz_encode_safe)."""
    data = np.frombuffer(bytes(block), dtype=np.uint8)
    plain_len = int(data.shape[0])
    if plain_len < fmt.TAIL_RESERVE:
        # Reference: unsigned src_len underflow -> allocation failure (salz.c:197).
        raise SalzEncodeError(f"block too short to encode ({plain_len} < 8 bytes)")
    n = plain_len - fmt.TAIL_RESERVE
    text = data[:n]
    if n > 0:
        sa = suffix_array(text)
        psv, nsv = psv_nsv(sa)
        cands = factorize(text, psv, nsv)
        offs, length, _ = optimize(*cands)
    else:
        offs = np.zeros(0, dtype=np.int64)
        length = np.zeros(0, dtype=np.int64)
    return emit(data, offs, length, dst_cap)


class BitReader:
    """Exact mirror of the reference's decoder-side bit reader (salz.c:888-1076)."""

    def __init__(self, src: bytes):
        self.src = src
        self.src_pos = 0
        self.bits = 0
        self.bits_avail = 0

    def read_u8(self) -> int:
        if self.src_pos >= len(self.src):
            raise SalzDecodeError("src underflow")
        b = self.src[self.src_pos]
        self.src_pos += 1
        return b

    def _queue_bits(self) -> None:
        if self.src_pos + 8 > len(self.src):
            raise SalzDecodeError("src underflow")
        self.bits = int.from_bytes(self.src[self.src_pos : self.src_pos + 8], "little")
        self.src_pos += 8
        self.bits_avail = 64

    def read_bit(self) -> int:
        if self.bits_avail == 0:
            self._queue_bits()
        bit = (self.bits >> 63) & 1
        self.bits = (self.bits << 1) & 0xFFFFFFFFFFFFFFFF
        self.bits_avail -= 1
        return bit

    def read_bits(self, count: int) -> int:
        if self.bits_avail == 0:
            self._queue_bits()
        if count <= self.bits_avail:
            res = self.bits >> (64 - count)
            self.bits = (self.bits << count) & 0xFFFFFFFFFFFFFFFF
            self.bits_avail -= count
            return res
        res = self.bits >> (64 - self.bits_avail)
        count -= self.bits_avail
        self._queue_bits()
        res = (res << count) | (self.bits >> (64 - count))
        self.bits = (self.bits << count) & 0xFFFFFFFFFFFFFFFF
        self.bits_avail -= count
        return res

    def read_unary(self) -> int:
        if self.bits_avail == 0:
            self._queue_bits()
        res = 0
        while self.bits == 0:
            res += self.bits_avail
            self._queue_bits()
        last_zeros = 63 - self.bits.bit_length() + 1
        self.bits = (self.bits << (last_zeros + 1)) & 0xFFFFFFFFFFFFFFFF
        self.bits_avail -= last_zeros + 1
        return res + last_zeros

    def read_gr3(self) -> int:
        var = self.read_unary()
        fixed = self.read_bits(3)
        return (var << 3) | fixed

    def read_vnibble(self) -> int:
        nib = self.read_bits(4)
        res = nib & 0x7
        while nib < 0x8:
            nib = self.read_bits(4)
            res = ((res + 1) << 3) | (nib & 0x7)
        return res


def decode_block(segment: bytes, dst_cap: int | None = None) -> bytes:
    """Decode one SALZ segment back to plain bytes (salz_decode_safe)."""
    if len(segment) < 4:
        raise SalzDecodeError("cannot read stream header")
    hdr = int.from_bytes(segment[0:4], "little")
    stream_type = hdr >> 24
    stream_len = hdr & 0xFFFFFF
    if stream_type >= 2:
        raise SalzDecodeError(f"unknown stream type {stream_type}")
    if stream_len > len(segment) - 4:
        raise SalzDecodeError("stream is truncated")
    payload = segment[4 : 4 + stream_len]
    if stream_type == fmt.STREAM_TYPE_PLAIN:
        if dst_cap is not None and stream_len > dst_cap:
            raise SalzDecodeError("dst overflow")
        return bytes(payload)

    r = BitReader(payload)
    out = bytearray()
    while r.src_pos < len(payload):
        token = r.read_bit()
        if token == fmt.TOKEN_LITERAL:
            out.append(r.read_u8())
        else:
            var = r.read_vnibble()
            fixed = r.read_u8()
            factor_offs = ((var << 8) | fixed) + fmt.FACTOR_OFFSET_MIN
            factor_len = r.read_gr3() + fmt.FACTOR_LENGTH_MIN
            if factor_offs > len(out):
                raise SalzDecodeError("factor offset out of range")
            start = len(out) - factor_offs
            for i in range(factor_len):  # overlap-correct byte copy
                out.append(out[start + i])
        if dst_cap is not None and len(out) > dst_cap:
            raise SalzDecodeError("dst overflow")
    return bytes(out)
