"""Core SALZ format constants and closed-form code sizes.

Pure-Python/numpy-friendly definitions shared by the scalar oracle, the JAX/TPU
pipeline and the tests. Normative spec: FORMAT.md (derived from
/root/reference/lib/salz.c — constants at salz.c:50-57,562-563; vnibble thresholds
at salz.c:565-588; GR3 at salz.c:342-350,600-603).
"""

from __future__ import annotations

STREAM_TYPE_PLAIN = 0
STREAM_TYPE_SALZ = 1

TOKEN_LITERAL = 0
TOKEN_FACTOR = 1

FACTOR_OFFSET_MIN = 1
FACTOR_LENGTH_MIN = 3

#: Number of trailing block bytes always emitted as literals (format invariant
#: enabling 8-byte wide factor copies; salz.c:191-197).
TAIL_RESERVE = 8

#: vnibble size-class thresholds: value encodes in m nibbles iff
#: value < VNIBBLE_THRESHOLDS[m-1] (= sum_{i=1..m} 8^i). salz.c:565-588.
VNIBBLE_THRESHOLDS = tuple(
    sum(8 ** i for i in range(1, m + 1)) for m in range(1, 12)
)
# (8, 72, 584, 4680, 37448, 299592, 2396744, 19173960, 153391688, 1227133512,
#  9817068104)

#: Cumulative biases: value of class m encodes digits of value - VNIBBLE_BIAS[m-1].
VNIBBLE_BIAS = (0,) + VNIBBLE_THRESHOLDS[:-1]

SALZ_MAGIC = 0x53414C5A  # container magic, u32 LE (salzcli.c:28)
SALZ_SUFFIX = ".salz"
DEFAULT_LEVEL = 5


def block_size_for_level(level: int) -> int:
    """Compression level -> block ("segment") size in bytes. salzcli.c:109."""
    if not 0 <= level <= 9:
        raise ValueError(f"compression level must be in 0..9, got {level}")
    return 1 << (15 + level)


def encoded_len_max(plain_len: int) -> int:
    """Worst-case encoded segment size (salz.h:25-28)."""
    return 4 + plain_len + ((plain_len + 63) // 64) * 8


def vnibble_size(val: int) -> int:
    """Number of nibbles used by vnibble(val). salz.c:565-588."""
    for m, thr in enumerate(VNIBBLE_THRESHOLDS, start=1):
        if val < thr:
            return m
    return 11


def encode_vnibble(val: int) -> tuple[int, int]:
    """Return (bit_pattern, nbits) for vnibble(val), MSB-first.

    Digit form of salz.c:352-457 (see FORMAT.md §1.5): the m base-8 digits of
    val - bias(m), most significant first, final nibble OR 0x8.
    """
    m = vnibble_size(val)
    r = val - VNIBBLE_BIAS[m - 1]
    pattern = 0
    for d in range(m):
        digit = (r >> (3 * (m - 1 - d))) & 0x7
        if d == m - 1:
            digit |= 0x8
        pattern = (pattern << 4) | digit
    return pattern, 4 * m


def decode_vnibble_nibbles(nibbles: list[int]) -> int:
    """Inverse of encode_vnibble given the raw nibble sequence (salz.c:1008-1076)."""
    res = nibbles[0] & 0x7
    for nib in nibbles[1:]:
        res = ((res + 1) << 3) | (nib & 0x7)
    return res


def vnibble_bitsize(val: int) -> int:
    return 4 * vnibble_size(val)


def gr3_bitsize(val: int) -> int:
    """Bit length of GR3(val): unary(val>>3) + 3 fixed bits. salz.c:600-603."""
    return (val >> 3) + 1 + 3


def factor_offs_bitsize(offs: int) -> int:
    """salz.c:595-598: 8 fixed byte-stream bits + vnibble of high offset bits."""
    return 8 + vnibble_bitsize((offs - FACTOR_OFFSET_MIN) >> 8)


def factor_len_bitsize(length: int) -> int:
    """salz.c:605-608."""
    return gr3_bitsize(length - FACTOR_LENGTH_MIN)


def literal_cost() -> int:
    """1 token bit + 8 bits of byte payload (salz.c:626)."""
    return 9


def factor_cost(offs: int, length: int) -> int:
    """1 token bit + offset code + length code (salz.c:632-634)."""
    return 1 + factor_offs_bitsize(offs) + factor_len_bitsize(length)
