"""Unit tests for the closed-form number codes in salz_tpu.format.

The vnibble digit form is validated against the reference *decoder* recurrence
(salz.c:1008-1076), which independently pins the code: the reference encoder and
decoder are mutually consistent, so matching the decoder on every value matches
the encoder bit-for-bit.
"""

import pytest

from salz_tpu import format as fmt


def _decode_vnibble_bits(pattern: int, nbits: int) -> int:
    """Reference decoder recurrence over the MSB-first nibble stream."""
    assert nbits % 4 == 0
    nibbles = [(pattern >> (nbits - 4 * (i + 1))) & 0xF for i in range(nbits // 4)]
    res = nibbles[0] & 0x7
    seen_end = nibbles[0] >= 0x8
    for nib in nibbles[1:]:
        assert not seen_end, "terminator must be the final nibble"
        res = ((res + 1) << 3) | (nib & 0x7)
        seen_end = nib >= 0x8
    assert seen_end, "stream must end with terminator nibble"
    return res


def test_vnibble_thresholds_match_reference_constants():
    # salz.c:565-588
    assert fmt.VNIBBLE_THRESHOLDS[:10] == (
        8, 72, 584, 4680, 37448, 299592, 2396744, 19173960, 153391688, 1227133512
    )


@pytest.mark.parametrize("val", list(range(0, 700)) + [
    4679, 4680, 37447, 37448, 299591, 299592, 2396743, 2396744,
    19173959, 19173960, 153391687, 153391688, 1227133511, 1227133512,
    2**32 - 1, 12345, 65535, 65536, 999999,
])
def test_vnibble_roundtrip(val):
    pattern, nbits = fmt.encode_vnibble(val)
    assert nbits == 4 * fmt.vnibble_size(val)
    assert _decode_vnibble_bits(pattern, nbits) == val


def test_vnibble_size_boundaries():
    for m, thr in enumerate(fmt.VNIBBLE_THRESHOLDS[:10], start=1):
        assert fmt.vnibble_size(thr - 1) == m
        assert fmt.vnibble_size(thr) == m + 1


def test_vnibble_random_roundtrip():
    import random

    rng = random.Random(1234)
    for _ in range(5000):
        val = rng.randrange(0, 2**32)
        pattern, nbits = fmt.encode_vnibble(val)
        assert _decode_vnibble_bits(pattern, nbits) == val


def test_bit_sizes():
    # gr3: unary(v>>3) + 1 + 3 (salz.c:600-603)
    assert fmt.gr3_bitsize(0) == 4
    assert fmt.gr3_bitsize(7) == 4
    assert fmt.gr3_bitsize(8) == 5
    assert fmt.factor_len_bitsize(3) == 4
    assert fmt.factor_len_bitsize(10) == 4
    assert fmt.factor_len_bitsize(11) == 5
    # offsets: 8 fixed bits + vnibble((o-1)>>8) (salz.c:595-598)
    assert fmt.factor_offs_bitsize(1) == 12
    assert fmt.factor_offs_bitsize(256) == 12
    assert fmt.factor_offs_bitsize(257) == 12  # (256)>>8 = 1 < 8 -> 1 nibble
    assert fmt.factor_offs_bitsize(2049) == 16  # 2048>>8 = 8 -> 2 nibbles


def test_encoded_len_max():
    # salz.h:25-28: 4 + plain + roundup(plain, 64)/8
    assert fmt.encoded_len_max(0) == 4
    assert fmt.encoded_len_max(1) == 4 + 1 + 8
    assert fmt.encoded_len_max(64) == 4 + 64 + 8
    assert fmt.encoded_len_max(65) == 4 + 65 + 16


def test_block_size_levels():
    assert fmt.block_size_for_level(0) == 32 * 1024
    assert fmt.block_size_for_level(5) == 1024 * 1024
    assert fmt.block_size_for_level(9) == 16 * 1024 * 1024
    with pytest.raises(ValueError):
        fmt.block_size_for_level(10)
