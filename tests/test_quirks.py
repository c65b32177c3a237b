"""Reference-quirk pins that need big blocks (SURVEY.md §7 quirk list).

The 24-bit stream-length wrap: the stream header is
`(type << 24) | (payload_len & 0xFFFFFF)` (reference lib/salz.c:740,760-772).
A level-9 (16 MiB) incompressible block takes the PLAIN fallback whose payload
is exactly 2^24 bytes, so the masked length field silently wraps to 0
(lib/salz.c:770, FORMAT.md:143). The encoder must reproduce the wrapped
header byte-for-byte; the decoder then sees a length-0 PLAIN stream and
returns 0 bytes — the reference's silent data loss, pinned here as such.
"""

import numpy as np
import pytest

from salz_tpu import format as fmt
from salz_tpu import native

BS_LEVEL9 = 1 << 24  # 16 MiB (salzcli.c:109: 1 << (15 + 9))


@pytest.fixture(scope="module")
def wrapped_segment():
    rng = np.random.default_rng(0xC0FFEE)
    block = rng.integers(0, 256, BS_LEVEL9, dtype=np.uint8).tobytes()
    seg = native.encode_block(block)
    return block, seg


@pytest.mark.slow
def test_24bit_length_wrap_header(wrapped_segment):
    block, seg = wrapped_segment
    # PLAIN fallback taken: payload is the raw 16 MiB block after the header.
    assert len(seg) == 4 + BS_LEVEL9
    hdr = int.from_bytes(seg[:4], "little")
    assert hdr >> 24 == fmt.STREAM_TYPE_PLAIN
    # 2^24 & 0xFFFFFF == 0: the wrapped length field.
    assert hdr & 0xFFFFFF == 0
    assert seg[4:] == block


@pytest.mark.slow
def test_24bit_length_wrap_decode_loses_data(wrapped_segment):
    _, seg = wrapped_segment
    # Both scalar decoders parse length 0 and return an empty block, exactly
    # like the reference's cpy_plain_stream of 0 bytes (salz.c:1082-1091).
    from salz_tpu.oracle import pycodec

    assert native.decode_block(seg, BS_LEVEL9) == b""
    assert pycodec.decode_block(seg, dst_cap=BS_LEVEL9) == b""
