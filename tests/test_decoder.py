"""Device decoder tests: roundtrip vs oracle streams + malformed input."""

import numpy as np
import pytest
import jax.numpy as jnp

from salz_tpu import format as fmt
from salz_tpu.oracle import pycodec as oc
from salz_tpu.ops.decoder import decode_block_device
from conftest import make_corpus

SEG_CAP = 2048
OUT_CAP = 1024


def _decode(seg: bytes):
    buf = np.zeros(SEG_CAP, np.uint8)
    buf[: len(seg)] = np.frombuffer(seg, np.uint8)
    out, out_len, status = decode_block_device(
        jnp.asarray(buf), jnp.int32(len(seg)), seg_cap=SEG_CAP, out_cap=OUT_CAP
    )
    return bytes(np.asarray(out)[: int(out_len)]), int(status)


@pytest.mark.parametrize("kind", ["text", "runs", "zeros", "repetitive", "alternating"])
@pytest.mark.parametrize("n", [8, 64, 600, 1024])
def test_device_decode_roundtrip(kind, n):
    data = make_corpus(kind, n, seed=n + 71)
    seg = oc.encode_block(data)
    got, status = _decode(seg)
    assert status == 0
    assert got == data


def test_device_decode_plain_stream():
    data = make_corpus("random", 900, seed=5)
    seg = oc.encode_block(data)
    assert seg[3] == fmt.STREAM_TYPE_PLAIN
    got, status = _decode(seg)
    assert status == 0
    assert got == data


def test_device_decode_bad_header():
    _, status = _decode(bytes([0, 0, 0, 0xFF]) + b"x" * 16)
    assert status == 1
    _, status = _decode(bytes([100, 0, 0, 1]))  # truncated payload
    assert status == 1


def test_device_decode_large_offsets_and_long_factors():
    # long zero run -> giant factor with a multi-word GR3 unary part
    data = bytes(1000)
    seg = oc.encode_block(data)
    got, status = _decode(seg)
    assert status == 0
    assert got == data
