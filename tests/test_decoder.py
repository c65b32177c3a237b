"""Device decoder tests: roundtrip vs oracle streams + malformed input."""

import os

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


def test_device_decode_malformed_giant_factor_is_prompt():
    """A corrupted stream decoding a huge factor length must fail fast: the
    copy loop's trip count is clamped (unclamped, a garbage factor_len of
    ~2^30 spun the whole vmapped batch — the round-2 'empty lane crashes
    the TPU at big caps' bug)."""
    data = make_corpus("repetitive", 1000, seed=3)
    seg = bytearray(oc.encode_block(data))
    assert seg[3] == fmt.STREAM_TYPE_SALZ
    # Corrupt the first bitstream word (bytes 4..12): all-zero bits turn the
    # first token's GR3 length into a multi-word unary -> enormous length.
    for i in range(4, 12):
        seg[i] = 0
    _, status = _decode(bytes(seg))
    assert status == 1


def test_batch_decode_with_empty_lanes():
    """Zero-length lanes in a batched decode are safe (status path), and the
    real lanes decode exactly; round 2 replayed segments to avoid this."""
    from salz_tpu.ops.decoder import BatchBlockDecoder

    blocks = [
        make_corpus("text", 5000, seed=1),
        make_corpus("runs", 3000, seed=2),
        make_corpus("zeros", 800, seed=3),
    ]
    segs = [oc.encode_block(b) for b in blocks]
    dec = BatchBlockDecoder(1 << 15, batch=8)  # 3 real + 5 empty lanes
    got = dec.decode_many(segs)
    assert got == blocks


def test_device_decode_64k_cap_real_text():
    """Pin the two-phase decoder at a 64 KiB cap (the old suite stopped at
    1 KiB, which is why the speculative-copy blowup at big caps was only
    seen on hardware). Real text exercises mixed literal/factor tokens and
    multi-level copy chains through the pointer-doubling phase."""
    import jax.numpy as jnp

    cap = 1 << 16
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "corpora",
        "text.bin",
    )
    if os.path.exists(path):
        raw = open(path, "rb").read(cap)
    else:  # tracked corpora absent: deterministic text-like fallback
        raw = (b"the quick brown fox jumps over the lazy dog. " * 2048)
    data = (raw * 3)[:cap]
    seg = oc.encode_block(data)
    sc = fmt.encoded_len_max(cap)
    buf = np.zeros(sc, np.uint8)
    buf[: len(seg)] = np.frombuffer(seg, np.uint8)
    out, out_len, status = decode_block_device(
        jnp.asarray(buf), jnp.int32(len(seg)), seg_cap=sc, out_cap=cap
    )
    assert int(status) == 0
    assert bytes(np.asarray(out)[: int(out_len)]) == data


def test_device_decode_deep_overlap_chain():
    """A self-overlapping run (offs=1) the length of the block: the copy
    chain is as deep as the output, so pointer doubling must take its full
    log2(cap) rounds rather than the typical early exit."""
    import jax.numpy as jnp

    cap = 4096
    data = b"\xab" * cap
    seg = oc.encode_block(data)
    sc = fmt.encoded_len_max(cap)
    buf = np.zeros(sc, np.uint8)
    buf[: len(seg)] = np.frombuffer(seg, np.uint8)
    out, out_len, status = decode_block_device(
        jnp.asarray(buf), jnp.int32(len(seg)), seg_cap=sc, out_cap=cap
    )
    assert int(status) == 0
    assert bytes(np.asarray(out)[: int(out_len)]) == data
