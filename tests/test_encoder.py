"""End-to-end device encoder conformance: byte equality with the oracle."""

import numpy as np
import pytest

from salz_tpu import format as fmt
from salz_tpu.oracle import pycodec as oc
from salz_tpu.ops.encoder import BlockEncoder
from conftest import CORPUS_KINDS, make_corpus

CAP = 1024


@pytest.fixture(scope="module")
def enc_chunked():
    return BlockEncoder(CAP, parse="chunked")


@pytest.fixture(scope="module")
def enc_sequential():
    return BlockEncoder(CAP, parse="sequential")


@pytest.mark.parametrize("kind", CORPUS_KINDS)
@pytest.mark.parametrize("n", [8, 9, 64, 500, 1017, 1024])
def test_device_stream_equals_oracle(enc_chunked, kind, n):
    data = make_corpus(kind, n, seed=n + 61)
    assert enc_chunked(data) == oc.encode_block(data)


@pytest.mark.parametrize("kind", ["text", "runs", "random"])
@pytest.mark.parametrize("n", [100, 1024])
def test_sequential_parse_matches_too(enc_sequential, kind, n):
    data = make_corpus(kind, n, seed=n + 67)
    assert enc_sequential(data) == oc.encode_block(data)


def test_device_fuzz(enc_chunked):
    rng = np.random.default_rng(123)
    for _ in range(25):
        n = int(rng.integers(8, CAP + 1))
        kind = CORPUS_KINDS[int(rng.integers(len(CORPUS_KINDS)))]
        data = make_corpus(kind, n, seed=int(rng.integers(1 << 30)))
        assert enc_chunked(data) == oc.encode_block(data), (kind, n)


def test_device_roundtrip_via_oracle_decoder(enc_chunked):
    data = make_corpus("repetitive", 1000, seed=5)
    seg = enc_chunked(data)
    assert oc.decode_block(seg, dst_cap=len(data)) == data


def test_device_capacity_abort(enc_chunked):
    data = make_corpus("random", CAP, seed=2)
    seg = oc.encode_block(data)
    if seg[3] == fmt.STREAM_TYPE_PLAIN:
        # Find the raw layout size; with a dst_cap below it the wrapper raises.
        with pytest.raises(ValueError):
            enc_chunked(data, dst_cap=len(data) - 100)


def test_device_rejects_short_blocks(enc_chunked):
    with pytest.raises(ValueError):
        enc_chunked(b"abc")
    with pytest.raises(ValueError):
        enc_chunked(b"x" * (CAP + 1))


@pytest.mark.parametrize("kind", ["zeros", "runs", "text"])
def test_lcp_saturation_fallback_cap4096(kind):
    """Highly repetitive data at cap 4096 overflows the adjacent-LCP
    saturation bucket (cap/32 < 1024 floor -> bucket 1024 < saturated pairs),
    exercising the full-descent fallback in candidate_lcps."""
    cap = 4096
    enc = BlockEncoder(cap, parse="chunked")
    data = make_corpus(kind, cap - 6, seed=97)
    assert enc(data) == oc.encode_block(data)


def test_batch_block_encoder_matches_oracle():
    from salz_tpu.ops.encoder import BatchBlockEncoder

    cap = 1024
    enc = BatchBlockEncoder(cap, batch=3)
    blocks = [make_corpus(k, n, seed=n) for k, n in
              [("text", 1024), ("runs", 500), ("random", 64), ("text", 999),
               ("zeros", 17)]]
    segs = enc.encode_many(blocks)
    assert segs == [oc.encode_block(b) for b in blocks]


def test_batch_block_encoder_rejects_short_blocks():
    from salz_tpu.ops.encoder import BatchBlockEncoder

    enc = BatchBlockEncoder(1024, batch=2)
    with pytest.raises(ValueError):
        enc.encode_many([b"ok-block" * 4, b"abc"])


def test_aot_store_hit_path_identical_stream(tmp_path, monkeypatch):
    """The deserialized jax.export artifact (trace-skipping hit path) must
    produce byte-identical segments to the freshly traced program."""
    import glob

    import jax.numpy as jnp

    from salz_tpu.ops.encoder import encode_blocks_device_staged
    from salz_tpu.utils import aotstore

    monkeypatch.setattr(
        aotstore, "_store_dir", lambda: tmp_path, raising=True
    )
    monkeypatch.setattr(aotstore, "_ENABLED", True, raising=True)
    cap = 4096
    data = (b"aot store roundtrip " * 512)[:cap]
    blocks = jnp.asarray(
        np.frombuffer(data * 2, np.uint8).reshape(2, cap)
    )
    lens = jnp.full((2,), cap, jnp.int32)
    out1 = encode_blocks_device_staged(blocks, lens, cap=cap)
    segs1 = [
        bytes(np.asarray(out1[0])[j][: int(np.asarray(out1[1])[j])])
        for j in range(2)
    ]
    assert glob.glob(str(tmp_path / "*.bin")), "no artifacts exported"
    # Drop the in-memory exports so the next call exercises deserialization.
    aotstore._EXPORTS.clear()
    out2 = encode_blocks_device_staged(blocks, lens, cap=cap)
    segs2 = [
        bytes(np.asarray(out2[0])[j][: int(np.asarray(out2[1])[j])])
        for j in range(2)
    ]
    assert segs1 == segs2
    ref = oc.encode_block(data)
    assert segs1[0] == ref
