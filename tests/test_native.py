"""Cross-validation of the native C++ oracle against the Python oracle.

Byte-for-byte stream equality on every corpus kind plus stage-level equality
for the suffix array and PSV/NSV construction.
"""

import ctypes

import numpy as np
import pytest

from salz_tpu import format as fmt
from salz_tpu import native
from salz_tpu.oracle import pycodec as oc
from conftest import CORPUS_KINDS, make_corpus

I32P = ctypes.POINTER(ctypes.c_int32)


@pytest.mark.parametrize("kind", CORPUS_KINDS)
@pytest.mark.parametrize("n", [8, 9, 64, 1000, 4096, 65536])
def test_native_stream_equals_python(kind, n):
    data = make_corpus(kind, n, seed=n + 11)
    assert native.encode_block(data) == oc.encode_block(data)


@pytest.mark.parametrize("kind", CORPUS_KINDS)
@pytest.mark.parametrize("n", [10, 1000, 65536])
def test_native_roundtrip(kind, n):
    data = make_corpus(kind, n, seed=n + 13)
    seg = native.encode_block(data)
    assert native.decode_block(seg, n) == data
    # Cross-decoding: python decodes native stream and vice versa.
    assert oc.decode_block(seg, dst_cap=n) == data
    assert native.decode_block(oc.encode_block(data), n) == data


@pytest.mark.parametrize("kind", CORPUS_KINDS)
@pytest.mark.parametrize("n", [1, 2, 3, 100, 5000])
def test_native_suffix_array_stage(kind, n):
    data = make_corpus(kind, n, seed=n + 17)
    text = np.frombuffer(data, dtype=np.uint8)
    lib = native.load()
    sa_c = np.zeros(n, dtype=np.int32)
    lib.salz_ref_suffix_array(bytes(data), n, sa_c.ctypes.data_as(I32P))
    assert np.array_equal(sa_c, oc.suffix_array(text))


@pytest.mark.parametrize("kind", ["text", "runs", "random"])
@pytest.mark.parametrize("n", [1, 50, 5000])
def test_native_psv_nsv_stage(kind, n):
    data = make_corpus(kind, n, seed=n + 19)
    text = np.frombuffer(data, dtype=np.uint8)
    sa = oc.suffix_array(text)
    lib = native.load()
    psv_c = np.zeros(n, dtype=np.int32)
    nsv_c = np.zeros(n, dtype=np.int32)
    lib.salz_ref_psv_nsv(
        np.ascontiguousarray(sa).ctypes.data_as(I32P), n,
        psv_c.ctypes.data_as(I32P), nsv_c.ctypes.data_as(I32P),
    )
    psv_p, nsv_p = oc.psv_nsv(sa)
    assert np.array_equal(psv_c, psv_p)
    assert np.array_equal(nsv_c, nsv_p)


def test_native_fuzz_streams_match():
    rng = np.random.default_rng(42)
    for _ in range(60):
        n = int(rng.integers(8, 3000))
        kind = CORPUS_KINDS[int(rng.integers(len(CORPUS_KINDS)))]
        data = make_corpus(kind, n, seed=int(rng.integers(1 << 30)))
        assert native.encode_block(data) == oc.encode_block(data), (kind, n)


def test_native_capacity_abort_parity():
    data = make_corpus("random", 4096, seed=2)
    with pytest.raises(ValueError):
        native.encode_block(data, dst_cap=fmt.encoded_len_max(4096))
    seg = native.encode_block(data)  # generous cap -> PLAIN
    assert seg == oc.encode_block(data)


def test_native_short_block_fails():
    with pytest.raises(ValueError):
        native.encode_block(b"abc")


def test_native_decode_rejects_garbage():
    with pytest.raises(ValueError):
        native.decode_block(b"", 10)
    with pytest.raises(ValueError):
        native.decode_block(bytes([0, 0, 0, 0xFF]), 10)
    with pytest.raises(ValueError):
        native.decode_block(bytes([10, 0, 0, 0]), 10)
