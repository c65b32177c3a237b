"""SalzConfig threading, per-block encode status, batched device decode,
and reference getopt-order terminal-flag parity."""

import io
import os

import numpy as np
import pytest

from salz_tpu import container
from salz_tpu import format as fmt
from salz_tpu.config import SalzConfig
from salz_tpu.oracle import pycodec as oc
from conftest import make_corpus


def test_config_validate():
    SalzConfig().validate()
    with pytest.raises(ValueError):
        SalzConfig(level=10).validate()
    with pytest.raises(ValueError):
        SalzConfig(engine="cuda").validate()
    with pytest.raises(ValueError):
        SalzConfig(decode_engine="x").validate()
    assert SalzConfig(level=0).block_size == 1 << 15
    assert SalzConfig(level=9).block_size == 1 << 24


def test_get_codec_accepts_config():
    cfg = SalzConfig(level=0, engine="python")
    codec = container.get_codec(cfg)
    data = make_corpus("text", 2000, seed=1)
    seg = codec.encode_block(data, fmt.encoded_len_max(cfg.block_size))
    assert codec.decode_block(seg, cfg.block_size) == data


def test_encode_many_status_per_block():
    """A poisoned block fails ALONE; siblings still encode (VERDICT item 6)."""
    from salz_tpu.ops.encoder import BatchBlockEncoder

    cap = 1024
    enc = BatchBlockEncoder(cap, batch=4)
    good = make_corpus("text", 600, seed=3)
    blocks = [good, b"x" * 4, good, b"y" * (cap + 1), good]
    segs, status = enc.encode_many_status(blocks)
    assert status == [0, enc.ERR_TOO_SHORT, 0, enc.ERR_TOO_LONG, 0]
    for i in (0, 2, 4):
        assert segs[i] == oc.encode_block(good)
    assert segs[1] is None and segs[3] is None
    # wholesale API still raises on the first bad block
    with pytest.raises(ValueError):
        enc.encode_many(blocks)


def test_batched_device_decoder_roundtrip():
    from salz_tpu.ops.decoder import BatchBlockDecoder

    block_size = 1024
    blocks = [
        make_corpus(k, n, seed=n)
        for k, n in (("text", 1024), ("runs", 700), ("random", 512), ("zeros", 64))
    ]
    segs = [oc.encode_block(b) for b in blocks]
    dec = BatchBlockDecoder(block_size, batch=3)
    assert dec.decode_many(segs) == blocks
    with pytest.raises(oc.SalzDecodeError):
        dec.decode_many([segs[0][: len(segs[0]) // 2]])


def test_jax_decode_engine_stream_roundtrip(tmp_path):
    """--decode-engine jax path: container decode through the device decoder."""
    cfg = SalzConfig(level=0, engine="jax", decode_engine="jax", batch=2)
    codec = container.get_codec(cfg)
    data = make_corpus("text", 70000, seed=9)
    comp = io.BytesIO()
    container.compress_stream(io.BytesIO(data), comp, cfg.block_size, codec)
    comp.seek(0)
    out = io.BytesIO()
    container.decompress_stream(comp, out, codec)
    assert out.getvalue() == data


@pytest.mark.parametrize(
    "argv,expect_rc,expect_text",
    [
        (["-l", "-h"], 255, "listing info not supported"),
        (["-h", "-l"], 0, "usage:"),
        (["-cl"], 255, "writing to stdout not supported"),
        (["-q", "--list", "x"], 255, "listing info not supported"),
    ],
)
def test_cli_terminal_flag_argv_order(argv, expect_rc, expect_text, capsys):
    """First terminal flag in argv wins, like the reference getopt loop."""
    from salz_tpu import cli

    rc = cli.main(argv, execname="salz")
    captured = capsys.readouterr()
    assert rc == expect_rc
    assert expect_text in captured.out + captured.err
