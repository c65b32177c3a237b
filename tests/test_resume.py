"""Checkpoint/resume tooling: the container's length-prefixed segments are
the checkpoint granule (SURVEY.md §5); resume keeps complete segments,
truncates a torn tail, and re-encodes only the remaining blocks."""

import io
import os

import pytest

from salz_tpu import container
from salz_tpu.config import SalzConfig
from conftest import make_corpus

BS = 1 << 15


def _codec():
    return container.get_codec(SalzConfig(engine="python", level=0))


def _full_container(data: bytes) -> bytes:
    out = io.BytesIO()
    container.compress_stream(io.BytesIO(data), out, BS, _codec())
    return out.getvalue()


@pytest.fixture
def corpus():
    return make_corpus("text", 3 * BS + 1000, seed=7)


def test_resume_from_torn_segment(tmp_path, corpus):
    full = _full_container(corpus)
    inp = tmp_path / "in.bin"
    outp = tmp_path / "out.salz"
    inp.write_bytes(corpus)

    # Tear the file mid-3rd-segment (simulated crash).
    done, valid = 2, 8
    pos = 8
    for _ in range(done):
        enc_len = int.from_bytes(full[pos : pos + 4], "little")
        pos += 4 + enc_len
        valid = pos
    outp.write_bytes(full[: valid + 7])  # 7 bytes of torn tail

    resumed_at = container.resume_compress_file(
        str(inp), str(outp), BS, _codec()
    )
    assert resumed_at == done
    assert outp.read_bytes() == full

    dec = io.BytesIO()
    container.decompress_stream(io.BytesIO(outp.read_bytes()), dec, _codec())
    assert dec.getvalue() == corpus


def test_resume_fresh_file(tmp_path, corpus):
    inp = tmp_path / "in.bin"
    outp = tmp_path / "out.salz"
    inp.write_bytes(corpus)
    assert container.resume_compress_file(str(inp), str(outp), BS, _codec()) == 0
    assert outp.read_bytes() == _full_container(corpus)


def test_resume_complete_file_is_noop(tmp_path, corpus):
    full = _full_container(corpus)
    inp = tmp_path / "in.bin"
    outp = tmp_path / "out.salz"
    inp.write_bytes(corpus)
    outp.write_bytes(full)
    nseg = container.resume_compress_file(str(inp), str(outp), BS, _codec())
    assert nseg == 4  # 3 full blocks + the short tail block
    assert outp.read_bytes() == full


def test_resume_rejects_foreign_block_size(tmp_path, corpus):
    inp = tmp_path / "in.bin"
    outp = tmp_path / "out.salz"
    inp.write_bytes(corpus)
    out = io.BytesIO()
    container.compress_stream(io.BytesIO(corpus), out, BS * 2, _codec())
    outp.write_bytes(out.getvalue())
    with pytest.raises(container.ContainerError):
        container.resume_compress_file(str(inp), str(outp), BS, _codec())


def test_cli_resume_flag(tmp_path, corpus, monkeypatch):
    from salz_tpu import cli

    monkeypatch.setenv("SALZ_ENGINE", "python")
    full = _full_container(corpus)
    inp = tmp_path / "in.bin"
    outp = tmp_path / "in.bin.salz"
    inp.write_bytes(corpus)
    outp.write_bytes(full[: len(full) // 2])  # torn mid-file
    rc = cli.main(["-0", "-k", "--resume", str(inp)], execname="salz")
    assert rc == 0
    assert outp.read_bytes() == full
    assert inp.exists()  # -k kept the input


def test_resume_with_jax_batched_codec(tmp_path, corpus):
    """Resume mid-file through the batched jax engine produces the identical
    container bytes (the batch loop starts cleanly at a block boundary)."""
    cfg = SalzConfig(engine="jax", level=0, batch=2)
    codec = container.get_codec(cfg)
    full = _full_container(corpus)
    inp = tmp_path / "in.bin"
    outp = tmp_path / "out.salz"
    inp.write_bytes(corpus)
    enc_len = int.from_bytes(full[8:12], "little")
    outp.write_bytes(full[: 8 + 4 + enc_len + 3])  # one segment + torn tail
    assert container.resume_compress_file(str(inp), str(outp), BS, codec) == 1
    assert outp.read_bytes() == full
