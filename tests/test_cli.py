"""CLI behavior parity tests (FORMAT.md §3, salzcli.c).

Uses the native engine (no JAX import) for speed; engine equivalence itself is
covered by test_encoder/test_native byte-equality.
"""

import os

import pytest

from salz_tpu import cli
from salz_tpu import format as fmt
from conftest import make_corpus

ENGINE = ["--engine", "native"]


@pytest.fixture(autouse=True)
def _reset_log_level():
    old = cli._log_level
    yield
    cli._log_level = old


def _write(tmp_path, name, data: bytes):
    p = tmp_path / name
    p.write_bytes(data)
    return p


def test_roundtrip_deletes_input_and_output(tmp_path):
    data = make_corpus("text", 50000, seed=1)
    src = _write(tmp_path, "f.bin", data)
    assert cli.main(ENGINE + ["-2", str(src)]) == 0
    assert not src.exists()  # input deleted (no -k)
    salz = tmp_path / "f.bin.salz"
    assert salz.exists()
    assert cli.main(ENGINE + ["-d", str(salz)]) == 0
    assert not salz.exists()
    assert (tmp_path / "f.bin").read_bytes() == data


def test_keep_flag(tmp_path):
    data = make_corpus("runs", 1000, seed=2)
    src = _write(tmp_path, "f.bin", data)
    assert cli.main(ENGINE + ["-k", str(src)]) == 0
    assert src.exists()


def test_compress_refuses_salz_suffix_anywhere(tmp_path):
    src = _write(tmp_path, "x.salz.bak", b"z" * 100)  # substring test
    assert cli.main(ENGINE + [str(src)]) == cli.ERROR


def test_decompress_requires_suffix(tmp_path):
    src = _write(tmp_path, "plain.bin", b"z" * 100)
    assert cli.main(ENGINE + ["-d", str(src)]) == cli.ERROR


def test_decompress_strips_last_five_chars(tmp_path):
    data = make_corpus("text", 500, seed=3)
    src = _write(tmp_path, "f.bin", data)
    assert cli.main(ENGINE + ["-k", str(src)]) == 0
    assert cli.main(ENGINE + ["-d", "-f", str(tmp_path / "f.bin.salz")]) == 0
    assert (tmp_path / "f.bin").read_bytes() == data


def test_output_exists_requires_force(tmp_path):
    data = make_corpus("text", 500, seed=4)
    src = _write(tmp_path, "f.bin", data)
    _write(tmp_path, "f.bin.salz", b"old")
    assert cli.main(ENGINE + ["-k", str(src)]) == cli.ERROR
    assert cli.main(ENGINE + ["-k", "-f", str(src)]) == 0


def test_failure_deletes_partial_output_keeps_input(tmp_path):
    src = _write(tmp_path, "tiny.bin", b"abc")  # < 8 bytes: encode error
    assert cli.main(ENGINE + [str(src)]) == cli.ERROR
    assert src.exists()
    assert not (tmp_path / "tiny.bin.salz").exists()


def test_empty_file_fails(tmp_path):
    src = _write(tmp_path, "empty.bin", b"")
    assert cli.main(ENGINE + [str(src)]) == cli.ERROR


def test_exact_block_multiple_fails(tmp_path):
    # Reference quirk (FORMAT.md §4): the trailing zero-length read is still
    # encoded and fails.
    data = make_corpus("text", fmt.block_size_for_level(0), seed=5)
    src = _write(tmp_path, "f.bin", data)
    assert cli.main(ENGINE + ["-0", str(src)]) == cli.ERROR
    assert src.exists()
    assert not (tmp_path / "f.bin.salz").exists()


def test_levels_change_block_size(tmp_path):
    data = make_corpus("text", 70000, seed=6)
    src = _write(tmp_path, "f.bin", data)
    assert cli.main(ENGINE + ["-k", "-0", str(src)]) == 0
    import struct
    with open(tmp_path / "f.bin.salz", "rb") as f:
        magic, block = struct.unpack("<II", f.read(8))
    assert magic == fmt.SALZ_MAGIC
    assert block == 32768


def test_unsalz_execname_decompresses(tmp_path):
    data = make_corpus("text", 500, seed=7)
    src = _write(tmp_path, "f.bin", data)
    assert cli.main(ENGINE + [str(src)]) == 0
    assert cli.main(ENGINE + [str(tmp_path / "f.bin.salz")], execname="unsalz") == 0
    assert (tmp_path / "f.bin").read_bytes() == data


def test_salzcat_unsupported():
    assert cli.main([], execname="salzcat") == cli.ERROR


def test_unimplemented_flags():
    assert cli.main(["-c", "x"]) == cli.ERROR
    assert cli.main(["-l", "x"]) == cli.ERROR


def test_no_files_errors():
    assert cli.main([]) == cli.ERROR


def test_help(capsys):
    assert cli.main(["-h"]) == 0
    out = capsys.readouterr().out
    assert "Suffix Array-based Lempel-Ziv" in out


def test_decompress_bad_magic(tmp_path):
    src = _write(tmp_path, "bad.salz", b"XXXXXXXXXXXX")
    assert cli.main(ENGINE + ["-d", str(src)]) == cli.ERROR
    assert src.exists()


def test_multiple_files_worst_exit_code(tmp_path):
    good = _write(tmp_path, "good.bin", make_corpus("text", 100, seed=8))
    bad = _write(tmp_path, "bad.bin", b"x")
    assert cli.main(ENGINE + [str(good), str(bad)]) == cli.ERROR
    assert (tmp_path / "good.bin.salz").exists()


def test_nonexistent_path():
    assert cli.main(ENGINE + ["/no/such/file"]) == cli.ERROR


def test_decompress_decode_engine_jax(tmp_path):
    """--decode-engine jax roundtrips through the on-device decoder (the
    CLI used to crash constructing the codec with a dummy block size)."""
    data = make_corpus("text", 4000, seed=13)
    src = _write(tmp_path, "f.bin", data)
    assert cli.main(["--engine", "native", "-0", "-k", str(src)]) == 0
    assert (
        cli.main(
            ["--engine", "jax", "--decode-engine", "jax", "-d", "-f",
             str(tmp_path / "f.bin.salz")]
        )
        == 0
    )
    assert (tmp_path / "f.bin").read_bytes() == data
