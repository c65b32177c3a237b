"""SALZ container file format and block-level codec engines.

Container layout (FORMAT.md §2, salzcli.c:102-270): 8-byte file header
(magic u32 LE + block size u32 LE) followed by length-prefixed segments.

Engines expose a common (encode_block, decode_block) pair:
  * "jax"    — the TPU/JAX device pipeline (salz_tpu.ops.encoder)
  * "native" — the C++ scalar oracle (salz_tpu.native)
  * "python" — the pure-Python oracle (salz_tpu.oracle.pycodec)
All three produce byte-identical streams.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import BinaryIO, Callable, Iterator

from salz_tpu import format as fmt


class ContainerError(ValueError):
    pass


def write_file_header(out: BinaryIO, block_size: int) -> None:
    out.write(struct.pack("<II", fmt.SALZ_MAGIC, block_size))


def read_file_header(inp: BinaryIO) -> int:
    hdr = inp.read(8)
    if len(hdr) != 8:
        raise ContainerError("couldn't read SALZ header")
    magic, block_size = struct.unpack("<II", hdr)
    if magic != fmt.SALZ_MAGIC:
        raise ContainerError("not a SALZ header, unexpected magic number")
    return block_size


def write_segment(out: BinaryIO, segment: bytes) -> None:
    out.write(struct.pack("<I", len(segment)))
    out.write(segment)


def read_segments(inp: BinaryIO, block_size: int) -> Iterator[bytes]:
    max_len = fmt.encoded_len_max(block_size)
    while True:
        lenb = inp.read(4)
        if len(lenb) == 0:
            return
        if len(lenb) != 4:
            raise ContainerError("couldn't read encoded segment length")
        (enc_len,) = struct.unpack("<I", lenb)
        if enc_len > max_len:
            raise ContainerError("encoded segment too large")
        seg = inp.read(enc_len)
        if len(seg) != enc_len:
            raise ContainerError("couldn't read encoded segment")
        yield seg


def iter_blocks(inp: BinaryIO, block_size: int) -> Iterator[bytes]:
    """Yield input blocks exactly like the reference read loop: every read is
    surfaced, including a trailing zero-length one when the file size is an
    exact multiple of the block size (salzcli.c:143-160 — that block then
    fails to encode; reference parity)."""
    while True:
        block = inp.read(block_size)
        yield block
        if len(block) != block_size:
            return


@dataclass
class Codec:
    name: str
    encode_block: Callable[[bytes, int], bytes]  # (block, dst_cap) -> segment
    decode_block: Callable[[bytes, int], bytes]  # (segment, dst_cap) -> block
    #: optional throughput path: (blocks, dst_cap) -> segments, in order
    encode_blocks: Callable[[list, int], list] | None = None


def get_codec(engine: str, block_size: int) -> Codec:
    if engine == "python":
        from salz_tpu.oracle import pycodec

        return Codec(
            "python",
            lambda b, cap: pycodec.encode_block(b, dst_cap=cap),
            lambda s, cap: pycodec.decode_block(s, dst_cap=cap),
        )
    if engine == "native":
        from salz_tpu import native

        return Codec("native", native.encode_block, native.decode_block)
    if engine == "jax":
        import os

        from salz_tpu import native
        from salz_tpu.ops.encoder import BatchBlockEncoder, BlockEncoder

        enc = BlockEncoder(block_size)
        batch = int(os.environ.get("SALZ_BATCH", "8"))
        benc = BatchBlockEncoder(block_size, batch=batch)
        # Decode stays on the host scalar path (conformance/latency path);
        # the device decoder is exercised separately (salz_tpu.ops.decoder).
        return Codec("jax", enc, native.decode_block, benc.encode_many)
    raise ValueError(f"unknown engine {engine!r}")


def compress_stream(
    inp: BinaryIO, out: BinaryIO, block_size: int, codec: Codec
) -> None:
    """Reference-equivalent whole-file compression loop (salzcli.c:102-185).

    Codecs with a batched throughput path get blocks in device-batch groups;
    segments are written in input order either way, so the container bytes
    are identical.
    """
    dst_cap = fmt.encoded_len_max(block_size)
    write_file_header(out, block_size)
    if codec.encode_blocks is None:
        for block in iter_blocks(inp, block_size):
            write_segment(out, codec.encode_block(block, dst_cap))
        return
    pending: list[bytes] = []
    for block in iter_blocks(inp, block_size):
        # Blocks the batch path cannot legally take (the reference-parity
        # short/empty trailing block) go through the scalar path so the
        # failure surfaces identically.
        if len(block) < 8:
            for seg in codec.encode_blocks(pending, dst_cap):
                write_segment(out, seg)
            pending = []
            write_segment(out, codec.encode_block(block, dst_cap))
            continue
        pending.append(block)
        if len(pending) >= 64:
            for seg in codec.encode_blocks(pending, dst_cap):
                write_segment(out, seg)
            pending = []
    for seg in codec.encode_blocks(pending, dst_cap):
        write_segment(out, seg)


def decompress_stream(inp: BinaryIO, out: BinaryIO, codec: Codec) -> int:
    """Reference-equivalent decompression loop (salzcli.c:187-270)."""
    block_size = read_file_header(inp)
    for seg in read_segments(inp, block_size):
        out.write(codec.decode_block(seg, block_size))
    return block_size
