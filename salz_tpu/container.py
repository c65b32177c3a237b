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
    #: optional per-block-status path: (blocks, dst_cap) -> (segs, status)
    encode_blocks_status: Callable[[list, int], tuple] | None = None
    #: optional batched decode path: (segments, block_size) -> blocks
    decode_blocks: Callable[[list, int], list] | None = None
    #: device-batch width of the throughput path: the stream loop holds this
    #: many blocks before flushing so the encoder sees FULL batches (a fixed
    #: 64-block flush starved level 0/1's 256/128-lane auto-batches to 64
    #: lanes — 2 MB dispatches paying full per-op overheads, measured 4x
    #: slower than the 8 MB batch on the same data)
    batch: int = 64


def _decode_fn(decode_engine: str):
    """(decode_block, decode_blocks) pair for a decode-path choice. The block
    size comes from the container header at decode time, so the device
    decoder is built lazily per block size."""
    if decode_engine == "python":
        from salz_tpu.oracle import pycodec

        return (lambda s, cap: pycodec.decode_block(s, dst_cap=cap)), None
    if decode_engine == "native":
        from salz_tpu import native

        return native.decode_block, None
    if decode_engine == "jax":
        from salz_tpu.ops.decoder import BatchBlockDecoder

        cache: dict[int, BatchBlockDecoder] = {}

        def _get(block_size: int) -> BatchBlockDecoder:
            if block_size not in cache:
                cache[block_size] = BatchBlockDecoder(block_size)
            return cache[block_size]

        return (
            lambda s, cap: _get(cap)(s),
            lambda segs, block_size: _get(block_size).decode_many(segs),
        )
    raise ValueError(f"unknown decode engine {decode_engine!r}")


def get_codec(engine, block_size: int | None = None) -> Codec:
    """Build a codec from a SalzConfig (preferred) or a legacy engine name."""
    from salz_tpu.config import SalzConfig

    if isinstance(engine, SalzConfig):
        cfg = engine.validate()
        block_size = cfg.block_size if block_size is None else block_size
    else:
        cfg = SalzConfig(engine=engine).validate()
        assert block_size is not None

    if cfg.engine == "python":
        from salz_tpu.oracle import pycodec

        return Codec(
            "python",
            lambda b, cap: pycodec.encode_block(b, dst_cap=cap),
            lambda s, cap: pycodec.decode_block(s, dst_cap=cap),
        )
    if cfg.engine == "native":
        from salz_tpu import native

        return Codec("native", native.encode_block, native.decode_block)
    if cfg.engine == "jax":
        from salz_tpu.ops.encoder import BatchBlockEncoder, BlockEncoder

        enc = BlockEncoder(block_size, parse=cfg.parse)
        benc = BatchBlockEncoder(block_size, batch=cfg.batch, parse=cfg.parse)
        # Decode path per config; default is the native scalar decoder (the
        # throughput path — token decoding is serial per block); "jax" picks
        # the on-device lax.while_loop decoder.
        dec, dec_many = _decode_fn(cfg.decode_engine)
        return Codec(
            "jax", enc, dec, benc.encode_many, benc.encode_many_status,
            dec_many, batch=benc.batch,
        )
    raise ValueError(f"unknown engine {cfg.engine!r}")


def compress_stream(
    inp: BinaryIO, out: BinaryIO, block_size: int, codec: Codec
) -> None:
    """Reference-equivalent whole-file compression loop (salzcli.c:102-185).

    Codecs with a batched throughput path get blocks in device-batch groups;
    segments are written in input order either way, so the container bytes
    are identical.
    """
    write_file_header(out, block_size)
    _compress_segments(inp, out, block_size, codec)


def _compress_segments(
    inp: BinaryIO, out: BinaryIO, block_size: int, codec: Codec
) -> None:
    """The segment loop of compress_stream (no file header) — also the
    resume path, which starts it mid-file after seeking both streams."""
    dst_cap = fmt.encoded_len_max(block_size)
    if codec.encode_blocks is None and codec.encode_blocks_status is None:
        for block in iter_blocks(inp, block_size):
            write_segment(out, codec.encode_block(block, dst_cap))
        return

    def flush(pending: list[bytes]) -> None:
        if not pending:
            return
        if codec.encode_blocks_status is not None:
            # Per-block status path: every block gets an individual verdict
            # (a poisoned block does not prevent its siblings from encoding);
            # the FILE still fails at the first bad block, matching the
            # reference's stop-at-first-error loop (salzcli.c:163-179).
            segs, status = codec.encode_blocks_status(pending, dst_cap)
            for seg, st in zip(segs, status):
                if st != 0:
                    raise ValueError(f"block failed to encode (status {st})")
                write_segment(out, seg)
        else:
            for seg in codec.encode_blocks(pending, dst_cap):
                write_segment(out, seg)

    pending: list[bytes] = []
    for block in iter_blocks(inp, block_size):
        # Blocks the batch path cannot legally take (the reference-parity
        # short/empty trailing block) go through the scalar path so the
        # failure surfaces identically.
        if len(block) < 8:
            flush(pending)
            pending = []
            write_segment(out, codec.encode_block(block, dst_cap))
            continue
        pending.append(block)
        # Hold FOUR device batches before flushing (not one): the batch
        # encoder issues all of a flush's groups asynchronously and overlaps
        # their uploads/compute/downloads (encoder._encode_class), so a
        # multi-batch flush pipelines where a per-batch flush serialized
        # ~0.45 s of axon-tunnel transfer against each ~1 s of compute.
        if len(pending) >= 4 * max(codec.batch, 1):
            flush(pending)
            pending = []
    flush(pending)


def scan_resume_point(outpath: str, block_size: int) -> tuple[int, int]:
    """Scan a partial container: (complete_segments, valid_byte_length).

    The container's independent length-prefixed segments are the natural
    checkpoint granule (SURVEY.md §5: the framework's resume unit; the
    reference has none). A crash mid-write leaves a truncated final
    segment; everything before it is valid and keeps its bytes.

    Raises ContainerError if the file doesn't start with a SALZ header for
    this block size (resuming into a foreign file would corrupt it).
    """
    max_len = fmt.encoded_len_max(block_size)
    with open(outpath, "rb") as f:
        bs = read_file_header(f)
        if bs != block_size:
            raise ContainerError(
                f"resume block size mismatch (file {bs}, config {block_size})"
            )
        nseg = 0
        valid = 8
        while True:
            lenb = f.read(4)
            if len(lenb) < 4:
                return nseg, valid
            (enc_len,) = struct.unpack("<I", lenb)
            if enc_len > max_len:
                return nseg, valid  # corrupt tail: drop it
            seg = f.read(enc_len)
            if len(seg) < enc_len:
                return nseg, valid
            nseg += 1
            valid += 4 + enc_len


def resume_compress_file(
    inpath: str, outpath: str, block_size: int, codec: Codec
) -> int:
    """Resume an interrupted compression: keep the complete segments already
    in `outpath`, truncate any partial tail, and encode the remaining blocks
    of `inpath`. Returns the number of segments that were already complete
    (the resume point). A fresh/absent output file starts from block 0."""
    import os

    if os.path.exists(outpath) and os.path.getsize(outpath) >= 8:
        done, valid = scan_resume_point(outpath, block_size)
    else:
        done, valid = 0, 0
    size = os.path.getsize(inpath)
    if size % block_size != 0 and done == size // block_size + 1:
        # Already complete (a short final block exists and was encoded).
        # Exact-multiple sizes never complete: their trailing empty block
        # fails by reference parity (salzcli.c:148-160), so fall through.
        with open(outpath, "r+b") as out:
            out.seek(valid)
            out.truncate()
        return done
    with open(inpath, "rb") as inp, open(
        outpath, "r+b" if valid else "wb"
    ) as out:
        if valid:
            out.seek(valid)
            out.truncate()
            inp.seek(done * block_size)
        else:
            write_file_header(out, block_size)
        _compress_segments(inp, out, block_size, codec)
        return done


def decompress_stream(inp: BinaryIO, out: BinaryIO, codec: Codec) -> int:
    """Reference-equivalent decompression loop (salzcli.c:187-270)."""
    block_size = read_file_header(inp)
    if codec.decode_blocks is not None:
        pending: list[bytes] = []
        for seg in read_segments(inp, block_size):
            pending.append(seg)
            if len(pending) >= 64:
                for blk in codec.decode_blocks(pending, block_size):
                    out.write(blk)
                pending = []
        for blk in codec.decode_blocks(pending, block_size):
            out.write(blk)
        return block_size
    for seg in read_segments(inp, block_size):
        out.write(codec.decode_block(seg, block_size))
    return block_size
