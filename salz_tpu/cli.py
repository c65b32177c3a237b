"""salz / unsalz command line interface — reference-parity UX.

Mirrors /root/reference/programs/salzcli.c flag for flag (FORMAT.md §3):
same options, suffix policing, output naming, delete-input-on-success /
delete-output-on-failure behavior, log lines, and exit codes. Adds one
extension flag, --engine, to select the codec backend (jax | native | python);
all backends produce byte-identical files.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from salz_tpu import format as fmt
from salz_tpu import container

OK = 0
ERROR = 255  # C main returning -1 -> shell sees 255

LOG_NONE, LOG_CRITICAL, LOG_ERROR, LOG_INFO = range(4)
_log_level = LOG_INFO


def _log(lvl: int, msg: str) -> None:
    if lvl <= _log_level:
        print(msg, file=sys.stderr)


def _build_parser(execname: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=execname, add_help=False)
    p.add_argument("-c", "--stdout", action="store_true")
    p.add_argument("-d", "--decompress", action="store_true")
    p.add_argument("-f", "--force", action="store_true")
    p.add_argument("-h", "--help", action="store_true")
    p.add_argument("-k", "--keep", action="store_true")
    p.add_argument("-l", "--list", action="store_true")
    p.add_argument("-q", "--quiet", action="count", default=0)
    for lvl in range(10):
        p.add_argument(f"-{lvl}", dest="level", action="store_const", const=lvl)
    p.add_argument("--fast", dest="level", action="store_const", const=1)
    p.add_argument("--best", dest="level", action="store_const", const=9)
    p.add_argument("--engine", choices=["jax", "native", "python"],
                   default=None)
    p.add_argument("--decode-engine", choices=["jax", "native", "python"],
                   default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("paths", nargs="*")
    return p


#: terminal flags handled in ARGV ORDER, like the reference's getopt loop
#: (salzcli.c:392-469): the first one encountered wins.
_TERMINAL = {"c": "stdout", "h": "help", "l": "list"}
_TERMINAL_LONG = {"--stdout": "stdout", "--help": "help", "--list": "list"}


def _first_terminal_flag(argv: list[str]) -> str | None:
    """Scan argv left to right like getopt: long options whole, short option
    clusters character by character (`-cl` hits c first)."""
    for tok in argv:
        if tok == "--" or not tok.startswith("-") or tok == "-":
            continue
        if tok.startswith("--"):
            act = _TERMINAL_LONG.get(tok.split("=", 1)[0])
            if act:
                return act
            continue
        for ch in tok[1:]:
            if ch in _TERMINAL:
                return _TERMINAL[ch]
    return None


_HELP = """\
salz, a Suffix Array-based Lempel-Ziv data compressor

  usage: {execname} [options] input_file ...

  -c --stdout        write to standard output, keep input file
  -d --decompress    force decompression mode
  -f --force         force overwrite of output file
  -h --help          print this message
  -k --keep          keep input file
  -l --list          print information about salz-compressed file
  -q --quiet         suppress output
                     (specify twice to all but non-critical errors)
  -0 ... -9          compression level [default: 5]
                     (note that memory usage grows exponentially)
  --fast             alias of "-1"
  --best             alias of "-9"
  --engine ENGINE    codec backend: jax (TPU), native (C++), python
  --decode-engine E  decode backend: native (default), jax (device), python
  --batch N          blocks per device step (jax engine)
  --resume           restart an interrupted compression at the last
                     complete segment

  Default action is to compress.
  If invoked as "unsalz", default action is to decompress.
                "salzcat", default action is to decompress to stdout.

  If no input file is given, or - is provided instead, salz compresses
  or decompresses from standard input to standard output.
"""


def _fill_outpath(path: str, decompress: bool) -> str:
    if decompress:
        # Reference strips the last len(".salz") characters unconditionally
        # (salzcli.c:80-83).
        return path[: -len(fmt.SALZ_SUFFIX)]
    return path + fmt.SALZ_SUFFIX


def _process_path(path: str, *, decompress: bool, keep: bool, force: bool,
                  cfg, resume: bool = False) -> int:
    has_suffix = fmt.SALZ_SUFFIX in path  # substring test (salzcli.c:286)
    if has_suffix and not decompress:
        _log(LOG_ERROR, f'"{path}" path already has ".salz" suffix')
        return ERROR
    if not has_suffix and decompress:
        _log(LOG_ERROR, f'"{path}" path has unknown suffix')
        return ERROR

    try:
        st = os.stat(path)
    except OSError as e:
        _log(LOG_ERROR, f'Couldn\'t stat "{path}" path (err: {e.errno})')
        return ERROR
    if not os.path.isfile(path):
        _log(LOG_ERROR, f'"{path}" path is not a regular file')
        return ERROR
    insize = st.st_size

    outpath = _fill_outpath(path, decompress)
    if resume and not decompress:
        # Framework extension: restart an interrupted compression at the
        # last complete segment (the container checkpoint granule).
        t0 = time.monotonic()
        try:
            codec = container.get_codec(cfg)
            done = container.resume_compress_file(
                path, outpath, cfg.block_size, codec
            )
        except (ValueError, OSError):
            _log(LOG_ERROR, "Operation failed")
            return ERROR
        t1 = time.monotonic()
        if not keep:
            os.unlink(path)
        outsize = os.stat(outpath).st_size
        _log(LOG_INFO,
             f"{path}: compressed {insize} bytes to {outsize} bytes "
             f"(resumed at segment {done}) in {t1 - t0:.3f} seconds")
        return OK
    if not force and os.path.exists(outpath):
        _log(LOG_ERROR, f'"{outpath}" path already exists')
        return ERROR

    t0 = time.monotonic()
    ok = True
    try:
        with open(path, "rb") as inp, open(outpath, "wb") as out:
            if decompress:
                # Decode path per config: native scalar by default (token
                # decode is serial per block); "jax" = device decoder. One
                # config flows straight to get_codec — the decompressor
                # reads the block size from the container header, so the
                # config's level is irrelevant here.
                from salz_tpu.config import SalzConfig

                eng = cfg.decode_engine if cfg.engine == "jax" else cfg.engine
                dcfg = SalzConfig(
                    engine=eng, decode_engine=eng, batch=cfg.batch
                )
                # block_size=64: a valid dummy for the unused encode side
                # (1 crashed the jax engine's encoder validation); the
                # decode side reads the real size from the container header.
                codec = container.get_codec(dcfg, 64)
                container.decompress_stream(inp, out, codec)
            else:
                codec = container.get_codec(cfg)
                container.compress_stream(inp, out, cfg.block_size, codec)
    except (ValueError, OSError) as e:
        _log(LOG_ERROR, f"Couldn't {'decode' if decompress else 'encode'} "
                        f"segment" if isinstance(e, ValueError) else str(e))
        ok = False
    t1 = time.monotonic()

    if not ok:
        _log(LOG_ERROR, "Operation failed")
        try:
            os.unlink(outpath)
        except OSError:
            pass
        return ERROR
    if not keep:
        os.unlink(path)

    outsize = os.stat(outpath).st_size
    if decompress:
        _log(LOG_INFO,
             f"{path}: decompressed {insize} bytes in {t1 - t0:.3f} seconds")
    else:
        _log(LOG_INFO,
             f"{path}: compressed {insize} bytes to {outsize} bytes "
             f"(ratio: {insize / outsize:.3f}) in {t1 - t0:.3f} seconds")
    return OK


def main(argv: list[str] | None = None, execname: str | None = None) -> int:
    global _log_level
    argv = sys.argv[1:] if argv is None else argv
    execname = execname or os.path.basename(sys.argv[0] or "salz")

    # Terminal flags act in argv order, like the reference's getopt loop:
    # the FIRST of -c/-h/-l encountered decides (salzcli.c:392-469).
    term = _first_terminal_flag(argv)
    if term == "stdout":
        print("writing to stdout not supported", file=sys.stderr)
        return ERROR
    if term == "help":
        print(_HELP.format(execname=execname), end="")
        return OK
    if term == "list":
        print("listing info not supported", file=sys.stderr)
        return ERROR

    parser = _build_parser(execname)
    try:
        args = parser.parse_args(argv)
    except SystemExit:
        print(f'See "{execname} --help" for more information.', file=sys.stderr)
        return ERROR

    _log_level = max(LOG_NONE, LOG_INFO - args.quiet)

    decompress = args.decompress
    if execname.startswith("unsalz"):
        decompress = True
    if execname.startswith("salzcat"):
        print("writing to stdout not supported", file=sys.stderr)
        return ERROR

    if not args.paths or args.paths[0].startswith("-"):
        print("compressing from stdin not supported", file=sys.stderr)
        return ERROR

    from salz_tpu.config import SalzConfig

    cfg = SalzConfig(
        level=args.level if args.level is not None else fmt.DEFAULT_LEVEL,
        **{
            k: v
            for k, v in (
                ("engine", args.engine),
                ("decode_engine", args.decode_engine),
                ("batch", args.batch),
            )
            if v is not None
        },
    ).validate()

    ret = OK
    for path in args.paths:
        rc = _process_path(
            path, decompress=decompress, keep=args.keep, force=args.force,
            cfg=cfg, resume=args.resume,
        )
        ret = max(ret, rc)
    return ret


def unsalz_main() -> int:
    return main(execname="unsalz")


if __name__ == "__main__":
    sys.exit(main())
