"""ctypes bindings for the native C++ scalar oracle (libsalzref.so).

The library is built on demand with `make` (g++); no pybind11 is required.
Public API mirrors the Python oracle: encode_block / decode_block, with the
same reference-parity capacity semantics (FORMAT.md §1.2 quirk note).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

from salz_tpu import format as fmt

_DIR = pathlib.Path(__file__).resolve().parent
_SO = _DIR / "libsalzref.so"
_SRC = _DIR / "salzref.cpp"

_lock = threading.Lock()
_lib = None


class NativeBuildError(RuntimeError):
    pass


def _build() -> None:
    try:
        subprocess.run(
            ["make", "-C", str(_DIR), "-s"],
            check=True,
            capture_output=True,
            text=True,
        )
    except subprocess.CalledProcessError as e:  # pragma: no cover
        raise NativeBuildError(f"building libsalzref.so failed:\n{e.stderr}") from e


def load() -> ctypes.CDLL:
    """Load (building if needed) the native oracle library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
        lib.salz_ref_encode.restype = ctypes.c_int64
        lib.salz_ref_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        lib.salz_ref_decode.restype = ctypes.c_int64
        lib.salz_ref_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        _lib = lib
        return lib


def encode_block(block: bytes, dst_cap: int | None = None) -> bytes:
    """Encode one plain block; raises ValueError on failure (reference parity)."""
    lib = load()
    if dst_cap is None:
        dst_cap = fmt.encoded_len_max(len(block)) + 16
    buf = (ctypes.c_uint8 * max(dst_cap, 4 + len(block)))()
    res = lib.salz_ref_encode(bytes(block), len(block), buf, dst_cap)
    if res < 0:
        raise ValueError(f"native encode failed for block of {len(block)} bytes")
    return ctypes.string_at(buf, res)


def decode_block(segment: bytes, dst_cap: int) -> bytes:
    """Decode one segment into at most dst_cap plain bytes."""
    lib = load()
    buf = (ctypes.c_uint8 * max(dst_cap, 1))()
    res = lib.salz_ref_decode(bytes(segment), len(segment), buf, dst_cap)
    if res < 0:
        raise ValueError("native decode failed")
    return ctypes.string_at(buf, res)
