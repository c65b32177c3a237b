#!/usr/bin/env python3
"""Assemble REAL benchmark corpora from files shipped in this image.

The reference protocol names Canterbury / Silesia / enwik8
(BASELINE.md), which cannot be fetched offline. This builds the same
*regimes* from genuine on-disk data (no synthetic generation):

  text.bin    — English prose: /usr/share/common-licenses + doc copyright
                files (natural-language long matches, LCP saturation).
  source.bin  — Python source from site-packages (high redundancy,
                structured indentation; the survivor-heavy LCP regime).
  binary.bin  — ELF shared objects (large offsets -> long vnibbles,
                mixed compressibility, PLAIN-fallback boundaries).
  mixed.bin   — tar of a package directory: interleaved text/binary.

Deterministic: fixed directories, sorted file order, fixed size caps.
Writes to corpora/ (gitignored — contents derive from the image).

Usage: python scripts/make_corpora.py [--outdir corpora] [--mb 8]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import io
import os
import tarfile


def _cat_files(paths: list[str], limit: int) -> bytes:
    out = io.BytesIO()
    for p in sorted(paths):
        if out.tell() >= limit:
            break
        try:
            if p.endswith(".gz"):
                with gzip.open(p, "rb") as f:
                    out.write(f.read())
            else:
                with open(p, "rb") as f:
                    out.write(f.read())
        except OSError:
            continue
    return out.getvalue()[:limit]


def build_text(limit: int) -> bytes:
    paths = glob.glob("/usr/share/common-licenses/*")
    paths += glob.glob("/usr/share/doc/*/copyright")
    paths += glob.glob("/usr/share/doc/*/changelog.Debian.gz")
    return _cat_files([p for p in paths if os.path.isfile(p)], limit)


def build_source(limit: int) -> bytes:
    roots = [
        "/opt/venv/lib/python3.12/site-packages/numpy",
        "/opt/venv/lib/python3.12/site-packages/jax",
    ]
    paths: list[str] = []
    for root in roots:
        paths += glob.glob(os.path.join(root, "**", "*.py"), recursive=True)
    return _cat_files(paths, limit)


def build_binary(limit: int) -> bytes:
    paths = glob.glob(
        "/opt/venv/lib/python3.12/site-packages/numpy/**/*.so", recursive=True
    )
    paths += ["/usr/bin/python3.11", "/bin/bash", "/usr/bin/perl"]
    return _cat_files([p for p in paths if os.path.isfile(p)], limit)


def build_mixed(limit: int) -> bytes:
    root = "/opt/venv/lib/python3.12/site-packages/chex"
    out = io.BytesIO()
    with tarfile.open(fileobj=out, mode="w") as tar:
        for p in sorted(
            glob.glob(os.path.join(root, "**", "*"), recursive=True)
        ):
            if os.path.isfile(p) and out.tell() < limit:
                # Fixed metadata for byte-determinism across runs.
                info = tar.gettarinfo(p, arcname=os.path.relpath(p, root))
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                with open(p, "rb") as f:
                    tar.addfile(info, f)
    return out.getvalue()[:limit]


BUILDERS = {
    "text": build_text,
    "source": build_source,
    "binary": build_binary,
    "mixed": build_mixed,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="corpora")
    ap.add_argument("--mb", type=int, default=8, help="size cap per corpus")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    limit = args.mb << 20
    for name, build in BUILDERS.items():
        data = build(limit)
        # A size that is an exact block-size multiple fails by reference
        # parity (salzcli.c:148-160) — trim one byte if we ever hit it.
        if len(data) % (1 << 15) == 0:
            data = data[:-1]
        path = os.path.join(args.outdir, f"{name}.bin")
        with open(path, "wb") as f:
            f.write(data)
        print(f"{path}: {len(data)} bytes")


if __name__ == "__main__":
    main()
