#!/usr/bin/env python3
"""Real-corpus benchmark: ratio + MB/s per (file, level) on the device path.

The TPU analog of the reference protocol (/root/reference/scripts/bench.sh:
42-62): every corpus file is encoded at each level through the jax engine,
every produced segment is compared byte-for-byte against the native C++
oracle, and the roundtrip is verified. Writes CORPUS_RESULTS.md + .json at
the repo root (committed artifacts; VERDICT.md round-1 item 3).

Usage: python scripts/bench_corpus.py [levels...]   (default: 0 2 4 5 6 8 9)
Run scripts/make_corpora.py first to build corpora/*.bin from on-image data.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salz_tpu.utils import jaxcache

jaxcache.enable()

import jax  # noqa: E402

from salz_tpu import native  # noqa: E402
from salz_tpu.config import SalzConfig  # noqa: E402
from salz_tpu.ops.encoder import BatchBlockEncoder  # noqa: E402

CORPORA = ("text", "source", "binary", "mixed")


def run(level: int, data: bytes) -> dict:
    cfg = SalzConfig(level=level).validate()
    cap = cfg.block_size
    enc = BatchBlockEncoder(cap, batch=cfg.batch, parse=cfg.parse)
    blocks = [data[i : i + cap] for i in range(0, len(data), cap)]

    segs, status = enc.encode_many_status(blocks)  # warm/compile pass
    t0 = time.perf_counter()
    segs, status = enc.encode_many_status(blocks)
    dt = time.perf_counter() - t0

    assert all(st == 0 for st in status), status
    conforms = True
    out_bytes = 0
    for blk, seg in zip(blocks, segs):
        assert seg is not None
        out_bytes += len(seg)
        if seg != native.encode_block(blk) or native.decode_block(
            seg, cap
        ) != blk:
            conforms = False
    return {
        "level": level,
        "blocks": len(blocks),
        "in_bytes": len(data),
        "out_bytes": out_bytes,
        "ratio": round(len(data) / out_bytes, 4),
        "mb_s": round(len(data) / dt / 1e6, 3),
        "conforms": conforms,
    }


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [0, 2, 4, 5, 6, 8, 9]
    print(f"devices: {jax.devices()}", flush=True)
    results: dict[str, list[dict]] = {}
    ok = True
    for name in CORPORA:
        path = f"corpora/{name}.bin"
        if not os.path.exists(path):
            print(f"missing {path} — run scripts/make_corpora.py", flush=True)
            sys.exit(2)
        data = open(path, "rb").read()
        results[name] = []
        for level in levels:
            r = run(level, data)
            results[name].append(r)
            ok &= r["conforms"]
            print(
                f"{name:8s} L{level}: {r['mb_s']:8.2f} MB/s  ratio "
                f"{r['ratio']:6.3f}  blocks {r['blocks']:4d}  "
                f"{'OK' if r['conforms'] else 'MISMATCH'}",
                flush=True,
            )

    dev = str(jax.devices()[0])
    with open("CORPUS_RESULTS.json", "w") as f:
        json.dump({"device": dev, "results": results}, f, indent=1)
    with open("CORPUS_RESULTS.md", "w") as f:
        f.write(
            "# Real-corpus results (device encode path)\n\n"
            f"Device: `{dev}`. Corpora built from on-image real files by\n"
            "`scripts/make_corpora.py` (Canterbury/Silesia are not fetchable "
            "offline;\nsee its docstring for the regime mapping). Every "
            "segment byte-identical\nto the native C++ oracle + roundtrip "
            "verified (the `conforms` column).\n"
            "MB/s is steady-state (second pass, compile cached), one chip.\n\n"
        )
        for name in CORPORA:
            f.write(f"## {name}.bin ({results[name][0]['in_bytes']} bytes)\n\n")
            f.write("| level | blocks | MB/s | ratio | conforms |\n")
            f.write("|---|---|---|---|---|\n")
            for r in results[name]:
                f.write(
                    f"| {r['level']} | {r['blocks']} | {r['mb_s']} | "
                    f"{r['ratio']} | {'yes' if r['conforms'] else 'NO'} |\n"
                )
            f.write("\n")
    print(f"\nwrote CORPUS_RESULTS.md/.json  all-conform={ok}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
