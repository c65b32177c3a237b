#!/usr/bin/env python3
"""Level-sweep benchmark + roundtrip conformance — scripts/bench.sh analog.

The reference harness (scripts/bench.sh:42-62) compresses each payload at
levels 0-9, decompresses, and diffs against the original; ratio and seconds
come from the CLI log line. This reproduces that protocol with the framework
CLI (any engine) and emits one JSON line per (file, level) plus an aggregate.

Usage: python scripts/bench_sweep.py [--engine jax|native|python]
           [--levels 0-9|3,5] FILE...
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from salz_tpu import container, format as fmt
from salz_tpu.utils.metrics import CompressionStats


def parse_levels(spec: str) -> list[int]:
    if "-" in spec:
        lo, hi = spec.split("-")
        return list(range(int(lo), int(hi) + 1))
    return [int(x) for x in spec.split(",")]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default=os.environ.get("SALZ_ENGINE", "jax"))
    ap.add_argument("--levels", default="0-9")
    ap.add_argument(
        "--conform", action="store_true",
        help="also encode with the native scalar oracle and require "
             "byte-identical container output",
    )
    ap.add_argument(
        "--steady", action="store_true",
        help="encode each (file, level) twice and report the second pass as "
             "compress_s (the first pass, which pays jit compilation on the "
             "jax engine, is reported as first_compress_s)",
    )
    ap.add_argument("files", nargs="+")
    args = ap.parse_args()

    agg = CompressionStats()
    failures = 0
    for path in args.files:
        with open(path, "rb") as f:
            data = f.read()
        for level in parse_levels(args.levels):
            block_size = fmt.block_size_for_level(level)
            codec = container.get_codec(args.engine, block_size)
            enc = io.BytesIO()
            t0 = time.perf_counter()
            try:
                container.compress_stream(
                    io.BytesIO(data), enc, block_size, codec
                )
            except ValueError as e:
                print(json.dumps({
                    "file": os.path.basename(path), "level": level,
                    "error": str(e),
                }), flush=True)
                failures += 1
                continue
            t_enc = time.perf_counter() - t0
            payload = enc.getvalue()

            t_first = None
            deterministic = None
            if args.steady:
                t_first = t_enc
                enc2 = io.BytesIO()
                t0 = time.perf_counter()
                container.compress_stream(
                    io.BytesIO(data), enc2, block_size, codec
                )
                t_enc = time.perf_counter() - t0
                # Recorded per-line (not an assert: that would be stripped
                # under -O and would abort the whole sweep; mismatches are
                # counted like roundtrip/conform failures instead).
                deterministic = enc2.getvalue() == payload
                if not deterministic:
                    failures += 1

            dec = io.BytesIO()
            t0 = time.perf_counter()
            container.decompress_stream(io.BytesIO(payload), dec, codec)
            t_dec = time.perf_counter() - t0
            ok = dec.getvalue() == data
            if not ok:
                failures += 1

            conform = None
            if args.conform and args.engine != "native":
                ref = io.BytesIO()
                container.compress_stream(
                    io.BytesIO(data), ref, block_size,
                    container.get_codec("native", block_size),
                )
                conform = ref.getvalue() == payload
                if not conform:
                    failures += 1

            nblocks = -(-len(data) // block_size)
            agg.add_file(len(data), len(payload), nblocks, t_enc)
            print(json.dumps({
                "file": os.path.basename(path),
                "level": level,
                "engine": args.engine,
                "plain_bytes": len(data),
                "coded_bytes": len(payload),
                "ratio": round(len(data) / len(payload), 4),
                "compress_s": round(t_enc, 4),
                "compress_MB_s": round(len(data) / t_enc / 1e6, 3),
                **(
                    {"first_compress_s": round(t_first, 4)}
                    if t_first is not None else {}
                ),
                "decompress_s": round(t_dec, 4),
                "decompress_MB_s": round(len(data) / t_dec / 1e6, 3),
                "roundtrip": "ok" if ok else "MISMATCH",
                **(
                    {"deterministic": "ok" if deterministic else "MISMATCH"}
                    if deterministic is not None else {}
                ),
                **(
                    {"conform": "ok" if conform else "MISMATCH"}
                    if conform is not None else {}
                ),
            }), flush=True)

    out = agg.as_dict()
    out["aggregate"] = True
    out["failures"] = failures
    print(json.dumps(out), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
