#!/usr/bin/env python3
"""Render bench_sweep JSONL into CORPUS_RESULTS.md (+ raw JSON alongside).

Usage:
  python scripts/bench_sweep.py --conform --levels 0-9 corpora/*.bin \
      | tee corpus_sweep.jsonl
  python scripts/corpus_report.py corpus_sweep.jsonl CORPUS_RESULTS.md \
      [native_sweep.jsonl]

The optional third argument is a bench_sweep run of the native scalar
engine on the same corpora; its compress MB/s appears as the per-row
baseline with a vs-native column, plus first-pass (compile-inclusive)
seconds for the jax engine.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    src, dst = sys.argv[1], sys.argv[2]
    native = {}
    if len(sys.argv) > 3:
        with open(sys.argv[3]) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if not rec.get("aggregate") and "level" in rec:
                    native[(rec["file"], rec["level"])] = rec
    rows = []
    agg = None
    with open(src) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if rec.get("aggregate"):
                agg = rec
            else:
                rows.append(rec)

    by_file: dict[str, list[dict]] = {}
    for r in rows:
        by_file.setdefault(r["file"], []).append(r)

    engine = rows[0].get("engine", "?") if rows else "?"
    out = [
        "# Corpus results — real corpora, level sweep",
        "",
        f"Engine: `{engine}` (device pipeline on the TPU chip; conformance "
        "column = container bytes identical to the native scalar oracle). "
        "Corpora are genuine files from this image "
        "(scripts/make_corpora.py): license/doc English text, numpy+jax "
        "Python source, ELF shared objects, a mixed tar. Protocol mirrors "
        "reference scripts/bench.sh (compress, decompress, diff) per level.",
        "",
    ]
    for fname in sorted(by_file):
        out.append(f"## {fname}")
        out.append("")
        out.append(
            "| level | ratio | compress MB/s | native MB/s | vs native | "
            "first pass s | decompress MB/s | roundtrip | conform |"
        )
        out.append("|---|---|---|---|---|---|---|---|---|")
        for r in sorted(by_file[fname], key=lambda r: r.get("level", -1)):
            if "error" in r:
                out.append(
                    f"| {r['level']} | — | — | — | — | — | — | "
                    f"ERROR: {r['error']} | — |"
                )
                continue
            nat = native.get((r["file"], r["level"]))
            nat_s = f"{nat['compress_MB_s']:.2f}" if nat else "—"
            vs = (
                f"{r['compress_MB_s'] / nat['compress_MB_s']:.2f}x"
                if nat
                else "—"
            )
            fp = (
                f"{r['first_compress_s']:.0f}"
                if r.get("first_compress_s") is not None
                else "—"
            )
            out.append(
                f"| {r['level']} | {r['ratio']:.3f} | "
                f"{r['compress_MB_s']:.2f} | {nat_s} | {vs} | {fp} | "
                f"{r['decompress_MB_s']:.1f} | "
                f"{r['roundtrip']} | {r.get('conform', '—')} |"
            )
        out.append("")
    if agg:
        out.append(
            f"**Aggregate**: {agg['plain_bytes']} bytes → "
            f"{agg['coded_bytes']} ({agg['ratio']:.3f}x), "
            f"{agg['MB_s']:.2f} MB/s over {agg['num_blocks']} blocks, "
            f"{agg['failures']} failures."
        )
        out.append("")
    with open(dst, "w") as f:
        f.write("\n".join(out))
    with open(dst.replace(".md", ".json"), "w") as f:
        json.dump({"rows": rows, "aggregate": agg}, f, indent=1)
    print(f"wrote {dst} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
