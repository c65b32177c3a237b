"""Benchmark: single-chip SALZ compression throughput vs the scalar reference.

Prints exactly ONE JSON line to stdout:
  {"metric": "compress_MB_s_per_chip", "value": ..., "unit": "MB/s",
   "vs_baseline": ...}

vs_baseline = device throughput / single-thread native C++ reference-equivalent
codec throughput on this host (the reference publishes no numbers — BASELINE.md
— so the scalar implementation of the same format is the baseline).

Protocol (mirrors scripts/bench.sh semantics): fixed corpus, block size =
level-5 default (1 MiB), conformance asserted (device stream byte-identical to
the oracle stream, roundtrip decode equal).

Environment knobs: SALZ_BENCH_MB (corpus size, default 32), SALZ_BENCH_LEVEL
(default 5), SALZ_BENCH_BATCH (blocks per device step, default 4).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_synth_corpus(total_bytes: int) -> bytes:
    """Deterministic text-like corpus (fallback when corpora/ is absent)."""
    rng = np.random.default_rng(1234)
    words = [
        b"the ", b"quick ", b"brown ", b"fox ", b"jumps ", b"over ", b"lazy ",
        b"dog ", b"suffix ", b"array ", b"compression ", b"factor ",
        b"lempel ", b"ziv ", b"parse ", b"entropy ", b"a ", b"of ", b"and ",
        b"to ", b"in ", b"is ", b"\n",
    ]
    lens = np.array([len(w) for w in words])
    picks = rng.integers(
        0, len(words), size=int(total_bytes / lens.mean()) + 64
    )
    out = bytearray()
    for p in picks:
        out += words[int(p)]
    while len(out) < total_bytes:  # top up if the estimate fell short
        out += out[: total_bytes - len(out)]
    return bytes(out[:total_bytes])


def make_corpus(total_bytes: int) -> bytes:
    """REAL on-image bytes (corpora/ built by scripts/make_corpora.py from
    license text, source trees, and ELF binaries — the survivor-heavy
    regime where round-2 was slowest; VERDICT round-2 weak #2 demanded the
    headline be measured on real data). Synthetic word-salad only as a
    fallback when the corpora are missing."""
    root = os.path.dirname(os.path.abspath(__file__))
    parts = []
    got = 0
    for name in ("text.bin", "source.bin", "binary.bin", "mixed.bin"):
        path = os.path.join(root, "corpora", name)
        if os.path.exists(path):
            data = open(path, "rb").read()
            parts.append(data)
            got += len(data)
    if not parts:
        return make_synth_corpus(total_bytes)
    blob = b"".join(parts)
    while len(blob) < total_bytes:
        blob += blob
    return blob[:total_bytes]


def main() -> None:
    mb = int(os.environ.get("SALZ_BENCH_MB", "32"))
    level = int(os.environ.get("SALZ_BENCH_LEVEL", "5"))
    batch = int(os.environ.get("SALZ_BENCH_BATCH", "8"))

    from salz_tpu import format as fmt
    from salz_tpu import native
    from salz_tpu.utils import jaxcache

    jaxcache.enable()

    import jax
    import jax.numpy as jnp

    from salz_tpu.ops.encoder import encode_blocks_device_staged
    from salz_tpu.parallel.sharding import pad_blocks

    cap = fmt.block_size_for_level(level)
    corpus = make_corpus(mb << 20)
    blocks = [corpus[i : i + cap] for i in range(0, len(corpus), cap)]
    if len(blocks[-1]) < 8:
        blocks.pop()
    log(f"corpus: {len(corpus)} bytes, {len(blocks)} blocks of <= {cap}")
    log(f"devices: {jax.devices()}")

    # ---- native single-thread baseline over the FULL block set: a 4-block
    # stride subset swung the measured baseline 6.8-9.9 MB/s run to run
    # (the corpus regimes differ 3x), which made vs_baseline noise.
    t0 = time.perf_counter()
    native_segs = [native.encode_block(b) for b in blocks]
    native_dt = time.perf_counter() - t0
    native_mbps = sum(len(b) for b in blocks) / native_dt / 1e6
    log(f"native baseline: {native_mbps:.2f} MB/s (all {len(blocks)} blocks)")

    # ---- device throughput
    padded, lens = pad_blocks(blocks, cap)
    nbatches = (len(blocks) + batch - 1) // batch
    pad_batches = nbatches * batch - len(blocks)
    if pad_batches:
        padded = np.concatenate([padded, np.tile(padded[-1:], (pad_batches, 1))])
        lens = np.concatenate([lens, np.tile(lens[-1:], pad_batches)])
    padded = padded.reshape(nbatches, batch, cap)
    lens = lens.reshape(nbatches, batch)

    def run_all():
        # Issue ALL host->device transfers up front (async): the axon tunnel
        # moves ~40 MB/s, so a blocking 8 MB upload per batch serializes
        # ~216 ms against ~1.1 s of compute; prefetching overlaps all but
        # the first.
        dev_blocks = [jax.device_put(padded[i]) for i in range(nbatches)]
        dev_lens = [jax.device_put(lens[i]) for i in range(nbatches)]
        outs_lens = []
        for i in range(nbatches):
            o, ol, sl = encode_blocks_device_staged(
                dev_blocks[i], dev_lens[i], cap=cap
            )
            outs_lens.append((o, ol))
        # Honest sync: device_get of one element of every batch's output —
        # block_until_ready alone does not reliably block through the axon
        # tunnel.
        for o, ol in outs_lens:
            np.asarray(jax.device_get(ol.ravel()[:1]))
        return outs_lens

    log("compiling + warmup...")
    t0 = time.perf_counter()
    results = run_all()
    log(f"first pass (incl. compile): {time.perf_counter() - t0:.1f}s")

    # Median of 3 steady passes: round 4's committed headline and the
    # driver's capture disagreed by 9% on single-pass numbers (VERDICT r4
    # weak #1); the median pins run-to-run axon/tunnel variance.
    passes = []
    for _ in range(3):
        t0 = time.perf_counter()
        results = run_all()
        passes.append(time.perf_counter() - t0)
    device_dt = sorted(passes)[1]
    total = sum(len(b) for b in blocks) + (pad_batches * len(blocks[-1]) if pad_batches else 0)
    device_mbps = total / device_dt / 1e6
    log(
        f"device: {device_mbps:.2f} MB/s (median of {[round(p, 2) for p in passes]}s "
        f"for {total/1e6:.0f} MB)"
    )

    # ---- conformance: EVERY block byte-identical + roundtrip (batch bugs
    # can corrupt only blocks b > 0 — never check just the first).
    nblk = 0
    for bi, (o, ol) in enumerate(results):
        o = np.asarray(o)
        ol = np.asarray(ol)
        for j in range(o.shape[0]):
            if nblk >= len(blocks):
                break
            seg = bytes(o[j][: int(ol[j])])
            ref = native_segs[nblk]
            assert seg == ref, f"device stream != reference (block {nblk})"
            assert native.decode_block(seg, cap) == blocks[nblk], (
                f"roundtrip failed (block {nblk})"
            )
            nblk += 1
    log(f"conformance: {nblk} blocks byte-identical + roundtrip OK")

    # ---- decompression throughput (production decode path = native scalar;
    # the reference times decompression as a first-class metric,
    # salzcli.c:367-369). Segments from the conformance pass above.
    segs = []
    nblk = 0
    for o, ol in results:
        o = np.asarray(o)
        ol = np.asarray(ol)
        for j in range(o.shape[0]):
            if nblk >= len(blocks):
                break
            segs.append(bytes(o[j][: int(ol[j])]))
            nblk += 1
    t0 = time.perf_counter()
    dec_total = 0
    for seg in segs:
        dec_total += len(native.decode_block(seg, cap))
    decode_dt = time.perf_counter() - t0
    decode_mbps = dec_total / decode_dt / 1e6
    log(f"decode (native path): {decode_mbps:.2f} MB/s")

    # ---- device decoder (conformance path — serial token loop per block,
    # vmap-batched; measured so the claim carries a number, VERDICT r2 #8).
    # Runs in a SUBPROCESS with a hard timeout: round 3's driver bench died
    # here with a TPU-worker crash AFTER the compress numbers were already
    # in hand, losing the whole result. A kernel fault or hang in this
    # optional metric must never take down the headline.
    decode_dev_mbps = _device_decode_subprocess(segs, blocks, cap)

    result = {
        "metric": "compress_MB_s_per_chip",
        "value": round(device_mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(device_mbps / native_mbps, 3),
        "decode_MB_s": round(decode_mbps, 3),
        "ratio": round(
            sum(len(b) for b in blocks) / sum(len(s) for s in segs), 3
        ),
    }
    if decode_dev_mbps is not None:
        result["decode_device_MB_s"] = round(decode_dev_mbps, 3)
    print(json.dumps(result))


def _device_decode_subprocess(
    segs: list, blocks: list, cap: int
) -> float | None:
    """Measure the device conformance decoder in an isolated process.

    Returns MB/s, or None if the child crashes/hangs (reported, not fatal:
    the production decode path is native scalar; this is a conformance
    facility whose measurement must not endanger the bench)."""
    import subprocess
    import tempfile

    n = min(4, len(segs))
    # 300 s default: on this machine loading cached executables through the
    # ~40 MB/s axon tunnel alone costs the child minutes (PERFORMANCE.md
    # round-5 finding 10); the metric is optional and omitted on timeout —
    # it must never put the headline capture's wall-clock budget at risk.
    timeout_s = int(os.environ.get("SALZ_BENCH_DDEC_TIMEOUT", "300"))
    with tempfile.TemporaryDirectory() as td:
        data = os.path.join(td, "segs.npz")
        np.savez(
            data,
            cap=cap,
            **{f"seg{i}": np.frombuffer(segs[i], np.uint8) for i in range(n)},
            **{f"blk{i}": np.frombuffer(blocks[i], np.uint8) for i in range(n)},
        )
        child = (
            "import time, numpy as np\n"
            f"z = np.load({data!r})\n"
            "cap = int(z['cap'])\n"
            "n = sum(1 for k in z.files if k.startswith('seg'))\n"
            "segs = [z[f'seg{i}'].tobytes() for i in range(n)]\n"
            "blks = [z[f'blk{i}'].tobytes() for i in range(n)]\n"
            "from salz_tpu.ops.decoder import BatchBlockDecoder\n"
            "d = BatchBlockDecoder(cap, batch=n)\n"
            "got = d.decode_many(segs)\n"
            "assert got == blks, 'device decode mismatch'\n"
            "t0 = time.perf_counter()\n"
            "d.decode_many(segs)\n"
            "dt = time.perf_counter() - t0\n"
            "print('DDEC_MBPS', sum(len(b) for b in blks) / dt / 1e6)\n"
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", child],
                capture_output=True, text=True, timeout=timeout_s,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except subprocess.TimeoutExpired:
            log(f"decode (device conformance path): TIMEOUT > {timeout_s}s")
            return None
    for line in proc.stdout.splitlines():
        if line.startswith("DDEC_MBPS"):
            mbps = float(line.split()[1])
            log(f"decode (device conformance path): {mbps:.3f} MB/s")
            return mbps
    tail = (proc.stderr or "")[-500:]
    log(f"decode (device conformance path): FAILED rc={proc.returncode} {tail}")
    return None


if __name__ == "__main__":
    main()
