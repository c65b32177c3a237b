"""Scaling-efficiency harness (SURVEY §2.4 P4 / BASELINE config 5).

Runs the multi-process compression path at N = 1, 2, 4, ... processes over
`jax.distributed` and reports throughput + scaling efficiency vs N = 1.

On this image the processes are CPU-device workers pinned to distinct cores
(one core each), so the measurement validates the RUNTIME scaling — block
sharding, per-process encode, stat allgather, segment gather to process 0 —
with real inter-process collectives; on a TPU pod the same worker code runs
one process per host (scripts/salz_mh.py --no-spawn).

Each worker compresses the file once to warm the compile cache, barriers,
then the timed pass runs; process 0 of each N emits a JSON line. The parent
aggregates into SCALING_rXX.json:

  python scripts/scaling_bench.py --file corpora/text.bin --level 1 \
      --procs 1,2,4,8 --out SCALING_r03.json
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def worker(args: argparse.Namespace) -> int:
    try:
        os.sched_setaffinity(0, {args.pin_cpu})
    except OSError:
        pass
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    except Exception as e:  # pragma: no cover
        print(f"scaling worker: init failed: {e}", file=sys.stderr)
        return 17

    import numpy as np
    from jax.experimental import multihost_utils

    from salz_tpu.parallel.multihost import compress_file_multihost

    pid = jax.process_index()

    def barrier():
        multihost_utils.process_allgather(np.zeros(1, np.int32))

    # Warm pass: compiles every program shape this worker will need.
    compress_file_multihost(args.file, None, level=args.level,
                            batch=args.batch)
    barrier()
    t0 = time.perf_counter()
    stats = compress_file_multihost(args.file, None, level=args.level,
                                    batch=args.batch)
    barrier()
    dt = time.perf_counter() - t0
    if pid == 0:
        print(json.dumps({
            "N": args.num_processes,
            "seconds": round(dt, 4),
            "MB_s": round(stats.plain_bytes / dt / 1e6, 4),
            "plain_bytes": stats.plain_bytes,
            "coded_bytes": stats.coded_bytes,
        }), flush=True)
    return 0


def run_n(n: int, args: argparse.Namespace) -> dict:
    coord, gather = free_port(), free_port()
    ncpu = os.cpu_count() or 1
    procs = []
    for pid in range(n):
        cmd = [
            sys.executable, os.path.abspath(__file__), "--worker",
            "--coordinator", f"127.0.0.1:{coord}",
            "--num-processes", str(n), "--process-id", str(pid),
            "--pin-cpu", str(pid % ncpu),
            "--file", args.file, "--level", str(args.level),
            "--batch", str(args.batch),
        ]
        env = dict(os.environ, SALZ_GATHER_ADDR=f"127.0.0.1:{gather}",
                   JAX_PLATFORMS="cpu")
        procs.append(subprocess.Popen(
            cmd, env=env,
            stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
            text=True,
        ))
    out, _ = procs[0].communicate(timeout=args.timeout)
    for p in procs[1:]:
        p.wait(timeout=args.timeout)
    for line in out.splitlines():
        try:
            d = json.loads(line)
            if "MB_s" in d:
                return d
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"no result line from N={n} run: {out!r}")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--file", default="corpora/text.bin")
    ap.add_argument("--level", type=int, default=1)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--procs", default="1,2,4,8")
    ap.add_argument("--out", default=None)
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--coordinator", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--num-processes", type=int, help=argparse.SUPPRESS)
    ap.add_argument("--process-id", type=int, help=argparse.SUPPRESS)
    ap.add_argument("--pin-cpu", type=int, default=0, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.worker:
        return worker(args)

    results = []
    skipped = []
    base = None
    ncpu = os.cpu_count() or 1
    for n in [int(x) for x in args.procs.split(",")]:
        if n > ncpu:
            print(f"N={n}: skipped (only {ncpu} cores; one pinned core "
                  "per process)", flush=True)
            skipped.append({
                "N": n,
                "reason": f"host has {ncpu} cores; one pinned core per "
                          "process, so N>{0} would measure timesharing, "
                          "not runtime scaling".format(ncpu),
            })
            continue
        try:
            r = run_n(n, args)
        except Exception as e:
            # Record what we have rather than losing the whole artifact.
            print(f"N={n}: FAILED ({e})", flush=True)
            continue
        if base is None:
            base = r["MB_s"]
        r["efficiency"] = round(r["MB_s"] / (base * r["N"]), 4)
        results.append(r)
        print(f"N={r['N']}: {r['MB_s']:.2f} MB/s "
              f"(efficiency {r['efficiency']*100:.1f}%)", flush=True)
    doc = {
        "file": args.file, "level": args.level, "batch": args.batch,
        "platform": "cpu (1 pinned core per process)",
        "results": results,
        "skipped": skipped,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    sys.exit(main())
