"""Multi-process / multi-host salz compression launcher (SURVEY §2.4 P4).

Two modes:

* LAUNCHER (default): `python scripts/salz_mh.py --processes N IN [-o OUT]`
  spawns N local worker processes wired together with `jax.distributed`
  (localhost coordinator + the socket segment-gather to process 0). This is
  the single-machine validation path (CPU devices unless the environment
  provides more); it is also the documented CLI route for multi-process
  compression ("salz-mh").

* POD (`--no-spawn`): every host of a TPU pod slice runs the same command;
  `jax.distributed.initialize()` auto-detects the pod topology (or takes
  explicit --coordinator/--process-id/--num-processes). Process 0 writes the
  container. This is the real multi-host entry point: one process per host,
  blocks sharded process-strided, stats psum'd, segments gathered to 0
  (salz_tpu/parallel/multihost.py).

The output container is byte-identical to the single-process `salz` CLI's
(the per-block streams are independent; assembly is in block order).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(args: argparse.Namespace) -> int:
    if args.pin_cpu is not None:
        try:
            os.sched_setaffinity(0, {args.pin_cpu})
        except OSError:
            pass
    sys.path.insert(0, REPO)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.coordinator:
        try:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        except Exception as e:  # pragma: no cover - environment dependent
            print(f"salz-mh: distributed init failed: {e}", file=sys.stderr)
            return 17
    else:
        from salz_tpu.parallel.multihost import initialize_distributed

        initialize_distributed()

    from salz_tpu.parallel.multihost import compress_file_multihost

    pid = jax.process_index()
    out = None
    if pid == 0 and args.output:
        out = open(args.output, "wb")
    t0 = time.perf_counter()
    stats = compress_file_multihost(
        args.input, out, level=args.level, batch=args.batch
    )
    dt = time.perf_counter() - t0
    if out is not None:
        out.close()
    if pid == 0:
        mbs = stats.plain_bytes / dt / 1e6
        print(
            f"salz-mh: {args.input}: {stats.plain_bytes} -> "
            f"{stats.coded_bytes} bytes (ratio {stats.ratio:.3f}), "
            f"{dt:.2f}s, {mbs:.2f} MB/s over "
            f"{jax.process_count()} process(es)",
            file=sys.stderr,
        )
    return 0


def launch(args: argparse.Namespace) -> int:
    import socket

    def free_port() -> int:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    coord = free_port()
    gather = free_port()
    procs = []
    for pid in range(args.processes):
        cmd = [
            sys.executable, os.path.abspath(__file__), "--worker",
            "--coordinator", f"127.0.0.1:{coord}",
            "--num-processes", str(args.processes),
            "--process-id", str(pid),
            "--platform", args.platform or "cpu",
            "--level", str(args.level), "--batch", str(args.batch),
            args.input,
        ]
        if args.output:
            cmd += ["-o", args.output]
        if args.pin_cpus:
            ncpu = os.cpu_count() or 1
            cmd += ["--pin-cpu", str(pid % ncpu)]
        env = dict(os.environ, SALZ_GATHER_ADDR=f"127.0.0.1:{gather}")
        procs.append(subprocess.Popen(cmd, env=env))
    rc = 0
    for p in procs:
        rc = p.wait() or rc
    return rc


def main() -> int:
    ap = argparse.ArgumentParser(
        prog="salz-mh", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("input")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--processes", type=int, default=1,
                    help="spawn N local jax.distributed processes")
    ap.add_argument("--no-spawn", action="store_true",
                    help="run as ONE pod process (auto-detected topology)")
    ap.add_argument("--level", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--platform", default=None,
                    help="jax platform override (cpu/tpu; spawn default cpu)")
    ap.add_argument("--pin-cpus", action="store_true",
                    help="pin each spawned worker to one CPU core")
    # worker-internal flags
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--coordinator", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--num-processes", type=int, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--process-id", type=int, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--pin-cpu", type=int, default=None,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.worker or args.no_spawn:
        return worker(args)
    return launch(args)


if __name__ == "__main__":
    sys.exit(main())
