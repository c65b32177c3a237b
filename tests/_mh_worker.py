"""Worker for the real 2-process jax.distributed multihost test.

Usage: python _mh_worker.py PID NPROC COORD_PORT GATHER_PORT INPATH OUTDIR
Exit codes: 0 ok, 17 = jax.distributed unavailable in this build.
"""

import os
import sys


def main() -> int:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord_port, gather_port = sys.argv[3], sys.argv[4]
    inpath, outdir = sys.argv[5], sys.argv[6]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{coord_port}",
            num_processes=nproc,
            process_id=pid,
        )
    except Exception as e:  # pragma: no cover - environment dependent
        print(f"distributed init failed: {e}", file=sys.stderr)
        return 17
    if jax.process_count() != nproc:
        return 17

    os.environ["SALZ_GATHER_ADDR"] = f"127.0.0.1:{gather_port}"
    from salz_tpu.parallel.multihost import compress_file_multihost

    out = open(os.path.join(outdir, "container.salz"), "wb") if pid == 0 else None
    stats = compress_file_multihost(inpath, out, level=0, batch=2)
    if out is not None:
        out.close()
    with open(os.path.join(outdir, f"stats_{pid}.txt"), "w") as f:
        f.write(f"{stats.plain_bytes} {stats.coded_bytes} {stats.num_blocks}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
