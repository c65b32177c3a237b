#!/usr/bin/env python3
"""Per-phase SA timing via the SALZ_SA_STOP knob (runs itself in subprocesses)."""
import os, subprocess, sys, re

corpus = sys.argv[1] if len(sys.argv) > 1 else "corpora/text.bin"
cap = os.environ.get("CAP", str(1 << 20))
B = os.environ.get("B", "8")

if os.environ.get("_INNER"):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np
    from salz_tpu.utils import jaxcache
    jaxcache.enable()
    import jax, jax.numpy as jnp
    import time
    from salz_tpu.ops.suffix_array import suffix_array_prefixes_batch
    CAP = int(cap); NB = int(B)
    data = open(corpus, "rb").read()
    need = NB * CAP
    while len(data) < need:
        data += data
    blocks = jnp.asarray(np.frombuffer(data[:need], np.uint8).reshape(NB, CAP))
    ns = jnp.full((NB,), CAP - 8, jnp.int32)
    fn = jax.jit(lambda b, n: suffix_array_prefixes_batch(b, n, cap=CAP))
    out = fn(blocks, ns)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(blocks, ns)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    dt = (time.perf_counter() - t0) / 3
    stop = os.environ.get("SALZ_SA_STOP", "full")
    if stop == "phase1":
        print(f"  rounds(rd at exit): {np.asarray(out[4])[0]}")
    print(f"RESULT {stop or 'full'}: {dt*1e3:.1f} ms")
    sys.exit(0)

for stop in ("init", "phase1", "phase2", ""):
    env = dict(os.environ, _INNER="1", SALZ_SA_STOP=stop, CAP=cap, B=B)
    r = subprocess.run([sys.executable, __file__, corpus], env=env,
                       capture_output=True, text=True, timeout=1500)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT") or "rounds" in line:
            print(f"{corpus}: {line}")
    if r.returncode != 0:
        print(r.stderr[-2000:])
        break
