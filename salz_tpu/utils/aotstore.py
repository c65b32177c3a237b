"""AOT program store: skip per-process Python tracing with jax.export.

Why: on this image a warm-XLA-cache CLI invocation still spends ~20-40 s
re-tracing jaxprs (the Pallas parse-sweep kernel alone ~8 s per shape —
PERFORMANCE.md round-5 finding 6) because the persistent XLA cache only
skips the *compile*, never the Python trace. `jax.export` round-trips skip
tracing entirely: deserializing a serialized program is ~instant and its
first call goes straight to the (cached) XLA compile.

Mechanics: `cached_call(tag, fn, *args)` keys an exported artifact by
(tag, argument shapes/dtypes, backend platform, jax version, and a SOURCE
EPOCH — the hash of every salz_tpu/ops/*.py file), so editing any op file
invalidates every artifact. On a miss the normal jitted `fn` runs (tracing
+ compiling as usual) and the export is serialized afterwards, roughly
doubling that one process's tracing cost; every later process starts hot.

Opt-out with SALZ_AOT=0. The store lives next to the XLA cache
(.jaxcache/exports/) and artifacts are a few hundred KB of StableHLO.

There is no reference counterpart (the reference is ahead-of-time compiled
C); this is TPU-framework plumbing for SURVEY.md §2.2 K5's per-file CLI
latency.
"""

from __future__ import annotations

import hashlib
import os
import pathlib

# OPT-IN (SALZ_AOT=1): measured on the axon TPU backend, Exported.call at
# the (8, 1 MiB) level-5 shapes ran ~100x slower in the container loop than
# the plain jitted path (sweep row text L5: 0.03 MB/s steady) while levels
# 0-4 were unaffected — the deserialized-program call path does not hit the
# same executable fast path at large program sizes. Until that is
# root-caused, the store only serves explicit opt-in (CLI cold-latency
# experiments); the default path re-traces as before.
_ENABLED = os.environ.get("SALZ_AOT", "0") == "1"

_EPOCH: str | None = None
_EXPORTS: dict[str, object] = {}


def _source_epoch() -> str:
    """Hash of every ops/ source file: edits invalidate all artifacts."""
    global _EPOCH
    if _EPOCH is None:
        h = hashlib.sha256()
        ops_dir = pathlib.Path(__file__).resolve().parents[1] / "ops"
        for p in sorted(ops_dir.glob("*.py")):
            h.update(p.name.encode())
            h.update(p.read_bytes())
        _EPOCH = h.hexdigest()[:16]
    return _EPOCH


def _store_dir() -> pathlib.Path:
    from salz_tpu.utils import jaxcache

    d = pathlib.Path(jaxcache.cache_dir()) / "exports"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _key(tag: str, args) -> str:
    import jax

    sig = ",".join(f"{tuple(a.shape)}:{a.dtype}" for a in args)
    raw = f"{tag}|{sig}|{jax.default_backend()}|{jax.__version__}|{_source_epoch()}"
    return hashlib.sha256(raw.encode()).hexdigest()[:24]


def cached_call(tag: str, fn, *args):
    """Call `fn(*args)` through an exported-program store.

    fn must be a jitted callable that is a pure function of `args` (all
    statics folded in). Returns exactly fn's output pytree.
    """
    if not _ENABLED:
        return fn(*args)
    import jax

    key = _key(tag, args)
    exp = _EXPORTS.get(key)
    if exp is None:
        path = _store_dir() / f"{tag}-{key}.bin"
        if path.exists():
            try:
                exp = jax.export.deserialize(path.read_bytes())
                _EXPORTS[key] = exp
            except Exception:
                exp = None  # stale/corrupt artifact: fall through and rebuild
        if exp is None:
            out = fn(*args)
            try:
                shapes = [
                    jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args
                ]
                exported = jax.export.export(fn)(*shapes)
                tmp = path.with_suffix(".tmp")
                tmp.write_bytes(exported.serialize())
                os.replace(tmp, path)  # atomic: concurrent CLIs race safely
                _EXPORTS[key] = exported
            except Exception:
                pass  # export is an optimization; the call already succeeded
            return out
    return exp.call(*args)
