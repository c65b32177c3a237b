#!/bin/bash
# Curate the COMMITTED .jaxcache subset (VERDICT r4: replace 427 MB of
# blanket cache blobs with a regeneration recipe + the small subset the
# driver-facing entry points need).
#
# Mechanism: the filesystem mounts relatime, so backdating atimes below
# mtime re-arms per-file atime updates; every cache entry the target
# workloads READ then gets a fresh atime, and only those files are
# committed. Everything else stays local-only (.jaxcache/ is gitignored;
# `scripts/prewarm.py all` regenerates any level's entries from scratch).
#
# Run from the repo root on the target TPU image with a warm local cache:
#   bash scripts/ship_cache.sh
set -e
cd "$(dirname "$0")/.."

echo "backdating atimes..."
find .jaxcache -type f -exec touch -a -d "2000-01-01" {} +

echo "running the driver-facing workloads (bench + entry + dryrun)..."
SALZ_BENCH_MB=32 python bench.py >/dev/null
python - <<'EOF'
import jax
from __graft_entry__ import entry
fn, args = entry()
jax.jit(fn).lower(*args).compile()
print("entry compile-check OK")
EOF
python __graft_entry__.py

echo "selecting touched entries..."
git rm -r -q --cached .jaxcache 2>/dev/null || true
find .jaxcache -type f -newerat "2020-01-01" -print0 | xargs -0 git add -f
git status --short .jaxcache | wc -l
du -ch $(git diff --cached --name-only -- .jaxcache | head -400) 2>/dev/null | tail -1
echo "staged; review with: git status --short .jaxcache"
