#!/usr/bin/env python3
"""Group-length distribution of still-tied rank groups per doubling depth."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from salz_tpu.utils import jaxcache
jaxcache.enable()
import jax, jax.numpy as jnp

CAP = int(os.environ.get("CAP", str(1 << 20)))
B = int(os.environ.get("B", "8"))

def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "corpora/text.bin"
    data = open(src, "rb").read()
    need = B * CAP
    while len(data) < need:
        data += data
    blocks_np = np.frombuffer(data[:need], np.uint8).reshape(B, CAP)
    ns_np = np.full((B,), CAP - 8, np.int64)
    # host-side exact SA-depth groups via numpy argsort on suffixes truncated
    # at depth d: use doubling on numpy (fast enough at 8M with argsort? ~
    # np.argsort 8M ~1s each, 8 rounds ~ fine)
    bounds = [128, 512, 2048, 8192, 65536]
    for b in range(min(B, 2)):
        t = blocks_np[b].astype(np.int64) + 1
        n = int(ns_np[b])
        t = t.copy(); t[n:] = 0
        # rank at depth 1
        rank = t
        d = 1
        print(f"block {b} ({src}):")
        while d < CAP:
            shifted = np.concatenate([rank[d:], np.full(min(d, CAP), -1)])[:CAP]
            key = rank * (1 << 22) + (shifted + 1)
            order = np.argsort(key, kind="stable")
            ks = key[order]
            heads = np.concatenate([[True], ks[1:] != ks[:-1]])
            gid = np.cumsum(heads) - 1
            rank_s = np.zeros(CAP, np.int64)
            np.add.at(rank_s, gid, 0)
            # head-index rank
            headpos = np.nonzero(heads)[0]
            rank_new = np.zeros(CAP, np.int64)
            rank_new[order] = headpos[gid]
            rank = rank_new
            d *= 2
            if d >= 16 and (d & (d - 1)) == 0 and d in (16, 64, 256, 1024, 4096, 16384, 65536):
                # group lengths
                counts = np.bincount(headpos[gid][:n] if False else rank[ : n].astype(np.int64) * 0)  # placeholder
                # compute run lengths over sorted order restricted to valid
                glen = np.diff(np.concatenate([headpos, [CAP]]))
                active_mask = glen[gid] > 1
                gl = glen[gid]
                tot_act = int(active_mask[:].sum())
                line = f"  depth {d:7d}: active {tot_act/CAP/1:6.1%}"
                for bound in bounds:
                    frac = float(((gl > 1) & (gl <= bound)).sum()) / max(tot_act, 1)
                    line += f"  <= {bound}: {frac:5.1%}"
                mx = int(gl.max())
                line += f"  max {mx}"
                print(line, flush=True)
            if d > CAP:
                break

if __name__ == "__main__":
    main()
