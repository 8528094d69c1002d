"""Microbench: _compact_map execution cost at real 6-D map shapes.

Separates the schedule-compaction cost (one dispatch per map) from the
conv that consumes it, so we know whether phase E of
profile_dgr_register is net+solve or compaction exec.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=729)
    ap.add_argument("--m", type=int, default=22528)
    ap.add_argument("--hits", type=int, default=60000,
                    help="total hits spread over skewed offsets")
    ap.add_argument("--maps", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gmf_tpu.sparse.compact import build_compact_schedule

    rng = np.random.RandomState(0)
    K, M = args.k, args.m
    cap_in = M
    # skewed counts: one near-dense diagonal offset + power-law tail
    w = rng.rand(K - 1) ** 6
    tail = (args.hits * w / w.sum()).astype(np.int64)
    counts = np.r_[int(M * 0.96), tail]
    nbr = np.full((K, M), cap_in, np.int32)
    for k in range(K):
        c = min(int(counts[k]), M)
        cols = rng.choice(M, size=c, replace=False)
        nbr[k, cols] = rng.choice(cap_in, size=c, replace=False)
    counts = (nbr != cap_in).sum(axis=1)
    nbr_dev = jnp.asarray(nbr)
    np.asarray(nbr_dev)  # settle transfer

    def build(with_t):
        return build_compact_schedule(nbr_dev, counts, cap_in=cap_in,
                                      cap_out=M, with_transpose=with_t)

    def fetch(s):
        if isinstance(s, tuple):
            s = s[0]
        leaf = (s["groups"][0][0] if s["groups"] else s["dense"][0])
        np.asarray(leaf)

    t0 = time.perf_counter()
    fetch(build(True))
    print(f"cold: {time.perf_counter() - t0:.2f} s")
    for name, with_t in (("fwd", False), ("fwd+up", True)):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            scheds = [build(with_t) for _ in range(args.maps)]
            fetch(scheds[-1])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1000:.1f} ms for {args.maps} maps "
              f"({min(ts)/args.maps*1000:.1f} ms/map)")


if __name__ == "__main__":
    main()
