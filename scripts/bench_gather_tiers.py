"""Microbench: TPU gather-descriptor economics for the kernel-map tiers.

The device kernel-map builders are gather-bound (~40M scalar descriptors/s
measured at surface scale). Two open questions gate the next tier design:

1. Where is the big-table gather cliff? (DENSE_CELL_BUDGET is 2^22 cells
   because a 2^25-cell table measured 1.58 s — but nothing between 2^22
   and 2^25 was measured.)
2. What does a ROW gather cost vs row width R? If gathering a [R]-lane
   row costs ~one scalar descriptor, a [cells, R] multiplicity table
   answers all R slots of a src cell in ONE descriptor — the srcdense
   probe for coarse 6-D levels (mult 50+) would drop from mult_cap
   rounds to 1.

Timing: K dispatches back-to-back + one host fetch (relay floor
amortized), per CLAUDE.md.
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
    ap.add_argument("--queries", type=int, default=27 * 30720,
                    help="descriptor count per probe (default: one "
                         "[27, 30720] split-probe round)")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    Q = args.queries
    rng = np.random.RandomState(0)
    print(f"backend: {jax.default_backend()}  queries/round: {Q}")

    def timeit(fn, *a):
        out = fn(*a)
        np.asarray(out.ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
        np.asarray(out.ravel()[:1])
        return (time.perf_counter() - t0) / args.reps

    @jax.jit
    def scalar_gather(t, q):
        return jnp.sum(t[q], axis=0, keepdims=True)

    print("-- scalar gather: [Q] int32 from [cells] table --")
    for logc in (18, 20, 21, 22, 23, 24, 25, 26):
        cells = 1 << logc
        t = jnp.asarray(rng.randint(0, 100, cells, np.int32))
        q = jnp.asarray(rng.randint(0, cells, Q).astype(np.int32))
        dt = timeit(scalar_gather, t, q)
        print(f"cells 2^{logc} ({cells * 4 / 2 ** 20:6.0f} MB): "
              f"{dt * 1e3:7.2f} ms = {Q / dt / 1e6:6.1f} Mdesc/s")

    @jax.jit
    def row_gather(t, q):
        return jnp.sum(t[q], axis=0, keepdims=True)

    print("-- row gather: [Q, R] int32 from [cells, R] table --")
    for logc, R in ((14, 8), (14, 64), (14, 128),
                    (17, 8), (17, 32), (17, 64), (17, 128),
                    (20, 8), (20, 32), (20, 64),
                    (22, 8), (22, 16)):
        cells = 1 << logc
        t = jnp.asarray(rng.randint(0, 100, (cells, R), np.int32))
        q = jnp.asarray(rng.randint(0, cells, Q).astype(np.int32))
        dt = timeit(row_gather, t, q)
        mb = cells * R * 4 / 2 ** 20
        print(f"cells 2^{logc} x R={R:3d} ({mb:6.0f} MB): "
              f"{dt * 1e3:7.2f} ms = {Q / dt / 1e6:6.1f} Mdesc/s "
              f"({Q * R / dt / 1e6:7.0f} Melem/s)")


if __name__ == "__main__":
    main()
