"""Microbench: TPU scatter-add strategies for the compacted sparse conv.

The compact conv's structure is gather -> batched GEMM -> scatter-add
(rows of [Cout] accumulated into an [M, Cout] output). Whether that
scatter runs at HBM speed or serializes decides the design, so measure:

  gather   — baseline: R row-gathers of [C] (the thing we know is fast)
  flat     — one scatter-add of R rows with COLLIDING indices
  rowwise  — scan over K offset rows; each step scatters L unique sorted
             indices (collisions only ACROSS steps, handled by the scan)
  combine  — gather-based: out-major index table [M, P] into the flat
             z buffer, gather + sum over P (no scatter at all)

Timing uses a host fetch as the sync point (block_until_ready is not
trustworthy through this box's TPU tunnel — see CLAUDE.md).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, reps=5):
    import jax

    out = fn(*args)          # compile
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=22016, help="output rows")
    ap.add_argument("--k", type=int, default=256, help="offset rows")
    ap.add_argument("--l", type=int, default=2048, help="cols per offset")
    ap.add_argument("--c", type=int, default=128, help="channels")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    M, K, L, C = args.m, args.k, args.l, args.c
    R = K * L
    rng = np.random.RandomState(0)
    # unique sorted indices per offset row (like a compacted kernel map)
    idx2d = np.sort(
        np.stack([rng.choice(M, size=L, replace=False) for _ in range(K)]),
        axis=1).astype(np.int32)
    z2d = jnp.asarray(rng.randn(K, L, C).astype(np.float32))
    idx2d_j = jnp.asarray(idx2d)
    flat_idx = jnp.asarray(idx2d.reshape(-1))
    zflat = z2d.reshape(R, C)

    @jax.jit
    def gather(i, x):
        return x[i]

    @jax.jit
    def flat_scatter(i, z):
        return jnp.zeros((M, C), jnp.float32).at[i].add(z)

    @jax.jit
    def rowwise(i2, z):
        def body(acc, a):
            ii, zz = a
            return acc.at[ii].add(zz, unique_indices=True,
                                  indices_are_sorted=True), None
        acc, _ = jax.lax.scan(body, jnp.zeros((M, C), jnp.float32), (i2, z))
        return acc

    # out-major combine table: P = bucketed max hits per output row
    hits = np.bincount(idx2d.reshape(-1), minlength=M)
    P = 1 << int(np.ceil(np.log2(max(hits.max(), 1))))
    pos = np.full((M, P), R, np.int32)
    cnt = np.zeros(M, np.int32)
    flat = idx2d.reshape(-1)
    order = np.argsort(flat, kind="stable")
    sf = flat[order]
    starts = np.r_[0, np.nonzero(np.diff(sf))[0] + 1]
    uniq = sf[starts]
    seg_len = np.diff(np.r_[starts, R])
    for u, s, n in zip(uniq, starts, seg_len):
        pos[u, :n] = order[s:s + n]
    pos_j = jnp.asarray(pos)

    @jax.jit
    def combine(p, z):
        zs = jnp.concatenate([z, jnp.zeros((1, C), z.dtype)], 0)
        return jnp.sum(zs[p], axis=1)          # [M, P, C] -> [M, C]

    print(f"backend={jax.default_backend()} M={M} K={K} L={L} C={C} "
          f"R={R / 1e6:.2f}M rows  P={P}")
    tg = timeit(gather, flat_idx, jnp.zeros((M, C), jnp.float32))
    print(f"gather  : {tg * 1e3:8.2f} ms  {R / tg / 1e6:8.1f} Mrow/s")
    tf = timeit(flat_scatter, flat_idx, zflat)
    print(f"flat    : {tf * 1e3:8.2f} ms  {R / tf / 1e6:8.1f} Mrow/s")
    tr = timeit(rowwise, idx2d_j, z2d)
    print(f"rowwise : {tr * 1e3:8.2f} ms  {R / tr / 1e6:8.1f} Mrow/s")
    tc = timeit(combine, pos_j, zflat)
    print(f"combine : {tc * 1e3:8.2f} ms  {M * P / tc / 1e6:8.1f} Mrow/s "
          f"({M * P / 1e6:.2f}M gathered rows)")

    # correctness cross-check
    a = flat_scatter(flat_idx, zflat)
    b = rowwise(idx2d_j, z2d)
    c = combine(pos_j, zflat)
    print("max|flat-rowwise| =", float(jnp.max(jnp.abs(a - b))),
          " max|flat-combine| =", float(jnp.max(jnp.abs(a - c))))


if __name__ == "__main__":
    main()
