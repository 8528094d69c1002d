"""Gather-strategy shootout for the seed-kNN [B,S,k,*] gathers.

r4 finding: the three gathers feeding spectral+Kabsch cost 34.3 ms of its
55 ms at the default eval shape (B=64, N=5000, S=500, k=40) — more than
the spectral math itself. Candidates:

  A. vmap row gather (live path): vmap(lambda xb, ib: xb[ib])
  B. flat 2D gather: reshape to [B*N, C], global row indices
  C. coords packed into the feature array's lane padding (bf16 hi+lo
     split so f32 precision survives a bf16 gather)
  D. one-hot matmul for the coords (MXU instead of gather unit)
  E. Pallas one-hot gather-matmul for coords
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, fetch, iters=5, warmup=2):
    for _ in range(warmup):
        fetch(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--num-corr", type=int, default=5000)
    ap.add_argument("--k", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    B, N, k = args.batch, args.num_corr, args.k
    S = int(N * 0.1)
    C = 128

    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (B, N, C), jnp.bfloat16)
    src = jax.random.uniform(key, (B, N, 3), jnp.float32) * 3
    tgt = src + 0.05 * jax.random.normal(key, (B, N, 3), jnp.float32)
    idx = jax.random.randint(key, (B, S, k), 0, N, jnp.int32)

    gather = jax.vmap(lambda xb, ib: xb[ib])

    # A: live path
    @jax.jit
    def gA(feats, src, tgt, idx):
        return gather(feats, idx), gather(src, idx), gather(tgt, idx)

    dt, ref = timeit(lambda: gA(feats, src, tgt, idx),
                     lambda o: np.asarray(o[0][0, 0, 0]), iters=args.iters)
    print(f"A vmap gather (live)        : {dt*1e3:8.1f} ms")

    @jax.jit
    def gA_feats(feats, idx):
        return gather(feats, idx)

    dt, _ = timeit(lambda: gA_feats(feats, idx),
                   lambda o: np.asarray(o[0, 0, 0]), iters=args.iters)
    print(f"A  feats only               : {dt*1e3:8.1f} ms")

    @jax.jit
    def gA_coords(src, tgt, idx):
        return gather(src, idx), gather(tgt, idx)

    dt, _ = timeit(lambda: gA_coords(src, tgt, idx),
                   lambda o: np.asarray(o[0][0, 0, 0]), iters=args.iters)
    print(f"A  coords only (2x [.,3])   : {dt*1e3:8.1f} ms")

    # B: flat 2D gather with global row ids
    @jax.jit
    def gB(feats, src, tgt, idx):
        rows = (idx + (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
                ).reshape(-1)
        f = feats.reshape(B * N, C)[rows].reshape(B, S, k, C)
        s = src.reshape(B * N, 3)[rows].reshape(B, S, k, 3)
        t = tgt.reshape(B * N, 3)[rows].reshape(B, S, k, 3)
        return f, s, t

    dt, o = timeit(lambda: gB(feats, src, tgt, idx),
                   lambda o: np.asarray(o[0][0, 0, 0]), iters=args.iters)
    print(f"B flat 2D gather            : {dt*1e3:8.1f} ms")
    for a, b in zip(ref, o):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # B2: flat coords gather from a packed [B*N, 8] f32 array
    @jax.jit
    def gB2(src, tgt, idx):
        packed = jnp.concatenate(
            [src, tgt, jnp.zeros((B, N, 2), jnp.float32)], -1
        ).reshape(B * N, 8)
        rows = (idx + (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
                ).reshape(-1)
        g = packed[rows].reshape(B, S, k, 8)
        return g[..., :3], g[..., 3:6]

    dt, o = timeit(lambda: gB2(src, tgt, idx),
                   lambda o: np.asarray(o[0][0, 0, 0]), iters=args.iters)
    print(f"B2 packed [.,8] coords      : {dt*1e3:8.1f} ms")

    # C: ONE gather — coords packed into feature lanes as bf16 hi+lo
    @jax.jit
    def gC(feats, src, tgt, idx):
        co = jnp.concatenate([src, tgt], -1)              # [B,N,6] f32
        hi = co.astype(jnp.bfloat16)
        lo = (co - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        packed = jnp.concatenate(
            [feats, hi, lo, jnp.zeros((B, N, 116), jnp.bfloat16)], -1)
        rows = (idx + (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
                ).reshape(-1)
        g = packed.reshape(B * N, 256)[rows].reshape(B, S, k, 256)
        f = g[..., :C]
        co = (g[..., C:C + 6].astype(jnp.float32)
              + g[..., C + 6:C + 12].astype(jnp.float32))
        return f, co[..., :3], co[..., 3:]

    dt, o = timeit(lambda: gC(feats, src, tgt, idx),
                   lambda o: np.asarray(o[0][0, 0, 0]), iters=args.iters)
    print(f"C packed 256-lane hi+lo     : {dt*1e3:8.1f} ms")
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(o[0]))
    err = float(jnp.max(jnp.abs(o[1] - ref[1])))
    print(f"   coord err (hi+lo)        : {err:.2e}")

    # C2: 128+16 lanes (pad to 144? -> 256 anyway on bf16 tiles); try a
    # separate [B*N, 128] coord plane: f32 coords padded to 128 lanes
    @jax.jit
    def gC2(src, tgt, idx):
        co = jnp.concatenate(
            [src, tgt, jnp.zeros((B, N, 122), jnp.float32)], -1)
        rows = (idx + (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
                ).reshape(-1)
        g = co.reshape(B * N, 128)[rows].reshape(B, S, k, 128)
        return g[..., :3], g[..., 3:6]

    dt, _ = timeit(lambda: gC2(src, tgt, idx),
                   lambda o: np.asarray(o[0][0, 0, 0]), iters=args.iters)
    print(f"C2 coords padded to 128 f32 : {dt*1e3:8.1f} ms")

    # D: one-hot matmul for coords (XLA, blocked over N to bound memory)
    @jax.jit
    def gD(src, tgt, idx):
        co = jnp.concatenate([src, tgt], -1)  # [B,N,6]
        fl = idx.reshape(B, S * k)

        def one(co_b, idx_b):
            # [Sk, N] one-hot in bf16 via compare, matmul on MXU
            oh = (idx_b[:, None] == jnp.arange(N, dtype=jnp.int32)[None]
                  ).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                oh, co_b.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        # sequential over B: the [Sk, N] one-hot is 200 MB bf16 per batch
        # element; a vmapped version would materialize 12.8 GB
        out = jax.lax.map(lambda ab: one(*ab), (co, fl)).reshape(B, S, k, 6)
        return out[..., :3], out[..., 3:]

    dt, o = timeit(lambda: gD(src, tgt, idx),
                   lambda o: np.asarray(o[0][0, 0, 0]), iters=args.iters)
    print(f"D one-hot matmul coords     : {dt*1e3:8.1f} ms")
    err = float(jnp.max(jnp.abs(o[0] - ref[1])))
    print(f"   coord err (bf16 matmul)  : {err:.2e}")


if __name__ == "__main__":
    main()
