"""Sub-component timing of the seed-local spectral + Kabsch block.

The r4 breakdown (scripts/profile_pointdsc_breakdown.py) puts
spectral+Kabsch at ~55 ms/batch — the #2 component of the eval forward
after the flash stack. This script measures its internals at the default
eval shape (B=64, N=5000, S=500, k=40, C=128) to locate the time:

  - the three [B,S,k,*] gathers
  - feat_M einsum ([BS,k,C] @ [BS,C,k])
  - spatial_M: diff-norm ([B,S,k,k,3] intermediates) vs Gram formulation
  - power iteration: while_loop early-exit vs fixed fori_loop
  - Horn-quaternion Kabsch
  - candidate fused variants

All timings host-fetch-synced (tunnel block_until_ready is unreliable).
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
    dt = (time.perf_counter() - t0) / iters
    return dt, out


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

    from gmf_tpu.geometry.kabsch import rigid_transform_3d
    from gmf_tpu.geometry.spectral import (leading_eigenvector,
                                           leading_eigenvector_fixed)

    B, N, k = args.batch, args.num_corr, args.k
    S = int(N * 0.1)
    C = 128
    dtype = jnp.bfloat16
    _PREC = jax.lax.Precision.HIGHEST

    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (B, N, C), dtype)
    feats = feats / jnp.sqrt(
        jnp.sum(feats.astype(jnp.float32) ** 2, -1, keepdims=True)
    ).astype(dtype)
    src = jax.random.uniform(key, (B, N, 3), jnp.float32) * 3
    tgt = src + 0.05 * jax.random.normal(key, (B, N, 3), jnp.float32)
    knn_idx = jax.random.randint(key, (B, S, k), 0, N, jnp.int32)
    sigma = jnp.ones((B, 1, 1), jnp.float32)

    gather = jax.vmap(lambda xb, ib: xb[ib])

    # -- gathers ----------------------------------------------------------
    @jax.jit
    def gathers(feats, src, tgt, knn_idx):
        return (gather(feats, knn_idx), gather(src, knn_idx),
                gather(tgt, knn_idx))

    dt, (knn_features, src_knn, tgt_knn) = timeit(
        lambda: gathers(feats, src, tgt, knn_idx),
        lambda o: np.asarray(o[0][0, 0, 0]), iters=args.iters)
    print(f"gathers [B,S,k,*] x3        : {dt*1e3:8.1f} ms")

    # -- feat_M -----------------------------------------------------------
    @jax.jit
    def featM(knn_features, sigma):
        M = jnp.einsum("bskc,bsjc->bskj", knn_features, knn_features,
                       precision=_PREC)
        return jnp.clip(1.0 - (1.0 - M) / sigma[..., None] ** 2, 0.0, None)

    dt, fM = timeit(lambda: featM(knn_features, sigma),
                    lambda o: np.asarray(o[0, 0, 0]), iters=args.iters)
    print(f"feat_M einsum               : {dt*1e3:8.1f} ms")

    # -- spatial_M: diff-norm (live path) vs Gram -------------------------
    @jax.jit
    def spatial_diff(src_knn, tgt_knn):
        src_d = jnp.linalg.norm(
            src_knn[:, :, :, None, :] - src_knn[:, :, None, :, :], axis=-1)
        tgt_d = jnp.linalg.norm(
            tgt_knn[:, :, :, None, :] - tgt_knn[:, :, None, :, :], axis=-1)
        return jnp.clip(1.0 - (src_d - tgt_d) ** 2 / 0.01, 0.0, None)

    dt, sM = timeit(lambda: spatial_diff(src_knn, tgt_knn),
                    lambda o: np.asarray(o[0, 0, 0]), iters=args.iters)
    print(f"spatial_M (diff-norm)       : {dt*1e3:8.1f} ms")

    @jax.jit
    def spatial_gram(src_knn, tgt_knn):
        def pd(x):
            r = jnp.sum(x * x, axis=-1)
            g = jnp.einsum("bski,bsji->bskj", x, x, precision=_PREC)
            d2 = jnp.maximum(r[..., :, None] + r[..., None, :] - 2 * g, 0.0)
            return jnp.sqrt(d2)

        src_d = pd(src_knn)
        tgt_d = pd(tgt_knn)
        return jnp.clip(1.0 - (src_d - tgt_d) ** 2 / 0.01, 0.0, None)

    dt, sM2 = timeit(lambda: spatial_gram(src_knn, tgt_knn),
                     lambda o: np.asarray(o[0, 0, 0]), iters=args.iters)
    print(f"spatial_M (gram matmul)     : {dt*1e3:8.1f} ms")

    # -- total_M + power iteration ---------------------------------------
    totalM = (fM * sM * (1.0 - jnp.eye(k))).reshape(B * S, k, k)
    totalM = jax.device_put(totalM)

    for name, eig in (("while early-exit", leading_eigenvector),
                      ("fixed fori",       leading_eigenvector_fixed)):
        f = jax.jit(lambda M, e=eig: e(M, num_iters=10))
        dt, w = timeit(lambda: f(totalM), lambda o: np.asarray(o[0, 0]),
                       iters=args.iters)
        print(f"power iter ({name:<16}): {dt*1e3:8.1f} ms")

    # -- Kabsch -----------------------------------------------------------
    w = leading_eigenvector_fixed(totalM, num_iters=10)
    w = w / (jnp.sum(w, -1, keepdims=True) + 1e-6)
    A = src_knn.reshape(B * S, k, 3)
    Bm = tgt_knn.reshape(B * S, k, 3)

    kb = jax.jit(lambda a, b, ww: rigid_transform_3d(a, b, ww,
                                                     method="quat"))
    dt, _ = timeit(lambda: kb(A, Bm, w), lambda o: np.asarray(o[0]),
                   iters=args.iters)
    print(f"Kabsch (Horn quat)          : {dt*1e3:8.1f} ms")

    # -- end-to-end block (live composition, while-loop eig) --------------
    def block(knn_features, src_knn, tgt_knn, sigma, eig):
        M = jnp.einsum("bskc,bsjc->bskj", knn_features, knn_features,
                       precision=_PREC)
        M = jnp.clip(1.0 - (1.0 - M) / sigma[..., None] ** 2, 0.0, None)
        sM = spatial_diff.__wrapped__(src_knn, tgt_knn)
        tM = (M * sM * (1.0 - jnp.eye(k, dtype=M.dtype))).reshape(
            B * S, k, k)
        ww = eig(tM, num_iters=10)
        ww = ww / (jnp.sum(ww, -1, keepdims=True) + 1e-6)
        return rigid_transform_3d(
            src_knn.reshape(B * S, k, 3), tgt_knn.reshape(B * S, k, 3),
            ww, method="quat").reshape(B, S, 4, 4)

    for name, eig in (("while", leading_eigenvector),
                      ("fixed", leading_eigenvector_fixed)):
        f = jax.jit(lambda kf, sk, tk, sg, e=eig: block(kf, sk, tk, sg, e))
        dt, _ = timeit(lambda: f(knn_features, src_knn, tgt_knn, sigma),
                       lambda o: np.asarray(o[0, 0]), iters=args.iters)
        print(f"full block ({name} eig)      : {dt*1e3:8.1f} ms")

    # -- f32 gathers variant (bf16 features dominate gather bytes) --------
    def block_gram(knn_features, src_knn, tgt_knn, sigma, eig):
        M = jnp.einsum("bskc,bsjc->bskj", knn_features, knn_features,
                       precision=_PREC)
        M = jnp.clip(1.0 - (1.0 - M) / sigma[..., None] ** 2, 0.0, None)
        sM = spatial_gram.__wrapped__(src_knn, tgt_knn)
        tM = (M * sM * (1.0 - jnp.eye(k, dtype=M.dtype))).reshape(
            B * S, k, k)
        ww = eig(tM, num_iters=10)
        ww = ww / (jnp.sum(ww, -1, keepdims=True) + 1e-6)
        return rigid_transform_3d(
            src_knn.reshape(B * S, k, 3), tgt_knn.reshape(B * S, k, 3),
            ww, method="quat").reshape(B, S, 4, 4)

    f = jax.jit(lambda kf, sk, tk, sg: block_gram(
        kf, sk, tk, sg, leading_eigenvector_fixed))
    dt, _ = timeit(lambda: f(knn_features, src_knn, tgt_knn, sigma),
                   lambda o: np.asarray(o[0, 0]), iters=args.iters)
    print(f"full block (gram+fixed)     : {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
