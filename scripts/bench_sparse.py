"""Sparse-engine TPU benchmark: FCGF + 6D inlier net forward throughput.

Not the driver metric (bench.py owns that) — this measures the
MinkowskiEngine-replacement itself: voxels/sec through the 3D FCGF
backbone and correspondences/sec through the 6D GMF inlier net, plus the
host-side kernel-map build time.

Usage: python scripts/bench_sparse.py [--voxels 30000] [--corrs 5000]
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
    ap.add_argument("--voxels", type=int, default=30000)
    ap.add_argument("--corrs", type=int, default=5000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gmf_tpu.sparse.kernel_map import build_pyramid
    from gmf_tpu.sparse.resunet import (
        FCGFNet, GMFInlierNet, pyramid_to_arrays,
    )

    rng = np.random.RandomState(0)

    # ---- 3D FCGF ----
    extent = int((args.voxels * 8) ** (1 / 3)) + 1
    coords = np.unique(
        rng.randint(0, extent, (args.voxels * 2, 3)).astype(np.int32), axis=0
    )[: args.voxels]
    t0 = time.perf_counter()
    pyr = build_pyramid(coords, 4, conv1_kernel_size=7, granule=4096)
    t_map3 = time.perf_counter() - t0
    arrays = pyramid_to_arrays(pyr)
    cap = pyr.levels[0].cap
    feats = jnp.ones((cap, 1), jnp.float32)
    model = FCGFNet(conv1_kernel_size=7)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats, arrays)
    apply3 = jax.jit(lambda v, f, a: model.apply(v, f, a))
    # block_until_ready does not sync through this box's TPU relay
    # (CLAUDE.md); dispatch iters back-to-back and host-fetch once.
    out = apply3(variables, feats, arrays)
    np.asarray(out[:1, :1])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = apply3(variables, feats, arrays)
    np.asarray(out[:1, :1])
    dt3 = (time.perf_counter() - t0) / args.iters
    print(f"FCGF 3D: {len(coords)} voxels  kernel-maps {t_map3*1e3:.0f} ms "
          f"(host)  forward {dt3*1e3:.1f} ms  "
          f"= {len(coords)/dt3/1e6:.2f} Mvoxel/s")

    # ---- 6D inlier ----
    ext6 = max(int((args.corrs * 4) ** (1 / 6)) + 1, 4)
    coords6 = np.unique(
        rng.randint(0, ext6 * 4, (args.corrs * 2, 6)).astype(np.int32), axis=0
    )[: args.corrs]
    t0 = time.perf_counter()
    pyr6 = build_pyramid(coords6, 4, conv1_kernel_size=3, granule=2048)
    t_map6 = time.perf_counter() - t0
    arrays6 = pyramid_to_arrays(pyr6)
    cap6 = pyr6.levels[0].cap
    feats6 = jnp.ones((cap6, 1), jnp.float32)
    img = jnp.full((1, 120, 160, 3), 0.5, jnp.float32)
    inlier = GMFInlierNet()
    iv = jax.jit(inlier.init)(jax.random.PRNGKey(1), feats6, arrays6,
                              p_image=img, q_image=img)
    apply6 = jax.jit(lambda v, f, a, p, q: inlier.apply(
        v, f, a, p_image=p, q_image=q))
    out = apply6(iv, feats6, arrays6, img, img)
    np.asarray(out[:1, :1])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = apply6(iv, feats6, arrays6, img, img)
    np.asarray(out[:1, :1])
    dt6 = (time.perf_counter() - t0) / args.iters
    k_active = arrays6["self_map_0"].shape[0]
    print(f"GMF 6D inlier: {len(coords6)} corr voxels  active offsets "
          f"{k_active}/729  kernel-maps {t_map6*1e3:.0f} ms (host)  "
          f"forward {dt6*1e3:.1f} ms  = {len(coords6)/dt6/1e3:.1f} kcorr/s")


if __name__ == "__main__":
    main()
