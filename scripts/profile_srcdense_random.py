"""Per-probe A/B of the 6-D pyramid build under ORACLE vs RANDOM match
multiplicity statistics at KITTI LiDAR scale (VERDICT r4 item 1: the
rowmode-for-random regression, 8.64 vs 7.73 s/pair, was unexplained).

For each regime (oracle / random matches) x rowmode-min (off / 2) this
script prints the per-level src-multiplicity DISTRIBUTION (not just the
max — the tier choice keys on the max, but the COST keys on the mean:
a row-mode table pays mult_cap gather slots for every descriptor, so a
skewed distribution with mean << cap wastes proportionally), the tier
each probe actually takes (GMF_PROBE_PROFILE=1), and the warm
full-pyramid build time.

Usage: python scripts/profile_srcdense_random.py [--pts 120000]
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
    ap.add_argument("--pts", type=int, default=120000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gmf_tpu.models.dgr import DGRConfig
    from gmf_tpu.sparse.device_maps import build_pyramid_arrays_device
    from gmf_tpu.sparse.kernel_map import downsample_coords
    from gmf_tpu.sparse.voxelize import sparse_quantize

    cfg = DGRConfig(voxel_size=0.3)  # KITTI preset voxel
    rng = np.random.RandomState(0)

    # the profile_dgr_register --kitti lidar cloud: ground rings + clusters
    n_gr = int(args.pts * 0.7)
    n_cl = args.pts - n_gr
    r_max = 40.0
    rr = r_max * np.sqrt(rng.rand(n_gr))
    th = 2 * np.pi * rng.rand(n_gr)
    grd = np.stack([rr * np.cos(th), rr * np.sin(th),
                    0.05 * rng.randn(n_gr)], axis=1)
    n_clusters = 60
    centers = np.stack([
        (2.0 + (r_max - 5.0) * rng.rand(n_clusters)) *
        np.cos(2 * np.pi * rng.rand(n_clusters)),
        (2.0 + (r_max - 5.0) * rng.rand(n_clusters)) *
        np.sin(2 * np.pi * rng.rand(n_clusters)),
        np.zeros(n_clusters)], axis=1)
    ci = rng.randint(0, n_clusters, n_cl)
    cl = centers[ci] + np.stack([
        0.8 * rng.randn(n_cl), 0.8 * rng.randn(n_cl),
        4.0 * rng.rand(n_cl)], axis=1)
    xyz0 = np.concatenate([grd, cl], axis=0).astype(np.float32)
    ang = 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([0.3, -0.2, 0.4], np.float32)
    xyz1 = (xyz0 @ R.T + t + 0.3 * cfg.voxel_size *
            rng.randn(args.pts, 3)).astype(np.float32)

    c0, s0 = sparse_quantize(xyz0, cfg.voxel_size, return_index=True)
    c1, s1 = sparse_quantize(xyz1, cfg.voxel_size, return_index=True)
    from scipy.spatial import cKDTree

    warped = (xyz0[s0] @ R.T + t) / cfg.voxel_size
    nn_oracle = cKDTree(c1.astype(np.float64)).query(warped)[1]
    nn_random = rng.randint(0, len(c1), len(c0))
    print(f"backend {jax.default_backend()}  voxels {len(c0)}")

    for regime, nn01 in (("oracle", nn_oracle), ("random", nn_random)):
        corr6d = np.concatenate([c0, c1[nn01]], axis=1)
        uniq, _ = sparse_quantize(corr6d.astype(np.float64), 1.0)
        uniq = uniq.astype(np.int32)
        # per-level src multiplicity distribution
        lc = [uniq]
        for l in range(1, 4):
            lc.append(downsample_coords(lc[l - 1], 2, 2 ** (l - 1)))
        print(f"\n=== {regime}: uniq6d {len(uniq)} ===")
        for l, c in enumerate(lc):
            _, counts = np.unique(c[:, :3], axis=0, return_counts=True)
            q = np.percentile(counts, [50, 90, 99])
            print(f"  level {l}: n={len(c)} src-mult mean={counts.mean():.2f} "
                  f"p50={q[0]:.0f} p90={q[1]:.0f} p99={q[2]:.0f} "
                  f"max={counts.max()}")
        for rowmin in (None, "2"):
            if rowmin is None:
                os.environ.pop("GMF_SRCDENSE_ROWMODE_MIN", None)
            else:
                os.environ["GMF_SRCDENSE_ROWMODE_MIN"] = rowmin
            label = f"rowmode-min={rowmin or 'off'}"
            os.environ["GMF_PROBE_PROFILE"] = "1"
            print(f"--- {regime} {label} (per-probe, cold-ish) ---")
            t0 = time.perf_counter()
            arrays = build_pyramid_arrays_device(
                uniq, 4, conv1_kernel_size=3,
                granule=cfg.corr_cap_granule)
            import jax.numpy as jnp

            for leaf in jax.tree_util.tree_leaves(arrays):
                jax.device_get(jnp.ravel(leaf)[:1])  # sync, tiny fetch
            print(f"  first build {time.perf_counter() - t0:.2f} s")
            os.environ["GMF_PROBE_PROFILE"] = "0"
            ts = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                arrays = build_pyramid_arrays_device(
                    uniq, 4, conv1_kernel_size=3,
                    granule=cfg.corr_cap_granule)
                for leaf in jax.tree_util.tree_leaves(arrays):
                    jax.device_get(jnp.ravel(leaf)[:1])
                ts.append(time.perf_counter() - t0)
            print(f"  warm build: {min(ts):.2f} s  (runs: "
                  + ", ".join(f"{x:.2f}" for x in ts) + ")")
            # per-probe timings with every executable warm (the cold
            # pass above pays remote compiles, occasionally minutes)
            os.environ["GMF_PROBE_PROFILE"] = "1"
            print(f"--- {regime} {label} (per-probe, WARM) ---")
            arrays = build_pyramid_arrays_device(
                uniq, 4, conv1_kernel_size=3,
                granule=cfg.corr_cap_granule)
            for leaf in jax.tree_util.tree_leaves(arrays):
                jax.device_get(jnp.ravel(leaf)[:1])
            os.environ["GMF_PROBE_PROFILE"] = "0"


if __name__ == "__main__":
    main()
