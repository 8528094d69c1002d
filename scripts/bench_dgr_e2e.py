"""End-to-end DGR+GMF register() timing (synthetic pair, full-size nets).

Measures the complete inference pipeline of
GMF_DGR_fcgf/core/deep_global_registration.py:281-410 — voxelize ->
FCGF features x2 -> 1-NN matching -> 6D inlier net with image fusion ->
weighted Procrustes + SE(3) refinement — including all host work
(voxelization, kernel-map construction unless --device-maps on).

Usage:
  python scripts/bench_dgr_e2e.py --pts 40000 --device-maps on --runs 2

Prints per-stage warm timings and one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pts", type=int, default=40000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--device-maps", choices=["auto", "on", "off"],
                    default="auto")
    ap.add_argument("--cloud", choices=["uniform", "surface", "lidar"],
                    default="uniform",
                    help="uniform box (worst case: pyramid levels barely "
                         "merge), a heightfield surface (realistic scan "
                         "geometry: coarser levels shrink like 3DMatch), "
                         "or a LiDAR sweep (KITTI-like: ~100 m annulus, "
                         "1/r density, flat ground + vertical clutter — "
                         "the realistic voxel-frame shape for --kitti)")
    ap.add_argument("--matches", choices=["fcgf", "oracle"],
                    default="fcgf",
                    help="fcgf: real 1-NN over the (untrained) descriptor "
                         "features — matches are ~random, so the 6-D "
                         "pyramid levels barely merge (worst case). "
                         "oracle: plant ground-truth-correlated matches "
                         "to reproduce the kernel-map workload a TRAINED "
                         "descriptor yields (the production regime); the "
                         "FCGF forwards and every other stage still run.")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="small nets + small pair (smoke)")
    ap.add_argument("--kitti", action="store_true",
                    help="KITTI preset: voxel 0.3, FCGF conv1=5 "
                         "(config_Kitti.py:49,97), 120k-point lidar-scale "
                         "cloud (scripts/test_kitti.py protocol)")
    ap.add_argument("--compact", default=None, choices=["on", "off"],
                    help="force compact_inlier_conv (default: DGRConfig "
                         "auto)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 sparse-net compute (halves the conv "
                         "gather HBM traffic; geometry stays f32)")
    ap.add_argument("--overlap", type=int, default=0,
                    help="also measure eval-set WALL throughput with K "
                         "register() calls in flight (the test_dgr CLI "
                         "--overlap pipeline: pair k+1's host phases "
                         "run while pair k waits on device fetches)")
    ap.add_argument("--frag-cache", type=int, default=0,
                    help="per-fragment feature-cache budget in MB for the "
                         "--overlap measurement. Pairs then walk a "
                         "fragment CHAIN (f_k, f_k+1) — the 3DMatch "
                         "gt.log access pattern, where every pair "
                         "introduces exactly one new fragment and reuses "
                         "one cached fragment (never the same pair twice, "
                         "so the cache can't fake the workload)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gmf_tpu.models.dgr import DGRConfig, DeepGlobalRegistration
    from gmf_tpu.sparse.kernel_map import build_pyramid
    from gmf_tpu.sparse.resunet import (
        FCGFNet, GMFInlierNet, SparseResUNet2, pyramid_to_arrays,
    )

    print(f"backend: {jax.default_backend()}")
    dev_maps = {"auto": None, "on": True, "off": False}[args.device_maps]
    cmp_conv = (None if args.compact is None else args.compact == "on")

    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.tiny:
        args.pts = 2000
        cfg = DGRConfig(voxel_size=0.1, voxel_cap_granule=512,
                        corr_cap_granule=512, image_hw=(16, 16),
                        device_kernel_maps=dev_maps,
                        compact_inlier_conv=cmp_conv)
        fcgf = SparseResUNet2(
            in_channels=1, out_channels=8, dim=3, conv1_kernel_size=7,
            normalize_feature=True, channels=(4, 8, 16, 32),
            tr_channels=(8, 8, 8, 16), dtype=dt)
        inlier = SparseResUNet2(
            in_channels=1, out_channels=1, dim=6, conv1_kernel_size=3,
            with_gmf_fusion=True, image_dim=16, channels=(4, 8, 16, 32),
            tr_channels=(8, 8, 8, 16), dtype=dt)
    elif args.kitti:
        # KITTI deltas (config_Kitti.py:49,97): voxel 0.3, feat conv1=5
        if args.pts == 40000:
            args.pts = 120000
        cfg = DGRConfig(voxel_size=0.3, device_kernel_maps=dev_maps,
                        compact_inlier_conv=cmp_conv)
        fcgf = FCGFNet(conv1_kernel_size=5, dtype=dt)
        inlier = GMFInlierNet(dtype=dt)
    else:
        cfg = DGRConfig(device_kernel_maps=dev_maps,
                        compact_inlier_conv=cmp_conv)
        fcgf = FCGFNet(conv1_kernel_size=7, dtype=dt)
        inlier = GMFInlierNet(dtype=dt)
    H, W = cfg.image_hw

    rng = np.random.RandomState(0)
    if args.cloud == "lidar":
        # KITTI-like sweep: annulus footprint with ~1/r point density
        # (uniform in r after sqrt-free inverse sampling), flat ground
        # plus clusters of vertical structure. The voxel frame comes out
        # wide and FLAT (~300 x 300 x 25 lattice cells at voxel 0.3),
        # which is the regime real scripts/test_kitti.py pairs occupy.
        r_max = 50.0
        n_grd = int(args.pts * 0.7)
        r = 2.0 + (r_max - 2.0) * rng.rand(n_grd)     # ~1/r area density
        th = 2 * np.pi * rng.rand(n_grd)
        grd = np.stack([r * np.cos(th), r * np.sin(th),
                        0.05 * rng.randn(n_grd)], axis=1)
        n_cl = args.pts - n_grd
        n_clusters = 40
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
    elif args.cloud == "surface":
        # heightfield: a 2-D manifold like a depth-camera scan
        side = (args.pts * 0.9) ** 0.5 * cfg.voxel_size
        xy = rng.rand(args.pts, 2) * side
        z = (0.3 * side * (np.sin(xy[:, 0] * 4 / side)
                           + np.cos(xy[:, 1] * 5 / side)))
        xyz0 = np.concatenate([xy, z[:, None]], 1).astype(np.float32)
    else:
        # uniform box sized so ~0.7 * pts voxels survive
        box = (args.pts * 0.7) ** (1 / 3) * cfg.voxel_size
        xyz0 = (rng.rand(args.pts, 3) * box).astype(np.float32)
    ang = 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([0.3, -0.2, 0.4], np.float32)
    xyz1 = (xyz0 @ R.T + t + 0.3 * cfg.voxel_size *
            rng.randn(args.pts, 3)).astype(np.float32)
    p_img = np.zeros((1, H, W, 3), np.float32)
    q_img = np.zeros((1, H, W, 3), np.float32)

    # init params at small shapes (params are shape-independent)
    c3 = np.unique(rng.randint(0, 10, (200, 3)).astype(np.int32), axis=0)
    a3 = pyramid_to_arrays(build_pyramid(c3, 4, conv1_kernel_size=7,
                                         granule=256))
    fv = jax.jit(fcgf.init)(jax.random.PRNGKey(0),
                            jnp.ones((a3["mask_0"].shape[0], 1)), a3)
    c6 = np.unique(rng.randint(0, 6, (150, 6)).astype(np.int32), axis=0)
    a6 = pyramid_to_arrays(build_pyramid(c6, 4, conv1_kernel_size=3,
                                         granule=256))
    iv = jax.jit(inlier.init)(
        jax.random.PRNGKey(1), jnp.ones((a6["mask_0"].shape[0], 1)), a6,
        p_image=jnp.asarray(p_img), q_image=jnp.asarray(q_img))
    engine = DeepGlobalRegistration(fv, iv, cfg, fcgf_model=fcgf,
                                    inlier_model=inlier,
                                    frag_cache_bytes=args.frag_cache << 20)
    print(f"device_maps: {cfg.use_device_maps()}")

    if args.matches == "oracle":
        # Trained-descriptor simulation: the true correspondence of src
        # voxel i is the nearest tgt voxel of its GT-warped position.
        # The 1-NN stage is swapped for this precomputed oracle (its real
        # cost is measured by the default mode); FCGF forwards, 6-D
        # build, inlier net and the fused solve all run unchanged, so
        # the timing reflects the kernel-map workload of CORRELATED
        # matches — what a trained descriptor produces — instead of the
        # random matches untrained weights give.
        from scipy.spatial import cKDTree

        import gmf_tpu.models.dgr as dgr_mod

        c0, sel0 = engine.preprocess(xyz0)
        c1, _ = engine.preprocess(xyz1)
        warped = (xyz0[sel0] @ R.T + t) / cfg.voxel_size
        _, oracle_idx = cKDTree(c1.astype(np.float64)).query(warped)
        oracle_idx = oracle_idx.astype(np.int32)

        import threading

        _tl = threading.local()

        def fake_nn(F0_dev, F1_masked, chunk=2048):
            # chain mode installs a per-pair oracle via the thread-local
            # (each register() runs wholly inside one overlap thread);
            # the single-pair loops fall back to the main-pair oracle
            idx = getattr(_tl, "oracle", oracle_idx)
            idx_full = np.zeros(F0_dev.shape[0], np.int32)
            idx_full[: len(idx)] = idx
            return jnp.asarray(idx_full), None

        dgr_mod.nearest_neighbor = fake_nn

    t0 = time.perf_counter()
    res = engine.register(xyz0, xyz1, p_img, q_img)
    cold = time.perf_counter() - t0
    print(f"cold register(): {cold:.1f} s "
          f"(safeguard={res['used_safeguard']})")

    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        res = engine.register(xyz0, xyz1, p_img, q_img)
        times.append(time.perf_counter() - t0)
    warm = min(times)

    # stage breakdown on warm state
    t0 = time.perf_counter()
    coords0, sel0 = engine.preprocess(xyz0)
    t_vox = time.perf_counter() - t0
    t0 = time.perf_counter()
    F0 = engine.fcgf_features(coords0)
    t_fcgf = time.perf_counter() - t0
    coords1, sel1 = engine.preprocess(xyz1)
    F1 = engine.fcgf_features(coords1)
    t0 = time.perf_counter()
    nn01 = engine.feature_matching(F0, F1)
    t_match = time.perf_counter() - t0
    corr6d = np.concatenate([coords0, coords1[nn01]], axis=1)
    t0 = time.perf_counter()
    engine.inlier_prediction(corr6d, p_img, q_img)
    t_inlier = time.perf_counter() - t0

    print(f"voxels: {len(coords0)} / {len(coords1)}")
    print(f"warm register(): {warm:.2f} s   (runs: "
          + ", ".join(f"{x:.2f}" for x in times) + ")")
    print(f"  voxelize      {t_vox:.2f} s")
    print(f"  fcgf feats    {t_fcgf:.2f} s (one cloud)")
    print(f"  1-NN match    {t_match:.2f} s")
    print(f"  inlier net    {t_inlier:.2f} s (6D pyramid + fwd)")

    wall_per_pair = None
    if args.overlap > 1:
        from concurrent.futures import ThreadPoolExecutor

        n_jobs = max(2 * args.runs, 4)
        if args.frag_cache:
            # fragment chain f_0..f_n: pair k = (f_k, f_k+1). Every pair
            # is distinct and introduces one new fragment, so a cache hit
            # saves exactly the per-fragment reuse a real eval set gets.
            frags = [xyz0]
            for _ in range(n_jobs):
                frags.append(
                    (frags[-1] @ R.T + t + 0.3 * cfg.voxel_size
                     * rng.randn(args.pts, 3)).astype(np.float32))
            oracles = None
            if args.matches == "oracle":
                from scipy.spatial import cKDTree as _KD

                oracles = []
                for k in range(n_jobs):
                    ck, sk = engine.preprocess(frags[k])
                    ck1, _ = engine.preprocess(frags[k + 1])
                    wp = (frags[k][sk] @ R.T + t) / cfg.voxel_size
                    _, oi = _KD(ck1.astype(np.float64)).query(wp)
                    oracles.append(oi.astype(np.int32))

            def do_pair(k):
                if oracles is not None:
                    _tl.oracle = oracles[k]
                return engine.register(
                    frags[k], frags[k + 1], p_img, q_img,
                    cache_key0=str(k), cache_key1=str(k + 1))

            # untimed warm pass over the whole chain (bucket compiles —
            # a real eval amortizes these over ~1600 pairs), then reset
            # the cache to exactly one fragment so the timed pass walks
            # the true steady-state pattern: every pair hits one cached
            # fragment and computes one new one.
            tw = time.perf_counter()
            for k in range(n_jobs):
                do_pair(k)
            print(f"chain warm pass: {time.perf_counter() - tw:.1f} s "
                  f"(untimed)")
            engine.reset_frag_cache()
            engine.seed_fragment(frags[0], "0")
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=args.overlap) as ex:
                for f in [ex.submit(do_pair, k) for k in range(n_jobs)]:
                    f.result()
            wall = time.perf_counter() - t0
            print(f"frag-cache hits {engine.frag_cache_hits}/{2 * n_jobs}")
        else:
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=args.overlap) as ex:
                for f in [ex.submit(engine.register, xyz0, xyz1,
                                    p_img, q_img)
                          for _ in range(n_jobs)]:
                    f.result()
            wall = time.perf_counter() - t0
        wall_per_pair = wall / n_jobs
        print(f"overlap={args.overlap}: {n_jobs} pairs in {wall:.2f} s = "
              f"{n_jobs / wall:.2f} pairs/s ({wall_per_pair:.2f} s/pair "
              f"eval-set wall)")

    out = {
        "metric": "dgr_register_sec_per_pair", "value": round(warm, 3),
        "unit": "s/pair", "voxels": int(len(coords0)),
        "device_maps": bool(cfg.use_device_maps()),
        "backend": jax.default_backend(),
    }
    if wall_per_pair is not None:
        out["overlap_wall_sec_per_pair"] = round(wall_per_pair, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
