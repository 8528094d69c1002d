"""Phase-level timing of the warm DGR register() path at its real sync
points (the stage breakdown in bench_dgr_e2e.py re-runs stages standalone
at unpadded shapes, which can include fresh compiles; this script mirrors
register()'s exact dispatch/sync structure instead).

Phases:
  A  host voxelize x2
  B  front half: pyramid probes + FCGF x2 + masked 1-NN, ONE fetch (idx)
  C  host: corr6d concat + 6-D unique
  D  6-D pyramid build (device probes + one batched prune fetch)
  E  inlier net dispatch + fused solve dispatch + batched (T,wsum,w) fetch
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
    ap.add_argument("--pts", type=int, default=40000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cloud", choices=["uniform", "surface", "lidar"],
                    default="uniform")
    ap.add_argument("--kitti", action="store_true",
                    help="KITTI preset: voxel 0.3, FCGF conv1=5, "
                         "120k-point lidar cloud (config_Kitti.py:49,97)")
    ap.add_argument("--matches", choices=["fcgf", "oracle"],
                    default="fcgf",
                    help="oracle: keep the FCGF + 1-NN dispatches (their "
                         "cost is real) but feed GT-correlated indices to "
                         "the 6-D stages — the kernel-map workload a "
                         "TRAINED descriptor yields (bench_dgr_e2e's "
                         "--matches oracle, phase-resolved)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 net compute (DGRConfig.net_dtype)")
    ap.add_argument("--compact", default=None,
                    choices=["on", "off"],
                    help="force compact_inlier_conv (default: follow "
                         "DGRConfig auto = device-maps setting)")
    ap.add_argument("--split-e", action="store_true",
                    help="insert an extra sync after the inlier-net "
                         "logits so phase E decomposes into E1 (net "
                         "apply) and E2 (fused solve). Adds one relay "
                         "round trip, so total is slightly pessimistic.")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gmf_tpu.models.dgr import DGRConfig, DeepGlobalRegistration
    from gmf_tpu.sparse.kernel_map import _pad_cap, build_pyramid
    from gmf_tpu.sparse.resunet import (
        FCGFNet, GMFInlierNet, pyramid_to_arrays,
    )
    from gmf_tpu.sparse.voxelize import sparse_quantize

    import jax.numpy as _jnp

    dt = _jnp.bfloat16 if args.bf16 else _jnp.float32
    if args.kitti:
        args.cloud = "lidar"
        if args.pts == 40000:
            args.pts = 120000
    conv1 = 5 if args.kitti else 7
    cfg = DGRConfig(voxel_size=0.3 if args.kitti else 0.05,
                    device_kernel_maps=None if not args.cpu else False,
                    net_dtype="bfloat16" if args.bf16 else "float32",
                    compact_inlier_conv=(None if args.compact is None
                                         else args.compact == "on"))
    fcgf = FCGFNet(conv1_kernel_size=conv1, dtype=dt)
    inlier = GMFInlierNet(dtype=dt)
    H, W = cfg.image_hw

    rng = np.random.RandomState(0)
    if args.cloud == "lidar":
        # KITTI-like sweep (bench_dgr_e2e.py --cloud lidar): annulus
        # footprint, ~1/r density, flat ground + vertical clutter
        r_max = 50.0
        n_grd = int(args.pts * 0.7)
        r = 2.0 + (r_max - 2.0) * rng.rand(n_grd)
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
        side = (args.pts * 0.9) ** 0.5 * cfg.voxel_size
        xy = rng.rand(args.pts, 2) * side
        z = (0.3 * side * (np.sin(xy[:, 0] * 4 / side)
                           + np.cos(xy[:, 1] * 5 / side)))
        xyz0 = np.concatenate([xy, z[:, None]], 1).astype(np.float32)
    else:
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

    c3 = np.unique(rng.randint(0, 10, (200, 3)).astype(np.int32), axis=0)
    a3 = pyramid_to_arrays(build_pyramid(c3, 4, conv1_kernel_size=conv1,
                                         granule=256))
    fv = jax.jit(fcgf.init)(jax.random.PRNGKey(0),
                            jnp.ones((a3["mask_0"].shape[0], 1)), a3)
    c6 = np.unique(rng.randint(0, 6, (150, 6)).astype(np.int32), axis=0)
    a6 = pyramid_to_arrays(build_pyramid(c6, 4, conv1_kernel_size=3,
                                         granule=256))
    iv = jax.jit(inlier.init)(
        jax.random.PRNGKey(1), jnp.ones((a6["mask_0"].shape[0], 1)), a6,
        p_image=jnp.asarray(p_img), q_image=jnp.asarray(q_img))
    eng = DeepGlobalRegistration(fv, iv, cfg, fcgf_model=fcgf,
                                 inlier_model=inlier)

    oracle_idx = None
    if args.matches == "oracle":
        from scipy.spatial import cKDTree

        _, s0 = sparse_quantize(xyz0, cfg.voxel_size, return_index=True)
        c1_o, s1 = sparse_quantize(xyz1, cfg.voxel_size,
                                   return_index=True)
        warped = (xyz0[s0] @ R.T + t) / cfg.voxel_size
        oracle_idx = cKDTree(c1_o.astype(np.float64)).query(
            warped)[1].astype(np.int32)

    print(f"backend: {jax.default_backend()}  "
          f"device_maps: {cfg.use_device_maps()}")
    t0 = time.perf_counter()
    eng.register(xyz0, xyz1, p_img, q_img)
    print(f"cold: {time.perf_counter() - t0:.1f} s")

    for run in range(args.runs):
        t0 = time.perf_counter()
        coords0, sel0 = eng.preprocess(xyz0)
        coords1, sel1 = eng.preprocess(xyz1)
        pts0 = xyz0[sel0]
        pts1 = xyz1[sel1]
        tA = time.perf_counter()

        from gmf_tpu.geometry.knn import nearest_neighbor
        F0_dev, _ = eng._fcgf_features_device(coords0)
        F1_dev, m1 = eng._fcgf_features_device(coords1)
        F1_masked = jnp.where(m1[:, None] > 0, F1_dev, 1e6)
        idx_dev, _ = nearest_neighbor(F0_dev, F1_masked, chunk=cfg.nn_chunk)
        nn01 = np.asarray(idx_dev)[: len(coords0)]
        tB = time.perf_counter()
        if oracle_idx is not None:
            nn01 = oracle_idx

        corr6d = np.concatenate([coords0, coords1[nn01]], axis=1)
        uniq, first_idx, inverse = sparse_quantize(
            corr6d.astype(np.float64), 1.0, return_index=True,
            return_inverse=True)
        tC = time.perf_counter()

        if run == 0:
            from gmf_tpu.sparse.device_maps import _int32_frame_fits
            from gmf_tpu.sparse.kernel_map import (
                _pad_cap as _pc, downsample_coords)

            lc = [uniq.astype(np.int32)]
            for l in range(1, 4):
                lc.append(downsample_coords(lc[l - 1], 2, 2 ** (l - 1)))
            for l, c in enumerate(lc):
                _, counts = np.unique(c[:, :3], axis=0, return_counts=True)
                ch = -(-int(counts.max()) // 3)
                ch = ch + 1 if ch >= 2 else ch   # builder's slack rule
                cap = _pc(len(c), cfg.corr_cap_granule)
                fits = (_int32_frame_fits(c[:, :3], c[:, :3], 2 ** l, cap,
                                          lattice=2 ** l)
                        and _int32_frame_fits(c[:, 3:], c[:, 3:], 2 ** l,
                                              cap, with_rows=False,
                                              lattice=2 ** l))
                path = ("split" if 1 <= ch <= 4 else
                        "split2" if counts.max() > 0 else "FULL")
                print(f"  level {l}: n={len(c)} cap={cap} "
                      f"max_mult={int(counts.max())} chains={ch} "
                      f"i32={fits} path={path}")

        arrays = eng._pyramid_arrays(uniq, conv1_kernel_size=3,
                                     granule=cfg.corr_cap_granule)
        tD = time.perf_counter()

        cap0 = arrays["mask_0"].shape[0]
        feats = jnp.ones((cap0, 1), jnp.float32)
        logits = eng._inlier_apply(eng.inlier_vars, feats, arrays,
                                   jnp.asarray(p_img), jnp.asarray(q_img))
        uniq_logits = logits[:, 0]
        tE1 = None
        if args.split_e:
            jax.device_get(uniq_logits[:1])   # sync: net execution done
            tE1 = time.perf_counter()
        n = len(pts0)
        cap = _pad_cap(n, cfg.corr_cap_granule)
        inv_pad = np.zeros(cap, np.int32)
        inv_pad[:n] = inverse
        src_pad = np.zeros((cap, 3), np.float32)
        src_pad[:n] = pts0
        tgt_pad = np.zeros((cap, 3), np.float32)
        tgt_pad[:n] = pts1[nn01]
        valid = (np.arange(cap) < n).astype(np.float32)
        T_dev, wsum_dev, w_dev = eng._solve(
            uniq_logits, jnp.asarray(inv_pad), jnp.asarray(src_pad),
            jnp.asarray(tgt_pad), jnp.asarray(valid),
            jnp.float32(cfg.clip_weight_thresh),
            jnp.float32(2.0 * cfg.voxel_size))
        T, wsum, w = jax.device_get((T_dev, wsum_dev, w_dev))
        tE = time.perf_counter()

        e_split = ("" if tE1 is None else
                   f" [E1 net {tE1 - tD:5.2f} | E2 solve {tE - tE1:5.2f}]")
        print(f"run {run}: total {tE - t0:6.2f} s | "
              f"A vox {tA - t0:5.2f} | B front {tB - tA:5.2f} | "
              f"C uniq {tC - tB:5.2f} | D 6Dpyr {tD - tC:5.2f} | "
              f"E net+solve {tE - tD:5.2f}{e_split}  "
              f"(voxels {len(coords0)}, uniq6d {len(uniq)})")


if __name__ == "__main__":
    main()
