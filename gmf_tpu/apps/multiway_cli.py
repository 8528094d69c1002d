"""Multiway registration driver CLI.

Parity: GMF_PointDSC/multiway/test_multi.py — register all fragments of a
Redwood/ICL-NUIM scene pairwise, optimize the pose graph, write the
trajectory, report ATE when ground truth is available.

Usage:
  python -m gmf_tpu.apps.multiway_cli --root /data/redwood \\
      [--scene livingroom1] [--checkpoint snap/model_best] \\
      [--loop-window 3] [--out traj.log]
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--scene", default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="PointDSC checkpoint (RANSAC fallback if absent)")
    ap.add_argument("--voxel", type=float, default=0.05)
    ap.add_argument("--num-node", type=int, default=1000)
    ap.add_argument("--loop-window", type=int, default=2)
    ap.add_argument("--out", default="trajectory.log")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gmf_tpu.apps.multiway import (
        ate_rmse, multiway_register, write_trajectory,
    )
    from gmf_tpu.data.correspondence import build_correspondences
    from gmf_tpu.data.redwood import RedwoodDataset
    from gmf_tpu.geometry.ransac import ransac_registration
    from gmf_tpu.ops.fpfh import compute_fpfh
    from gmf_tpu.sparse.voxelize import sparse_quantize

    ds = RedwoodDataset(args.root, args.scene)
    print(f"scene {ds.scene}: {len(ds)} fragments")

    registrar = None
    if args.checkpoint:
        from gmf_tpu.eval.registration import PointDSCRegistrar
        from gmf_tpu.utils.model_io import load_pointdsc

        model, variables = load_pointdsc(args.checkpoint)
        registrar = PointDSCRegistrar(model, variables)

    rng = np.random.RandomState(0)

    def prep(xyz):
        _, sel = sparse_quantize(xyz, args.voxel)
        pts = xyz[sel].astype(np.float32)
        if len(pts) > args.num_node:
            pts = pts[rng.choice(len(pts), args.num_node, replace=False)]
        feat = np.asarray(compute_fpfh(
            jnp.asarray(pts), normal_radius=2 * args.voxel,
            feature_radius=5 * args.voxel))
        return pts, feat

    cache = {}

    def register_fn(fi, fj):
        ki, kj = id(fi), id(fj)
        if ki not in cache:
            cache[ki] = prep(fi["xyz"])
        if kj not in cache:
            cache[kj] = prep(fj["xyz"])
        pts0, feat0 = cache[ki]
        pts1, feat1 = cache[kj]
        sample = build_correspondences(
            pts0, pts1, feat0, feat1, np.eye(4, dtype=np.float32),
            inlier_threshold=2 * args.voxel, use_mutual=False)
        if sample is None:
            return np.eye(4, dtype=np.float32), 0.0
        if registrar is not None:
            H, W = 120, 160
            sample["p_image"] = np.full((H, W, 3), 0.5, np.float32)
            sample["q_image"] = np.full((H, W, 3), 0.5, np.float32)
            T, labels = registrar(sample)
            fit = float(labels.mean())
        else:
            T, inl, fit = ransac_registration(
                jax.random.PRNGKey(0), jnp.asarray(sample["src_keypts"]),
                jnp.asarray(sample["tgt_keypts"]),
                inlier_threshold=2 * args.voxel, num_iters=4096)
            T, fit = np.asarray(T), float(fit)
        # register_fn must return T_ij taking fragment j into fragment i's
        # frame: our correspondences map src(i)->tgt(j), so invert.
        return np.linalg.inv(np.asarray(T, np.float64)).astype(np.float32), fit

    graph = multiway_register(
        [ds[i] for i in range(len(ds))], register_fn,
        loop_closure_window=args.loop_window)
    traj = [((i, i, len(graph.nodes)), pose)
            for i, pose in enumerate(graph.nodes)]
    write_trajectory(args.out, traj)
    print(f"trajectory written to {args.out}")

    gt = ds.gt_trajectory()
    if gt is not None and len(gt) >= len(graph.nodes):
        ate = ate_rmse(graph.nodes, gt[: len(graph.nodes)])
        print(f"ATE RMSE: {ate:.4f} m")


if __name__ == "__main__":
    main()
