"""End-to-end two-cloud registration demo.

Parity: GMF_PointDSC/demo_registration.py — extract descriptors (FPFH here;
FCGF if you pass a trained sparse checkpoint), build NN correspondences,
run PointDSC+GMF, report the transform. Unlike the reference demo (which
crashes on the GMF model because it passes no images, SURVEY.md P15), this
demo synthesizes neutral image tensors when no frames are given.

Usage:
  python examples/demo_registration.py                 # synthetic pair
  python examples/demo_registration.py --src a.ply --tgt b.ply \\
      [--checkpoint snapshot/model_best] [--voxel 0.05]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# allow running the example straight from a repo checkout
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src")
    ap.add_argument("--tgt")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--voxel", type=float, default=0.05)
    ap.add_argument("--num-node", type=int, default=1000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random model (smoke test)")
    ap.add_argument("--save-trans", default=None,
                    help="write the estimated [4,4] transform to this .npy")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gmf_tpu.data.correspondence import build_correspondences
    from gmf_tpu.data.ply import read_ply
    from gmf_tpu.eval.registration import PointDSCRegistrar
    from gmf_tpu.geometry.metrics import rotation_error_deg
    from gmf_tpu.models import PointDSC
    from gmf_tpu.ops.fpfh import compute_fpfh
    from gmf_tpu.sparse.voxelize import sparse_quantize

    rng = np.random.RandomState(0)
    if args.src and args.tgt:
        xyz0 = read_ply(args.src)["xyz"]
        xyz1 = read_ply(args.tgt)["xyz"]
        T_gt = None
    else:
        print("no inputs given - generating a synthetic pair")
        xyz0 = rng.rand(3000, 3).astype(np.float32)
        ang = 0.5
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        t = np.array([0.3, -0.1, 0.2], np.float32)
        xyz1 = xyz0 @ R.T + t
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, :3], T_gt[:3, 3] = R, t

    # voxel downsample + FPFH descriptors (JAX, Open3D-free)
    def prep(xyz):
        _, sel = sparse_quantize(xyz, args.voxel)
        pts = xyz[sel].astype(np.float32)
        feat = np.asarray(compute_fpfh(jnp.asarray(pts)))
        return pts, feat

    pts0, feat0 = prep(xyz0)
    pts1, feat1 = prep(xyz1)
    print(f"voxelized: {len(pts0)} / {len(pts1)} points")

    if args.num_node and len(pts0) > args.num_node:
        s = rng.choice(len(pts0), args.num_node, replace=False)
        pts0, feat0 = pts0[s], feat0[s]
    if args.num_node and len(pts1) > args.num_node:
        s = rng.choice(len(pts1), args.num_node, replace=False)
        pts1, feat1 = pts1[s], feat1[s]

    sample = build_correspondences(
        pts0, pts1, feat0, feat1, np.eye(4, dtype=np.float32),
        inlier_threshold=0.10, use_mutual=False)
    if sample is None:
        raise SystemExit(
            "fewer than 10 putative correspondences — clouds too sparse "
            "(try a smaller --voxel)")
    print(f"{len(sample['corr_pos'])} putative correspondences")

    # neutral gray frames when no RGB is available (the GMF model always
    # takes images; the reference demo would KeyError here)
    H, W = (24, 32) if args.tiny else (120, 160)
    sample["p_image"] = np.full((H, W, 3), 0.5, np.float32)
    sample["q_image"] = np.full((H, W, 3), 0.5, np.float32)

    if args.checkpoint:
        from gmf_tpu.utils.model_io import load_pointdsc

        model, variables = load_pointdsc(args.checkpoint)
    else:
        print("no checkpoint - random weights (geometry-driven mode)")
        model = (PointDSC(num_layers=2, num_channels=32, k=20) if args.tiny
                 else PointDSC())
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(sample["corr_pos"])[None, :64],
            jnp.asarray(sample["src_keypts"])[None, :64],
            jnp.asarray(sample["tgt_keypts"])[None, :64],
            jnp.asarray(sample["p_image"])[None],
            jnp.asarray(sample["q_image"])[None])

    registrar = PointDSCRegistrar(model, variables)
    trans, labels = registrar(sample)
    print("estimated transform:\n", np.round(trans, 4))
    print(f"predicted inliers: {int(labels.sum())}/{len(labels)}")
    if args.save_trans:
        np.save(args.save_trans, np.asarray(trans))
    if T_gt is not None:
        re = float(rotation_error_deg(jnp.asarray(trans[:3, :3]),
                                      jnp.asarray(T_gt[:3, :3])))
        te = float(np.linalg.norm(trans[:3, 3] - T_gt[:3, 3]))
        print(f"vs ground truth: RE={re:.3f} deg TE={te * 100:.2f} cm "
              f"{'SUCCESS' if re < 15 and te < 0.3 else 'FAIL'}")


if __name__ == "__main__":
    main()
