"""Build the PointDSC KITTI pair-npz dataset from raw KITTI odometry.

Parity: GMF_PointDSC/misc/cal_fcgf.py's KITTI writer (:94-433) /
cal_fpfh.py process_kitti — produces one npz per pair {xyz0, xyz1,
features0, features1, p_image, q_image, gt_trans} under
``<out>/{descriptor}_{split}/``, the layout datasets/KITTI.py consumes.

Usage:
  python -m gmf_tpu.tools.build_kitti_pairs --root /data/kitti \\
      --out /data/kitti_pairs --split train --descriptor fpfh
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="KITTI odometry root")
    ap.add_argument("--out", required=True)
    ap.add_argument("--split", default="train",
                    choices=["train", "val", "test"])
    ap.add_argument("--descriptor", default="fpfh",
                    choices=["fcgf", "fpfh"])
    ap.add_argument("--fcgf-checkpoint", default=None)
    ap.add_argument("--voxel", type=float, default=0.30)
    ap.add_argument("--min-dist", type=float, default=10.0)
    ap.add_argument("--image-hw", type=int, nargs=2, default=(120, 160))
    args = ap.parse_args()

    import jax.numpy as jnp

    from gmf_tpu.data.kitti_dgr_loader import KITTINMPairDataset
    from gmf_tpu.ops.fpfh import compute_fpfh

    # the reference's split sequences (misc/split/{split}_kitti.txt)
    split_file = os.path.join(
        os.path.dirname(__file__), "..", "data", "splits",
        f"{args.split}_kitti.txt")
    seqs = [int(s) for s in open(split_file).read().split()]

    fcgf = fcgf_vars = None
    if args.descriptor == "fcgf":
        assert args.fcgf_checkpoint, "--fcgf-checkpoint required"
        import jax

        from gmf_tpu.sparse.resunet import FCGFNet
        from gmf_tpu.utils.checkpoint import load_checkpoint

        state, _ = load_checkpoint(args.fcgf_checkpoint)
        fcgf = FCGFNet(conv1_kernel_size=5)  # KITTI conv1=5 (config_Kitti)
        fcgf_vars = jax.tree.map(np.asarray, state)

    ds = KITTINMPairDataset(args.root, sequences=seqs,
                            min_dist=args.min_dist, voxel_size=args.voxel,
                            image_hw=tuple(args.image_hw))
    out_dir = os.path.join(args.out, f"{args.descriptor}_{args.split}")
    os.makedirs(out_dir, exist_ok=True)
    print(f"{len(ds)} pairs -> {out_dir}")

    for i in range(len(ds)):
        pair = ds[i]
        seq, t0, t1 = pair["meta"]
        out_path = os.path.join(out_dir, f"{seq}_{t0}_{t1}.npz")
        if os.path.exists(out_path):
            continue

        def feat(pts, coords):
            if args.descriptor == "fpfh":
                return np.asarray(compute_fpfh(
                    jnp.asarray(pts), normal_radius=2 * args.voxel,
                    feature_radius=5 * args.voxel))
            from gmf_tpu.sparse.kernel_map import build_pyramid
            from gmf_tpu.sparse.resunet import pyramid_to_arrays

            pyr = build_pyramid(coords, 4, conv1_kernel_size=5,
                                granule=4096)
            arrays = pyramid_to_arrays(pyr)
            f = jnp.ones((pyr.levels[0].cap, 1), jnp.float32)
            out = fcgf.apply(fcgf_vars, f, arrays)
            return np.asarray(out)[: len(coords)]

        np.savez(
            out_path,
            xyz0=pair["pcd0"], xyz1=pair["pcd1"],
            features0=feat(pair["pcd0"], pair["coords0"]),
            features1=feat(pair["pcd1"], pair["coords1"]),
            p_image=pair["p_image"], q_image=pair["q_image"],
            gt_trans=pair["T_gt"])
        if (i + 1) % 20 == 0:
            print(f"{i + 1}/{len(ds)}")
    print("done")


if __name__ == "__main__":
    main()
