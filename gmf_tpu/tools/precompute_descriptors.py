"""Precompute per-cloud descriptors to the ``*_{fcgf,fpfh}.npz`` format.

Parity: GMF_PointDSC/misc/cal_fcgf.py (extract_features :17-92 + dataset
writers) and misc/cal_fpfh.py — voxelize each .ply, run the descriptor
backend, save {xyz, feature} npz next to the cloud so the PointDSC
loaders (datasets/ThreeDMatch.py:93-117) can consume them.

Usage:
  python -m gmf_tpu.tools.precompute_descriptors --root /data/3dmatch \\
      --descriptor fpfh [--voxel 0.05]
  python -m gmf_tpu.tools.precompute_descriptors --root ... \\
      --descriptor fcgf --checkpoint fcgf_ckpt_dir
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def extract_fpfh(xyz: np.ndarray, voxel_size: float):
    import jax.numpy as jnp

    from gmf_tpu.ops.fpfh import compute_fpfh
    from gmf_tpu.sparse.voxelize import sparse_quantize

    _, sel = sparse_quantize(xyz, voxel_size)
    pts = xyz[sel].astype(np.float32)
    feat = np.asarray(compute_fpfh(
        jnp.asarray(pts), normal_radius=2 * voxel_size,
        feature_radius=5 * voxel_size))
    return pts, feat


def extract_fcgf(xyz: np.ndarray, voxel_size: float, variables, model):
    """FCGF features via the sparse ResUNet (cal_fcgf.extract_features)."""
    import jax.numpy as jnp

    from gmf_tpu.sparse.kernel_map import build_pyramid
    from gmf_tpu.sparse.resunet import pyramid_to_arrays
    from gmf_tpu.sparse.voxelize import sparse_quantize

    coords, sel = sparse_quantize(xyz, voxel_size)
    pts = xyz[sel].astype(np.float32)
    pyr = build_pyramid(coords, 4, conv1_kernel_size=7, granule=4096)
    arrays = pyramid_to_arrays(pyr)
    feats = jnp.ones((pyr.levels[0].cap, 1), jnp.float32)
    out = model.apply(variables, feats, arrays)
    return pts, np.asarray(out)[: len(coords)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--descriptor", choices=["fcgf", "fpfh"], default="fpfh")
    ap.add_argument("--voxel", type=float, default=0.05)
    ap.add_argument("--checkpoint", default=None,
                    help="FCGF checkpoint dir (required for fcgf)")
    ap.add_argument("--pattern", default="**/*.ply")
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    from gmf_tpu.data.ply import read_ply

    model = variables = None
    if args.descriptor == "fcgf":
        assert args.checkpoint, "--checkpoint required for fcgf"
        import jax

        from gmf_tpu.sparse.resunet import FCGFNet
        from gmf_tpu.utils.checkpoint import load_checkpoint

        state, _ = load_checkpoint(args.checkpoint)
        model = FCGFNet(conv1_kernel_size=7)
        variables = jax.tree.map(np.asarray, state)

    files = sorted(glob.glob(os.path.join(args.root, args.pattern),
                             recursive=True))
    print(f"{len(files)} clouds")
    for i, f in enumerate(files):
        out_path = f.replace(".ply", f"_{args.descriptor}.npz")
        if os.path.exists(out_path) and not args.overwrite:
            continue
        xyz = read_ply(f)["xyz"]
        if args.descriptor == "fpfh":
            pts, feat = extract_fpfh(xyz, args.voxel)
        else:
            pts, feat = extract_fcgf(xyz, args.voxel, variables, model)
        np.savez(out_path, xyz=pts, feature=feat)
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{len(files)}")
    print("done")


if __name__ == "__main__":
    main()
