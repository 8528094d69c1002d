"""KITTI evaluation CLI (PointDSC+GMF).

Parity: GMF_PointDSC/evaluation/test_KITTI.py — num_node=12000, success =
RE<5 deg & TE<60 cm, inlier threshold 0.6/1.2 m. Reference expected output
for released FCGF weights: "All 555 pairs, Mean Success Rate=98.38%"
(docstring :170-176).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--descriptor", default="fcgf", choices=["fcgf", "fpfh"])
    ap.add_argument("--split", default="test")
    ap.add_argument("--num-node", type=int, default=12000)
    ap.add_argument("--use-mutual", action="store_true", default=False)
    ap.add_argument("--use-icp", action="store_true")
    ap.add_argument("--solver", default="SVD", choices=["SVD", "RANSAC"])
    ap.add_argument("--fused", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="Pallas flash-attention + NMS path (default: on "
                         "for TPU, off for CPU)")
    ap.add_argument("--re-thre", type=float, default=5.0)
    ap.add_argument("--te-thre", type=float, default=60.0)
    ap.add_argument("--inlier-threshold", type=float, default=0.60)
    ap.add_argument("--out", default="eval_kitti")
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="bf16 module compute, f32 geometry (registration "
                         "output verified exact; default: on for TPU)")
    ap.add_argument("--compat-cache", default="auto",
                    choices=("auto", "off", "bf16", "f32", "int8"),
                    help="spatial-consistency cache mode (see test_3dmatch)")
    ap.add_argument("--approx-knn", action="store_true",
                    help="opt-in approximate seed-kNN (recall 0.99)")
    ap.add_argument("--batch", type=int, default=1,
                    help="pairs per batched dispatch")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard batches over an N-device 'data' mesh")
    ap.add_argument("--inflight", type=int, default=1,
                    help="batched dispatches kept in flight (>1 hides the "
                         "per-batch fetch/relay stall; every result is "
                         "still fetched and scored)")
    ap.add_argument("--workers", type=int, default=0,
                    help="prefetch pairs with N threads (overlaps host "
                         "data prep with device dispatch; the reference "
                         "uses a 16-worker DataLoader)")
    ap.add_argument("--device-match", action="store_true",
                    help="build correspondences on device inside the "
                         "registration dispatch. NOTE: pairs with <10 "
                         "mutual matches are kept (in-graph non-mutual "
                         "fallback) rather than resampled as the host "
                         "loader does (reference KITTIDataset behavior), "
                         "so the effective eval set differs on "
                         "degenerate pairs")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("evalkitti")

    from gmf_tpu.data.kitti import KITTIDataset
    from gmf_tpu.eval.harness import (
        aggregate_scenes, evaluate_pairs, format_report,
    )
    from gmf_tpu.eval.registration import PointDSCRegistrar
    from gmf_tpu.eval.solvers import make_register_fn
    from gmf_tpu.utils.model_io import load_pointdsc

    import jax

    if args.fused is None:
        args.fused = jax.default_backend() != "cpu"
    if args.bf16 is None:
        args.bf16 = jax.default_backend() != "cpu"
    # KITTI model settings (evaluation/test_KITTI.py:210-219):
    # inlier/sigma 1.2, nms_radius = inlier_threshold.
    model, variables = load_pointdsc(args.checkpoint, inlier_threshold=1.2)
    import jax.numpy as jnp

    model = model.clone(inlier_threshold=1.2, sigma_d=1.2, nms_radius=1.2,
                        fused_attention=args.fused,
                        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    if args.compat_cache != "auto":
        model = model.clone(compat_cache=args.compat_cache)
    if args.approx_knn:
        model = model.clone(knn_topk="approx")
    mesh = None
    if args.mesh:
        from gmf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.mesh)
    registrar = PointDSCRegistrar(
        model, variables, mesh=mesh,
        match_inlier_threshold=args.inlier_threshold,
        match_mutual=args.use_mutual)
    register_fn = make_register_fn(registrar, solver=args.solver,
                                   use_icp=args.use_icp,
                                   inlier_threshold=1.2)

    ds = KITTIDataset(root=args.root, split=args.split,
                      descriptor=args.descriptor, num_node=args.num_node,
                      use_mutual=args.use_mutual,
                      inlier_threshold=args.inlier_threshold,
                      device_match=args.device_match)
    stats = evaluate_pairs(register_fn, ds,
                           re_thresh=args.re_thre, te_thresh_cm=args.te_thre,
                           batch_size=args.batch, workers=args.workers,
                           inflight=args.inflight)
    agg = aggregate_scenes({"kitti": stats})
    log.info(format_report(agg))
    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "all_stats.npy"), agg["all_stats"])


if __name__ == "__main__":
    main()
