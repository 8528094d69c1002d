"""Classical-baseline evaluation CLI (SM / PMC / RANSAC / GC-RANSAC).

Usage:
  python -m gmf_tpu.eval.baseline_eval --root /path/3DImageMatch \\
      --methods SM RANSAC [--dataset 3dmatch|kitti]

Parity: GMF_PointDSC/baseline_scripts/baseline_3DMatch.py:131-318 and
baseline_KITTI.py — the baselines run under the identical 12-column
harness as the model evals so numbers are directly comparable. Methods
whose external dependency is missing (GC-RANSAC without the pygcransac
wheel) are logged as SKIPPED instead of crashing the run.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--dataset", default="3dmatch",
                    choices=["3dmatch", "kitti"])
    ap.add_argument("--methods", nargs="+",
                    default=["SM", "PMC", "RANSAC", "GCRANSAC"])
    ap.add_argument("--descriptor", default="fcgf", choices=["fcgf", "fpfh"])
    ap.add_argument("--num-node", default="all")
    ap.add_argument("--use-mutual", action="store_true", default=True)
    ap.add_argument("--no-mutual", dest="use_mutual", action="store_false")
    ap.add_argument("--inlier-threshold", type=float, default=None,
                    help="default 0.10 (3DMatch) / 0.60 (KITTI)")
    ap.add_argument("--max-iteration", type=int, default=5000)
    ap.add_argument("--re-thre", type=float, default=None)
    ap.add_argument("--te-thre", type=float, default=None)
    ap.add_argument("--out", default="eval_baselines")
    ap.add_argument("--scenes", nargs="*", default=None)
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("baselines")

    from gmf_tpu.eval.baselines import (
        BaselineUnavailable, make_baseline_register_fn,
    )
    from gmf_tpu.eval.harness import (
        aggregate_scenes, evaluate_pairs, format_report,
    )

    if args.dataset == "3dmatch":
        from gmf_tpu.data.threedmatch import SCENE_LIST, ThreeDMatchTest

        tau = args.inlier_threshold or 0.10
        re_thre = args.re_thre or 15.0
        te_thre = args.te_thre or 30.0
        scenes = args.scenes or SCENE_LIST
        num_node = (args.num_node if args.num_node == "all"
                    else int(args.num_node))

        def scene_pairs(scene):
            ds = ThreeDMatchTest(
                root=args.root, descriptor=args.descriptor,
                inlier_threshold=tau, num_node=num_node,
                use_mutual=args.use_mutual, select_scene=scene)
            return (ds[i] for i in range(len(ds)))
    else:
        from gmf_tpu.data.kitti import KITTIDataset

        tau = args.inlier_threshold or 0.60
        re_thre = args.re_thre or 5.0
        te_thre = args.te_thre or 60.0
        scenes = ["kitti_test"]

        def scene_pairs(_):
            ds = KITTIDataset(
                root=args.root, split="test", descriptor=args.descriptor,
                inlier_threshold=tau,
                num_node=12000 if args.num_node == "all"
                else int(args.num_node),
                use_mutual=args.use_mutual)
            return (ds[i] for i in range(len(ds)))

    os.makedirs(args.out, exist_ok=True)
    for method in args.methods:
        try:
            register_fn = make_baseline_register_fn(
                method, inlier_threshold=tau,
                max_iteration=args.max_iteration)
        except BaselineUnavailable as e:
            log.info(f"[{method}] SKIPPED: {e}")
            continue
        all_stats = {}
        for si, scene in enumerate(scenes):
            stats = evaluate_pairs(register_fn, scene_pairs(scene),
                                   re_thresh=re_thre, te_thresh_cm=te_thre,
                                   scene_index=si)
            all_stats[scene] = stats
            log.info(f"[{method}] Scene {si}th: "
                     f"Reg Recall={stats[:, 0].mean() * 100:.2f}%")
        agg = aggregate_scenes(all_stats)
        log.info(f"==== {method} ====")
        log.info(format_report(agg))
        np.save(os.path.join(args.out, f"{method}_stats.npy"),
                agg["all_stats"])
    log.info(f"stats saved under {args.out}/")


if __name__ == "__main__":
    main()
