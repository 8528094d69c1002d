"""Checkpoint-sweep evaluation: best recall over all saved snapshots.

Parity: GMF_PointDSC/evaluation/test_3DMatch_recurrent.py:230-284 and
fpfh scripts/test_3dmatch2.py — iterate every checkpoint in a snapshot
directory, evaluate, record best recall.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--snapshot-dir", required=True,
                    help="directory of checkpoint subdirs / .pkl files")
    ap.add_argument("--descriptor", default="fcgf")
    ap.add_argument("--num-node", default="all")
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--batch", type=int, default=1,
                    help="pairs per batched dispatch")
    ap.add_argument("--inflight", type=int, default=1,
                    help="batched dispatches kept in flight (>1 hides the "
                         "per-batch fetch/relay stall; every result is "
                         "still fetched and scored)")
    ap.add_argument("--workers", type=int, default=0,
                    help="threaded pair prefetch")
    ap.add_argument("--device-match", action="store_true",
                    help="on-device correspondence building")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("recurrent")

    from gmf_tpu.data.threedmatch import SCENE_LIST, ThreeDMatchTest
    from gmf_tpu.eval.harness import aggregate_scenes, evaluate_pairs
    from gmf_tpu.eval.registration import PointDSCRegistrar
    from gmf_tpu.utils.model_io import load_pointdsc

    ckpts = sorted(
        [p for p in glob.glob(os.path.join(args.snapshot_dir, "*"))
         if os.path.isdir(p) or p.endswith(".pkl")])
    log.info(f"sweeping {len(ckpts)} checkpoints")

    num_node = args.num_node if args.num_node == "all" else int(args.num_node)
    best = (None, -1.0)
    for ckpt in ckpts:
        try:
            model, variables = load_pointdsc(ckpt)
        except Exception as e:  # skip non-checkpoint files
            log.info(f"skip {ckpt}: {e}")
            continue
        registrar = PointDSCRegistrar(model, variables)
        scenes = args.scenes or SCENE_LIST
        all_stats = {}
        for si, scene in enumerate(scenes):
            ds = ThreeDMatchTest(root=args.root, descriptor=args.descriptor,
                                 num_node=num_node, select_scene=scene,
                                 device_match=args.device_match)
            all_stats[scene] = evaluate_pairs(
                registrar, ds, scene_index=si, batch_size=args.batch,
                workers=args.workers, inflight=args.inflight)
        agg = aggregate_scenes(all_stats)
        log.info(f"{os.path.basename(ckpt)}: recall={agg['recall_pct']:.2f}%")
        if agg["recall_pct"] > best[1]:
            best = (ckpt, agg["recall_pct"])
    log.info(f"BEST: {best[0]} recall={best[1]:.2f}%")


if __name__ == "__main__":
    main()
