"""PointDSC+GMF training CLI.

Parity: GMF_PointDSC/train_3DMatch.py / train_KITTI.py — build datasets
from the config, snapshot the resolved config as JSON (train_3DMatch.py:
35-39), run the epoch loop with per-epoch recall-stamped checkpoints.

Usage:
  python -m gmf_tpu.train.train_pointdsc --dataset 3DMatch \\
      --root /data/3DImageMatch --overlap-path /data/overlap \\
      [--descriptor fcgf] [--max-epoch 100]
  python -m gmf_tpu.train.train_pointdsc --dataset synthetic  # smoke run
"""

from __future__ import annotations

import argparse
import os
import time


class _BatchedLoader:
    """Wrap an indexable dataset into a shuffled, min-clip-collated
    batch iterator (the reference's DataLoader+collate_fn,
    datasets/dataloader.py:55-62)."""

    def __init__(self, dataset, batch_size: int, steps_per_epoch: int,
                 seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.steps_per_epoch = steps_per_epoch
        self.seed = seed
        self._epoch = 0

    def __iter__(self):
        import numpy as np

        from gmf_tpu.data.collate import min_clip_collate
        from gmf_tpu.parallel.mesh import process_shard

        rng = np.random.RandomState(self.seed + self._epoch)
        self._epoch += 1
        n = len(self.dataset)
        # Multi-host: every process draws the SAME seeded permutation and
        # takes its strided, disjoint shard (identity on one host).
        order = process_shard(rng.permutation(n))
        m = len(order)
        for step in range(self.steps_per_epoch):
            idx = [order[(step * self.batch_size + b) % m]
                   for b in range(self.batch_size)]
            samples = [self.dataset[i] for i in idx]
            samples = [{k: v for k, v in s.items() if k != "scene"}
                       for s in samples]
            yield min_clip_collate(samples, rng)

    def __len__(self):
        return self.steps_per_epoch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="3DMatch",
                    choices=["3DMatch", "Kitti", "synthetic"])
    ap.add_argument("--root", default="")
    ap.add_argument("--overlap-path", default="")
    ap.add_argument("--descriptor", default="fcgf")
    ap.add_argument("--max-epoch", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--num-node", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--pretrain", default=None)
    ap.add_argument("--steps-per-epoch", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--prefetch", type=int, default=0,
                    help="prefetch batches N-deep on a thread (host batch "
                         "construction overlaps device steps)")
    ap.add_argument("--tiny", action="store_true", help="tiny smoke config")
    ap.add_argument("--fused", action="store_true",
                    help="Pallas flash attention in training (custom_vjp "
                         "backward; O(N)-memory — for large --num-node)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gmf_tpu.configs import pointdsc_3dmatch, pointdsc_kitti
    from gmf_tpu.models import PointDSC
    from gmf_tpu.train.trainer import TrainConfig, Trainer

    cfg = pointdsc_kitti() if args.dataset == "Kitti" else pointdsc_3dmatch()
    if args.max_epoch is not None:
        cfg.max_epoch = args.max_epoch
    if args.batch_size is not None:
        cfg.data.batch_size = args.batch_size
    if args.lr is not None:
        cfg.lr = args.lr

    save_dir = args.save_dir or os.path.join(
        "outputs", "snapshot",
        f"PointDSC_{args.dataset}_{time.strftime('%m%d%H%M')}")
    os.makedirs(save_dir, exist_ok=True)
    cfg.to_json(os.path.join(save_dir, "config.json"))
    # source provenance next to config.json (ref train_3DMatch.py:30-34)
    from gmf_tpu.utils.checkpoint import snapshot_sources

    snapshot_sources(save_dir, [
        "gmf_tpu.models.pointdsc", "gmf_tpu.nn.fusion", "gmf_tpu.nn.resnet",
        "gmf_tpu.train.trainer", "gmf_tpu.train.losses",
        "gmf_tpu.train.train_pointdsc", "gmf_tpu.configs.presets",
    ])
    print(f"snapshot dir: {save_dir}")

    # datasets
    if args.dataset == "synthetic":
        from gmf_tpu.data import SyntheticCorrespondenceLoader

        spe = args.steps_per_epoch or 4
        bs = args.batch_size or 4
        train_loader = SyntheticCorrespondenceLoader(
            batch_size=bs, num_corr=256 if args.tiny else args.num_node,
            steps_per_epoch=spe, image_hw=(24, 32) if args.tiny else (120, 160))
        val_loader = SyntheticCorrespondenceLoader(
            batch_size=bs, num_corr=256 if args.tiny else args.num_node,
            steps_per_epoch=max(spe // 4, 1),
            image_hw=(24, 32) if args.tiny else (120, 160), seed=1)
    elif args.dataset == "3DMatch":
        from gmf_tpu.data.threedmatch import ThreeDMatchTrainVal

        train_ds = ThreeDMatchTrainVal(
            root=args.root, split="train", overlap_path=args.overlap_path,
            descriptor=args.descriptor, num_node=args.num_node,
            use_mutual=cfg.data.use_mutual)
        val_ds = ThreeDMatchTrainVal(
            root=args.root, split="val", overlap_path=args.overlap_path,
            descriptor=args.descriptor, num_node=args.num_node,
            use_mutual=cfg.data.use_mutual, augment_axis=0,
            augment_rotation=0.0, augment_translation=0.0)
        spe = args.steps_per_epoch or min(
            cfg.training_max_iter, len(train_ds) // cfg.data.batch_size)
        train_loader = _BatchedLoader(train_ds, cfg.data.batch_size, spe)
        val_loader = _BatchedLoader(
            val_ds, cfg.data.batch_size,
            min(cfg.val_max_iter, max(len(val_ds) // cfg.data.batch_size, 1)))
    else:  # Kitti
        from gmf_tpu.data.kitti import KITTIDataset

        train_ds = KITTIDataset(root=args.root, split="train",
                                descriptor=args.descriptor,
                                num_node=args.num_node,
                                inlier_threshold=cfg.model.inlier_threshold)
        val_ds = KITTIDataset(root=args.root, split="val",
                              descriptor=args.descriptor,
                              num_node=args.num_node,
                              inlier_threshold=cfg.model.inlier_threshold)
        spe = args.steps_per_epoch or min(
            cfg.training_max_iter, len(train_ds) // cfg.data.batch_size)
        train_loader = _BatchedLoader(train_ds, cfg.data.batch_size, spe)
        val_loader = _BatchedLoader(
            val_ds, cfg.data.batch_size,
            max(len(val_ds) // cfg.data.batch_size, 1))

    if args.tiny:
        model = PointDSC(num_layers=2, num_channels=32, k=10,
                         inlier_threshold=cfg.model.inlier_threshold,
                         sigma_d=cfg.model.sigma_d)
    else:
        model = PointDSC(
            in_dim=cfg.model.in_dim, num_layers=cfg.model.num_layers,
            num_channels=cfg.model.num_channels,
            num_iterations=cfg.model.num_iterations, ratio=cfg.model.ratio,
            inlier_threshold=cfg.model.inlier_threshold,
            sigma_d=cfg.model.sigma_d, k=cfg.model.k,
            nms_radius=cfg.model.nms_radius,
            fused_attention=args.fused)

    tcfg = TrainConfig(
        lr=cfg.lr, weight_decay=cfg.weight_decay,
        scheduler_gamma=cfg.scheduler_gamma, max_epoch=cfg.max_epoch,
        batch_size=cfg.data.batch_size,
        weight_classification=cfg.weight_classification,
        weight_spectralmatching=cfg.weight_spectralmatching,
        weight_transformation=cfg.weight_transformation,
        transformation_loss_start_epoch=cfg.transformation_loss_start_epoch,
        re_thresh=cfg.re_thre, te_thresh=cfg.te_thre, save_dir=save_dir)

    trainer = Trainer(model, tcfg, train_loader, val_loader,
                      steps_per_epoch=len(train_loader),
                      prefetch=args.prefetch)
    if args.pretrain:
        trainer.load(args.pretrain)
        print(f"loaded pretrain from {args.pretrain}")

    history = trainer.train(snapshot=True)
    final = [h for h in history if h[0] == "eval"][-1][2]
    print(f"final eval: recall={final['reg_recall']:.2f}% "
          f"class_loss={final['class_loss']:.4f}")


if __name__ == "__main__":
    main()
