"""DGR+GMF training CLI.

Parity: GMF_DGR_fcgf/train_3DMatch.py / train_Kitti.py and the fpfh
variant's train.py — build pair loaders, frozen FCGF + trainable inlier
net, WeightedProcrustesTrainer epochs with checkpointing.

Usage:
  python -m gmf_tpu.train.train_dgr --dataset 3dmatch --root /data \\
      --split-file splits/train_3dmatch.txt [--descriptor fcgf]
  python -m gmf_tpu.train.train_dgr --dataset synthetic --tiny  # smoke
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="3dmatch",
                    choices=["3dmatch", "kitti", "synthetic"])
    ap.add_argument("--root", default="")
    ap.add_argument("--split-file", default=None)
    ap.add_argument("--descriptor", default="fcgf",
                    choices=["fcgf", "fpfh"])
    ap.add_argument("--fcgf-checkpoint", default=None,
                    help="pretrained frozen FCGF weights (gmf_tpu ckpt)")
    ap.add_argument("--max-epoch", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--steps-per-epoch", type=int, default=None)
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mesh", type=int, default=0, metavar="N",
                    help="data-parallel training over an N-device 'data' "
                         "mesh: each step's pair group is sharded over "
                         "the mesh (shard_map + gradient psum, "
                         "dgr_trainer.train_step_dp) instead of the "
                         "serial iter_size accumulation. N must divide "
                         "the available device count.")
    ap.add_argument("--prefetch", type=int, default=0,
                    help="prefetch pair batches N-deep on a thread")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--n-points", type=int, default=None,
                    help="synthetic pair size (default: 300 tiny / 2000)")
    ap.add_argument("--outlier-bias", type=float, default=0.0,
                    help="displace cloud 1's partner-less points by this "
                         "constant offset (discriminating fixture: "
                         "untrained registration fails, the bias cluster "
                         "is learnable; data/dgr_loader.make_dgr_pair)")
    ap.add_argument("--overlap", type=float, default=0.7,
                    help="synthetic pair overlap fraction (lower = harder "
                         "fixture: fewer correct NN matches, untrained "
                         "registration fails)")
    ap.add_argument("--cloud", choices=["uniform", "surface"],
                    default="uniform",
                    help="synthetic pair geometry: 'surface' (heightfield) "
                         "gives FPFH meaningful normals — required for a "
                         "learnable --descriptor fpfh synthetic run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gmf_tpu.configs.presets import dgr_3dmatch, dgr_kitti
    from gmf_tpu.data.dgr_loader import make_dgr_pair
    from gmf_tpu.sparse.kernel_map import build_pyramid
    from gmf_tpu.sparse.resunet import (
        FCGFNet, GMFInlierNet, SparseResUNet2, pyramid_to_arrays,
    )
    from gmf_tpu.train.dgr_trainer import WeightedProcrustesTrainer
    from gmf_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = dgr_kitti() if args.dataset == "kitti" else dgr_3dmatch()
    if args.max_epoch is not None:
        cfg.max_epoch = args.max_epoch
    if args.batch_size is not None:
        cfg.batch_size = args.batch_size

    save_dir = args.save_dir or os.path.join(
        "outputs", "snapshot",
        f"DGR_{args.dataset}_{time.strftime('%m%d%H%M')}")
    os.makedirs(save_dir, exist_ok=True)
    # source provenance next to the checkpoints (ref train_3DMatch.py:30-34)
    from gmf_tpu.utils.checkpoint import snapshot_sources

    snapshot_sources(save_dir, [
        "gmf_tpu.models.dgr", "gmf_tpu.sparse.resunet",
        "gmf_tpu.train.dgr_trainer", "gmf_tpu.train.train_dgr",
        "gmf_tpu.configs.presets",
    ])

    # nets
    if args.tiny:
        fcgf = SparseResUNet2(in_channels=1, out_channels=8, dim=3,
                              conv1_kernel_size=3, normalize_feature=True,
                              channels=(4, 8, 16, 32),
                              tr_channels=(8, 8, 8, 16))
        inlier = SparseResUNet2(in_channels=1, out_channels=1, dim=6,
                                conv1_kernel_size=3, with_gmf_fusion=True,
                                image_dim=16, channels=(4, 8, 16, 32),
                                tr_channels=(8, 8, 8, 16))
        granule, image_hw = 256, (16, 16)
    else:
        fcgf = FCGFNet(conv1_kernel_size=cfg.feat_conv1_kernel_size)
        inlier = GMFInlierNet(
            conv1_kernel_size=cfg.inlier_conv1_kernel_size)
        granule, image_hw = 2048, (120, 160)

    rng = np.random.RandomState(0)

    # init variables on one prototype pair
    n_points = args.n_points or (300 if args.tiny else 2000)
    proto = make_dgr_pair(rng, n_points=n_points,
                          voxel_size=cfg.voxel_size, image_hw=image_hw,
                          overlap=args.overlap,
                          outlier_bias=args.outlier_bias,
                          surface=args.cloud == "surface")
    pyr3 = build_pyramid(proto["coords0"], 4,
                         conv1_kernel_size=cfg.feat_conv1_kernel_size
                         if not args.tiny else 3, granule=granule)
    fv = fcgf.init(jax.random.PRNGKey(0),
                   jnp.ones((pyr3.levels[0].cap, 1)),
                   pyramid_to_arrays(pyr3))
    if args.fcgf_checkpoint:
        state, _ = load_checkpoint(args.fcgf_checkpoint)
        fv = jax.tree.map(jnp.asarray, state)
        print(f"loaded frozen FCGF from {args.fcgf_checkpoint}")

    coords6 = np.unique(rng.randint(0, 8, (64, 6)).astype(np.int32), axis=0)
    pyr6 = build_pyramid(coords6, 4, conv1_kernel_size=3, granule=granule)
    img0 = jnp.zeros((1, *image_hw, 3))
    iv = inlier.init(jax.random.PRNGKey(1),
                     jnp.ones((pyr6.levels[0].cap, 1)),
                     pyramid_to_arrays(pyr6), p_image=img0, q_image=img0)

    trainer = WeightedProcrustesTrainer(
        fcgf, fv, inlier, iv, cfg, voxel_cap_granule=granule,
        corr_cap_granule=granule, descriptor=args.descriptor)
    if args.resume:
        state, _ = load_checkpoint(args.resume)
        trainer.inlier_params = jax.tree.map(jnp.asarray, state["params"])
        trainer.inlier_bstats = jax.tree.map(
            jnp.asarray, state.get("batch_stats", {}))
        print(f"resumed inlier net from {args.resume}")

    # data
    if args.dataset == "synthetic":
        spe = args.steps_per_epoch or 2

        def epoch_pairs():
            for _ in range(spe):
                yield [make_dgr_pair(rng, n_points=n_points,
                                     voxel_size=cfg.voxel_size,
                                     image_hw=image_hw,
                                     overlap=args.overlap,
                                     outlier_bias=args.outlier_bias,
                                     surface=args.cloud == "surface")
                       for _ in range(cfg.batch_size)]
    else:
        from gmf_tpu.data.dgr_loader import ThreeDMatchPairDataset
        from gmf_tpu.data.kitti_dgr_loader import KITTINMPairDataset

        if args.dataset == "3dmatch":
            ds = ThreeDMatchPairDataset(
                root=args.root, split_file=args.split_file,
                voxel_size=cfg.voxel_size, image_hw=image_hw)
        else:
            ds = KITTINMPairDataset(args.root, voxel_size=cfg.voxel_size,
                                    image_hw=image_hw)
        spe = args.steps_per_epoch or max(len(ds) // cfg.batch_size, 1)

        def epoch_pairs():
            order = np.random.permutation(len(ds))
            for step in range(spe):
                idx = order[step * cfg.batch_size:(step + 1) * cfg.batch_size]
                yield [ds[int(i)] for i in idx]

    from gmf_tpu.data.prefetch import prefetch_iter

    mesh = None
    if args.mesh:
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < args.mesh:
            raise SystemExit(f"--mesh {args.mesh} needs {args.mesh} "
                             f"devices, have {len(devs)}")
        mesh = Mesh(np.array(devs[:args.mesh]), ("data",))
        print(f"DP training over a {args.mesh}-device data mesh")

    best = -1.0
    for epoch in range(cfg.max_epoch):
        sums, count = {}, 0
        for pairs in prefetch_iter(epoch_pairs(), args.prefetch):
            m = (trainer.train_step_dp(pairs, mesh) if mesh is not None
                 else trainer.train_step(pairs))
            count += 1
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + v
        avg = {k: v / max(count, 1) for k, v in sums.items()}
        print(f"epoch {epoch + 1}: " + " ".join(
            f"{k}={v:.4f}" for k, v in sorted(avg.items())))
        succ = avg.get("success", 0.0)
        save_checkpoint(
            os.path.join(save_dir, f"checkpoint_epoch_{epoch + 1}"),
            trainer.inlier_variables(),
            config={"dgr": cfg.__dict__, "descriptor": args.descriptor})
        if succ > best:
            best = succ
            save_checkpoint(os.path.join(save_dir, "best_val_checkpoint"),
                            trainer.inlier_variables(),
                            config={"dgr": cfg.__dict__})
    print(f"done; snapshots in {save_dir}")


if __name__ == "__main__":
    main()
