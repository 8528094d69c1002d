"""DGR+GMF end-to-end evaluation CLI (raw clouds -> register()).

Parity: GMF_DGR_fcgf/scripts/test_3dmatch.py / test_kitti.py — per pair
``dgr.register(xyz0, xyz1, p_image, q_image)`` with RTE/RRE success
(rte_rre :103-111), inlier stats, per-scene aggregation; stats saved as
.npy. KITTI uses TE_THRESH=0.6 m (scripts/test_kitti.py).

Usage:
  python -m gmf_tpu.eval.test_dgr --root /data/threedmatch_test \\
      --fcgf-checkpoint ckpt_fcgf --inlier-checkpoint ckpt_inlier \\
      [--dataset 3dmatch|kitti] [--use-icp]
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--fcgf-checkpoint", required=True)
    ap.add_argument("--inlier-checkpoint", required=True)
    ap.add_argument("--dataset", default="3dmatch",
                    choices=["3dmatch", "kitti"])
    ap.add_argument("--descriptor", default="fcgf",
                    choices=["fcgf", "fpfh"],
                    help="matching descriptor: 'fpfh' runs the JAX FPFH "
                         "variant (GMF_DGR_fpfh tree; the FCGF "
                         "checkpoint is then unused by register())")
    ap.add_argument("--voxel", type=float, default=None)
    ap.add_argument("--use-icp", action="store_true")
    ap.add_argument("--safeguard-min-weight", type=float, default=None,
                    help="override DGRConfig.safeguard_min_weight (the "
                         "reference's hard 200-weight wsum gate, "
                         "deep_global_registration.py:330). 0 ablates "
                         "the RANSAC safeguard — the pure weighted-"
                         "Procrustes path, isolating the LEARNED "
                         "component (the default engine's safeguard "
                         "rescues low-confidence pairs by design)")
    ap.add_argument("--out", default="eval_dgr")
    ap.add_argument("--scenes", nargs="*", default=None,
                    help="subset of SCENE_LIST (default: all)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny net widths (fixture/CI smoke — checkpoints "
                         "must match)")
    ap.add_argument("--workers", type=int, default=0,
                    help="prefetch pair IO (PLY + image reads) with N "
                         "threads, overlapping register()")
    ap.add_argument("--overlap", type=int, default=1,
                    help="keep K register() calls in flight (threads): "
                         "pair k+1's host phases (voxelize, unique) run "
                         "while pair k waits on device fetches. Results "
                         "are per-pair independent and identical to "
                         "serial; improves eval WALL throughput only")
    ap.add_argument("--frag-cache", type=int, default=256,
                    help="per-fragment feature-cache budget in MB (0 "
                         "disables): voxelization + FCGF features are "
                         "reused across the pairs a fragment appears in; "
                         "results are bit-identical either way")
    ap.add_argument("--shard-index", type=int, default=None,
                    help="this process' shard of the pair list (DP over "
                         "register() streams: one process per chip on a "
                         "v5e-8, parallel/mesh.py::process_shard; "
                         "default jax.process_index())")
    ap.add_argument("--shard-count", type=int, default=None,
                    help="total shard count (default jax.process_count())")
    ap.add_argument("--merge-shards", action="store_true",
                    help="skip evaluation; merge OUT/dgr_stats_shard*.npy "
                         "written by sharded runs and print the global "
                         "summary")
    ap.add_argument("--srcdense-rowmode-min", type=int, default=None,
                    metavar="MULT",
                    help="force the row-gather srcdense tier for 6-D "
                         "pyramid probes at src multiplicity >= MULT "
                         "(KITTI-oracle regime: -11%% register() e2e at "
                         "MULT=2; random-match regime regresses — tune "
                         "per deployment; sets GMF_SRCDENSE_ROWMODE_MIN)")
    args = ap.parse_args()
    if args.srcdense_rowmode_min is not None:
        os.environ["GMF_SRCDENSE_ROWMODE_MIN"] = str(
            args.srcdense_rowmode_min)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("evaldgr")

    if args.merge_shards:
        import glob
        import re

        files = sorted(glob.glob(os.path.join(args.out,
                                              "dgr_stats_shard*.npy")))
        if not files:
            raise SystemExit(f"no dgr_stats_shard*.npy under {args.out}")
        # require one consistent NofM set — stale shards from a previous
        # run with a different --shard-count would silently merge
        # duplicated/mixed pairs otherwise
        parsed = {}
        for f in files:
            m = re.search(r"shard(\d+)of(\d+)\.npy$", os.path.basename(f))
            if m is None:
                raise SystemExit(
                    f"unparseable shard filename {f} (expected "
                    "dgr_stats_shard<N>of<M>.npy); remove stale files")
            parsed[f] = (int(m.group(1)), int(m.group(2)))
        counts = {m for _, m in parsed.values()}
        if len(counts) != 1:
            raise SystemExit(
                f"mixed shard counts {sorted(counts)} under {args.out}; "
                "remove stale shard files from previous runs")
        (total_shards,) = counts
        indices = sorted(n for n, _ in parsed.values())
        if indices != list(range(total_shards)):
            raise SystemExit(
                f"expected shards 0..{total_shards - 1}, found {indices} "
                f"under {args.out}")
        loaded = [np.load(f) for f in files]
        loaded = [s for s in loaded if len(s)]  # shard_count > pair count
        if not loaded:
            raise SystemExit(f"all shards under {args.out} are empty")
        stats = np.concatenate(loaded, axis=0)
        ok = stats[stats[:, 0] == 1]
        log.info(
            f"[merged {len(files)} shards] All {len(stats)} pairs, "
            f"recall={stats[:, 0].mean() * 100:.2f}% "
            f"rre={ok[:, 1].mean() if len(ok) else float('nan'):.2f} "
            f"rte={ok[:, 2].mean() if len(ok) else float('nan'):.3f} "
            f"safeguard used {stats[:, 4].mean() * 100:.1f}%")
        np.save(os.path.join(args.out, "dgr_stats.npy"), stats)
        return

    import jax

    from gmf_tpu.configs.presets import dgr_3dmatch, dgr_kitti
    from gmf_tpu.data.threedmatch import SCENE_LIST, load_gt_log
    from gmf_tpu.data.ply import read_ply
    from gmf_tpu.data.imageio import load_image
    from gmf_tpu.models.dgr import DGRConfig, DeepGlobalRegistration
    from gmf_tpu.sparse.resunet import FCGFNet, GMFInlierNet
    from gmf_tpu.utils.checkpoint import load_checkpoint

    tcfg = dgr_kitti() if args.dataset == "kitti" else dgr_3dmatch()
    voxel = args.voxel or tcfg.voxel_size
    rte_thresh = 0.6 if args.dataset == "kitti" else 0.3
    rre_thresh = 5.0 if args.dataset == "kitti" else 15.0

    fcgf_state, _ = load_checkpoint(args.fcgf_checkpoint)
    inlier_state, _ = load_checkpoint(args.inlier_checkpoint)
    if args.tiny:
        from gmf_tpu.sparse.resunet import SparseResUNet2

        fcgf_model = SparseResUNet2(
            in_channels=1, out_channels=8, dim=3, conv1_kernel_size=3,
            normalize_feature=True, channels=(4, 8, 16, 32),
            tr_channels=(8, 8, 8, 16))
        inlier_model = SparseResUNet2(
            in_channels=1, out_channels=1, dim=6, conv1_kernel_size=3,
            with_gmf_fusion=True, image_dim=16, channels=(4, 8, 16, 32),
            tr_channels=(8, 8, 8, 16))
    else:
        fcgf_model = FCGFNet(conv1_kernel_size=tcfg.feat_conv1_kernel_size)
        inlier_model = GMFInlierNet(
            conv1_kernel_size=tcfg.inlier_conv1_kernel_size)
    engine = DeepGlobalRegistration(
        jax.tree.map(np.asarray, fcgf_state),
        jax.tree.map(np.asarray, inlier_state),
        DGRConfig(voxel_size=voxel, use_icp=args.use_icp,
                  clip_weight_thresh=tcfg.clip_weight_thresh,
                  inlier_feature_type=tcfg.inlier_feature_type,
                  descriptor=args.descriptor,
                  **({"safeguard_min_weight": args.safeguard_min_weight,
                      "safeguard_min_frac": 0.0}
                     if args.safeguard_min_weight is not None else {}),
                  **({"voxel_cap_granule": 256, "corr_cap_granule": 256}
                     if args.tiny else {})),
        fcgf_model=fcgf_model, inlier_model=inlier_model,
        frag_cache_bytes=args.frag_cache * (1 << 20))

    # per-fragment host IO cache: with the engine's frag cache on, a
    # cache-hit fragment's cloud/image is loaded only to be ignored by
    # register(); cache the decoded arrays per path instead (read-only,
    # consumers copy/index). The PROCESS-WIDE ByteLRU in utils/lru.py,
    # shared with the 3DMatch loaders under one GMF_FRAG_IO_CACHE_MB
    # budget.
    from gmf_tpu.utils.lru import cache_host_arrays

    def cached_io(key, build):
        return cache_host_arrays(key, lambda: np.asarray(build()))

    # DP over register() streams: each process evaluates a disjoint,
    # strided shard of the pair list (SURVEY §2.6 — "each of the 8 v5e
    # cores evaluates independent pairs"; one process per chip). Shards
    # are merged with --merge-shards.
    from gmf_tpu.parallel.mesh import process_shard

    shard_i = (args.shard_index if args.shard_index is not None
               else jax.process_index())
    shard_n = (args.shard_count if args.shard_count is not None
               else jax.process_count())

    rows = []
    if args.dataset == "3dmatch":
        specs = []  # (scene_index, scene, key, base, i, j, T_gt)
        for si, scene in enumerate(args.scenes or SCENE_LIST):
            gt = load_gt_log(os.path.join(args.root, scene))
            base = os.path.join(args.root, scene, "seq-01")
            for key, T_gt_ts in gt.items():
                i, j = key.split("_")
                specs.append((si, scene, key, base, i, j,
                              np.linalg.inv(T_gt_ts)))
        specs = process_shard(specs, shard_i, shard_n)

        class _PairLoader:
            """Indexable pair IO for the harness thread prefetcher."""

            def __len__(self):
                return len(specs)

            def __getitem__(self, n):
                si, scene, key, base, i, j, T_gt = specs[n]

                def ply(fid):
                    p = os.path.join(base, f"cloud_bin_{fid}.ply")
                    return cached_io(p, lambda: read_ply(p)["xyz"])

                def img(fid):
                    p = os.path.join(base, f"cloud_bin_{fid}_0.png")
                    return cached_io(p, lambda: load_image(p)[None])

                return (si, scene, key, ply(i), ply(j), img(i), img(j),
                        T_gt)

        loader = _PairLoader()
    else:
        # KITTI raw-velodyne protocol (GMF_DGR_fcgf/scripts/test_kitti.py:
        # test sequences 8-10, >=10 m odometry pairs, ICP-refined GT)
        from gmf_tpu.data.kitti_dgr_loader import (
            KITTINMPairDataset, read_velodyne_bin,
        )

        seqs = ([int(s) for s in args.scenes] if args.scenes
                else [8, 9, 10])
        kds = KITTINMPairDataset(args.root, sequences=seqs,
                                 voxel_size=voxel)
        kds.pairs = process_shard(kds.pairs, shard_i, shard_n)

        class _KittiPairLoader:
            def __len__(self):
                return len(kds.pairs)

            def __getitem__(self, n):
                seq, t0, t1 = kds.pairs[n]

                def velo(t):
                    p = kds._velo_path(seq, t)
                    return cached_io(p, lambda: read_velodyne_bin(p))

                def img(t):
                    p = kds._image_path(seq, t)
                    return cached_io(
                        p, lambda: load_image(p, *kds.image_hw)[None])

                xyz0, xyz1 = velo(t0), velo(t1)
                T_gt = kds.gt_transform(seq, t0, t1, xyz0, xyz1).astype(
                    np.float32)
                return (seq, f"{seq:02d}", f"{t0}_{t1}",
                        xyz0, xyz1, img(t0), img(t1), T_gt)

        loader = _KittiPairLoader()

    from gmf_tpu.eval.harness import _iter_with_data_time

    def process(item, res):
        si, scene, key, _x0, _x1, _pi, _qi, T_gt = item
        T = res["trans"]
        tr = float(np.trace(T[:3, :3].T @ T_gt[:3, :3]))
        rre = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
        rte = float(np.linalg.norm(T[:3, 3] - T_gt[:3, 3]))
        ok = (rte < rte_thresh) and (rre < rre_thresh)
        rows.append([float(ok), rre, rte, si,
                     float(res["used_safeguard"])])
        log.info(f"{scene} {key}: {'OK' if ok else 'FAIL'} "
                 f"rre={rre:.2f} rte={rte:.3f}")

    def frag_keys(item):
        # key is "<i>_<j>" (3DMatch fragment ids / KITTI frame ids);
        # scope by scene so ids never collide across scenes/sequences
        _si, scene, key = item[:3]
        a, b = key.split("_")
        return {"cache_key0": f"{scene}:{a}", "cache_key1": f"{scene}:{b}"}

    items = _iter_with_data_time(loader, args.workers)
    if args.overlap > 1:
        import collections
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=args.overlap) as ex:
            inflight = collections.deque()
            for item, _dt in items:
                inflight.append((item, ex.submit(
                    engine.register, *item[3:7], **frag_keys(item))))
                if len(inflight) >= args.overlap:
                    it, fut = inflight.popleft()
                    process(it, fut.result())
            while inflight:
                it, fut = inflight.popleft()
                process(it, fut.result())
    else:
        for item, _dt in items:
            process(item, engine.register(*item[3:7], **frag_keys(item)))

    stats = np.asarray(rows)
    recall = stats[:, 0].mean() * 100
    ok = stats[stats[:, 0] == 1]
    shard_tag = (f" [shard {shard_i}/{shard_n}]" if shard_n > 1 else "")
    log.info(f"All {len(stats)} pairs{shard_tag}, recall={recall:.2f}% "
             f"rre={ok[:, 1].mean() if len(ok) else float('nan'):.2f} "
             f"rte={ok[:, 2].mean() if len(ok) else float('nan'):.3f} "
             f"safeguard used {stats[:, 4].mean() * 100:.1f}%"
             + (f", frag-cache hits {engine.frag_cache_hits}/"
                f"{2 * len(stats)}" if args.frag_cache else ""))
    os.makedirs(args.out, exist_ok=True)
    name = (f"dgr_stats_shard{shard_i}of{shard_n}.npy" if shard_n > 1
            else "dgr_stats.npy")
    np.save(os.path.join(args.out, name), stats)


if __name__ == "__main__":
    main()
