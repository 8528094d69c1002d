"""Per-conv timing of the 6-D GMF inlier net at a real register() workload.

profile_dgr_register --split-e showed phase E1 (the inlier-net forward)
is the largest single chunk of register(); this script breaks E1 down by
timing every sparse conv of the net (resunet.py SparseResUNet2 wiring)
individually on its REAL compact schedule for the synthetic pair, plus
the fusion/image stack, so the optimization target is a measured line,
not a guess.

Relay-floor handling: each conv is dispatched R times back-to-back and
synced once at the end (executions serialize on-device), so the ~50 ms
tunnel floor is amortized 1/R instead of polluting every row.

Usage: python scripts/profile_inlier_convs.py [--pts 40000] [--bf16]
       [--matches random|oracle] [--cloud uniform|surface] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pts", type=int, default=40000)
    ap.add_argument("--cloud", choices=["uniform", "surface"],
                    default="uniform")
    ap.add_argument("--matches", choices=["random", "oracle"],
                    default="random")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scatter-mode", choices=["flat", "rowwise"],
                    default="flat")
    ap.add_argument("--dense-frac", type=float, default=0.5,
                    help="plan_tiles dense-tier threshold (fraction of "
                         "M above which an offset stays dense)")
    ap.add_argument("--full", action="store_true",
                    help="also init the real GMFInlierNet and time the "
                         "whole apply (reconciles sum-of-convs vs E1: "
                         "the remainder is image encoder + fusion + BN "
                         "+ 1x1 heads + XLA overhead)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gmf_tpu.models.dgr import DGRConfig
    from gmf_tpu.sparse.conv import sparse_conv_compact
    from gmf_tpu.sparse.device_maps import build_pyramid_arrays_device
    from gmf_tpu.sparse.voxelize import sparse_quantize

    cfg = DGRConfig()
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    rng = np.random.RandomState(0)
    if args.cloud == "surface":
        side = (args.pts * 0.9) ** 0.5 * cfg.voxel_size
        xy = rng.rand(args.pts, 2) * side
        z = (0.3 * side * (np.sin(xy[:, 0] * 4 / side)
                           + np.cos(xy[:, 1] * 5 / side)))
        xyz0 = np.concatenate([xy, z[:, None]], 1).astype(np.float32)
    else:
        box = (args.pts * 0.7) ** (1 / 3) * cfg.voxel_size
        xyz0 = (rng.rand(args.pts, 3) * box).astype(np.float32)
    ang = 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([0.3, -0.2, 0.4], np.float32)
    xyz1 = (xyz0 @ R.T + t + 0.3 * cfg.voxel_size *
            rng.randn(args.pts, 3)).astype(np.float32)
    c0, s0 = sparse_quantize(xyz0, cfg.voxel_size, return_index=True)
    c1, s1 = sparse_quantize(xyz1, cfg.voxel_size, return_index=True)
    if args.matches == "random":
        nn01 = rng.randint(0, len(c1), len(c0))
    else:
        from scipy.spatial import cKDTree
        warped = (xyz0[s0] @ R.T + t)
        nn01 = cKDTree(xyz1[s1]).query(warped)[1]
    corr6d = np.concatenate([c0, c1[nn01]], axis=1)
    uniq, _ = sparse_quantize(corr6d.astype(np.float64), 1.0)
    print(f"backend: {jax.default_backend()}  "
          f"voxels {len(c0)}  uniq6d {len(uniq)}  dtype {dt.__name__}")

    t0 = time.perf_counter()
    arrays = build_pyramid_arrays_device(
        uniq.astype(np.int32), 4, conv1_kernel_size=3,
        granule=cfg.corr_cap_granule, compact_conv=True,
        compact_dense_frac=args.dense_frac)
    # settle: fetch one leaf of each schedule
    for k, v in arrays.items():
        for leaf in jax.tree_util.tree_leaves(v):
            np.asarray(leaf[..., :1])
            break
    print(f"pyramid build (cold-ish): {time.perf_counter() - t0:.2f} s")
    caps = [arrays[f"mask_{l}"].shape[0] for l in range(4)]
    print(f"caps: {caps}")

    KV = 729

    # (label, sched key, Cin, Cout, cap_in, cap_out, multiplicity)
    convs = [
        ("conv1      1->32 ", "conv1_cmp", 1, 32, caps[0], caps[0], 1),
        ("block1 self0  32 ", "self_cmp_0", 32, 32, caps[0], caps[0], 2),
        ("conv2  down0->64 ", "down_cmp_0", 32, 64, caps[0], caps[1], 1),
        ("block2 self1  64 ", "self_cmp_1", 64, 64, caps[1], caps[1], 2),
        ("conv3  down1->128", "down_cmp_1", 64, 128, caps[1], caps[2], 1),
        ("block3 self2 128 ", "self_cmp_2", 128, 128, caps[2], caps[2], 2),
        ("conv4  down2->256", "down_cmp_2", 128, 256, caps[2], caps[3], 1),
        ("block4 self3 256 ", "self_cmp_3", 256, 256, caps[3], caps[3], 2),
        ("conv4_tr up2->64 ", "up_cmp_2", 256, 64, caps[3], caps[2], 1),
        ("blk4_tr self2 64 ", "self_cmp_2", 64, 64, caps[2], caps[2], 2),
        ("conv3_tr up1->64 ", "up_cmp_1", 192, 64, caps[2], caps[1], 1),
        ("blk3_tr self1 64 ", "self_cmp_1", 64, 64, caps[1], caps[1], 2),
        ("conv2_tr up0->64 ", "up_cmp_0", 128, 64, caps[1], caps[0], 1),
        ("blk2_tr self0 64 ", "self_cmp_0", 64, 64, caps[0], caps[0], 2),
    ]

    from functools import partial

    @partial(jax.jit, static_argnames=("out_rows", "mode"))
    def run_conv(x, w, sched, out_rows, mode):
        return sparse_conv_compact(x, w, sched, out_rows,
                                   scatter_mode=mode)

    def sched_stats(s):
        d = 0 if s["dense"] is None else int(np.prod(s["dense"][0].shape))
        tiles = sum(int(g[0].shape[0]) for g in s["groups"])
        return d, tiles

    key = jax.random.PRNGKey(0)
    total = 0.0
    print(f"{'conv':18s} {'densRows':>9s} {'tiles':>6s} "
          f"{'ms/call':>8s} {'x':>2s} {'ms tot':>7s}")
    for label, skey, cin, cout, cap_in, cap_out, mult in convs:
        sched = arrays[skey]
        x = jax.random.normal(key, (cap_in + 1, cin), dtype=dt)
        w = jax.random.normal(key, (KV, cin, cout), dtype=dt) * 0.05
        out = run_conv(x, w, sched, out_rows=cap_out,
                       mode=args.scatter_mode)
        np.asarray(out[:1, :1])                       # compile + settle
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = run_conv(x, w, sched, out_rows=cap_out,
                           mode=args.scatter_mode)
        np.asarray(out[:1, :1])
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        d, tiles = sched_stats(sched)
        total += ms * mult
        print(f"{label:18s} {d:9d} {tiles:6d} {ms:8.2f} {mult:2d} "
              f"{ms * mult:7.1f}")
    print(f"{'sum of convs':18s} {'':9s} {'':6s} {'':8s} {'':2s} "
          f"{total:7.1f}")

    if args.full:
        from gmf_tpu.sparse.resunet import GMFInlierNet

        net = GMFInlierNet(dtype=dt)
        H, W = cfg.image_hw
        p_img = jnp.zeros((1, H, W, 3), jnp.float32)
        q_img = jnp.zeros((1, H, W, 3), jnp.float32)
        feats = jnp.ones((caps[0], 1), jnp.float32)
        variables = jax.jit(net.init)(jax.random.PRNGKey(1), feats,
                                      arrays, p_image=p_img, q_image=q_img)

        @jax.jit
        def apply(v, f, a, p, q):
            return net.apply(v, f, a, p_image=p, q_image=q)

        out = apply(variables, feats, arrays, p_img, q_img)
        np.asarray(out[:1, :1])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = apply(variables, feats, arrays, p_img, q_img)
        np.asarray(out[:1, :1])
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{'FULL net apply':18s} {'':9s} {'':6s} {'':8s} {'':2s} "
              f"{ms:7.1f}   (minus convs: {ms - total:.1f} ms = image "
              f"encoder + fusion + BN + heads + overhead)")


if __name__ == "__main__":
    main()
