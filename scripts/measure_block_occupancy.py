"""Cost-model measurement for the compacted block-sparse 6-D conv.

Builds the 6-D inlier-net pyramid ON HOST for the profile script's
synthetic pair (uniform / surface cloud, random / oracle matches) and
reports, per kernel map and block width W:

  rows_dense   = K_kept * M          (what sparse_conv gathers today)
  rows_compact = sum_k ceil-padded active-block columns under the
                 two-tier split (offsets with > frac*M hits stay dense)

to decide the block width and tier threshold before implementing.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def stair_cost(bc_sorted, w, M, G):
    """Min total padded rows covering sorted block counts with G groups
    (each group padded to its max, i.e. its last element). O(K^2 G) DP is
    overkill; exact DP over split points, K<=729 so fine for G<=4."""
    bc = bc_sorted
    K = len(bc)
    if K == 0:
        return 0
    INF = np.inf
    top = np.minimum(bc.astype(np.float64) * w, M)     # [K], for i-1
    I = np.arange(K + 1)
    prev = np.full(K + 1, INF)
    prev[0] = 0.0
    for _ in range(G):
        # cur[i] = min_{j<i} prev[j] + (i-j)*top[i-1]
        A = prev[:, None] + (I[None, 1:] - I[:, None]) * top[None, :]
        A[I[:, None] >= I[None, 1:]] = INF
        cur = np.concatenate([[0.0], A.min(0)])
        prev = np.minimum(prev, cur)
    return float(prev[K])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pts", type=int, default=40000)
    ap.add_argument("--cloud", choices=["uniform", "surface"],
                    default="uniform")
    ap.add_argument("--matches", choices=["random", "oracle"],
                    default="random")
    args = ap.parse_args()

    from gmf_tpu.models.dgr import DGRConfig
    from gmf_tpu.sparse.kernel_map import build_pyramid
    from gmf_tpu.sparse.voxelize import sparse_quantize

    cfg = DGRConfig()
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
        nn01 = cKDTree(xyz1[s1]).query(xyz0[s0])[1]
    corr6d = np.concatenate([c0, c1[nn01]], axis=1)
    uniq, _ = sparse_quantize(corr6d.astype(np.float64), 1.0)
    print(f"{args.cloud}/{args.matches}: voxels {len(c0)}  uniq6d {len(uniq)}")

    pyr = build_pyramid(uniq.astype(np.int32), 4, conv1_kernel_size=3,
                        granule=512)

    uses = {"self_0": 5, "self_1": 4, "self_2": 4, "self_3": 2,
            "down_0": 1, "down_1": 1, "down_2": 1,
            "up_0": 1, "up_1": 1, "up_2": 1}
    tot = {w: 0.0 for w in (1, 8, 16, 32)}
    tot_dense = 0.0
    for l, lv in enumerate(pyr.levels):
        maps = [(f"self_{l}", lv.self_map, lv.cap)]
        if lv.down_map is not None:
            cap_next = pyr.levels[l + 1].cap
            maps.append((f"down_{l}", lv.down_map, cap_next))
            maps.append((f"up_{l}", lv.up_map, lv.cap))
        for name, nbr, M in maps:
            K = nbr.shape[0]
            sent = nbr.max()  # sentinel == cap_in; hits are < num_valid
            hit = nbr != np.max(nbr)
            counts = hit.sum(1)
            real = int(counts.sum())
            rows_dense = K * M
            line = (f"  {name:7s} K={K:4d} M={M:6d} real={real:9d} "
                    f"dense={rows_dense / 1e6:7.2f}M")
            for w in (1, 8, 16, 32):
                nb = -(-M // w)
                pad = (-M) % w
                h = hit
                if pad:
                    h = np.concatenate(
                        [hit, np.zeros((K, pad), bool)], axis=1)
                act = h.reshape(K, nb, w).any(2)       # [K, nb]
                bc = np.sort(act.sum(1))               # blocks per offset
                flat = int(bc.sum()) * w
                # staircase: split sorted bc into G groups, each padded to
                # its own max; heaviest group may as well run dense if its
                # Bmax*w ~ M. Greedy split at the largest relative jumps.
                G = 4
                rows = stair_cost(bc, w, M, G)
                line += f" | w{w}: {rows / 1e6:6.2f}M (flat {flat/1e6:.2f})"
                tot[w] += uses[name] * rows
            tot_dense += uses[name] * rows_dense
            print(line)
    print(f"forward totals: dense {tot_dense / 1e6:.1f}M rows; " +
          "  ".join(f"w{w} {v / 1e6:.1f}M" for w, v in tot.items()))


if __name__ == "__main__":
    main()
