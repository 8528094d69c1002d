"""Offline analysis of saved 12-column eval stats.

Parity: GMF_DGR scripts/analyze_stats.py — recall / RE / TE / timing
summaries and per-scene breakdowns from the .npy stats the eval harness
writes.

Usage: python -m gmf_tpu.tools.analyze_stats stats.npy [stats2.npy ...]
"""

from __future__ import annotations

import argparse

import numpy as np


def summarize(stats: np.ndarray) -> str:
    ok = stats[stats[:, 0] == 1]
    lines = [
        f"pairs: {len(stats)}  recall: {stats[:, 0].mean() * 100:.2f}%",
        (f"RE (success only): {ok[:, 1].mean():.3f} deg  "
         f"TE: {ok[:, 2].mean():.3f} cm" if len(ok) else "no successes"),
        (f"inliers in: {stats[:, 3].mean():.1f} "
         f"(ratio {stats[:, 4].mean() * 100:.2f}%)  "
         f"out: {stats[:, 5].mean():.1f}"),
        (f"precision: {stats[:, 6].mean() * 100:.2f}%  "
         f"recall: {stats[:, 7].mean() * 100:.2f}%  "
         f"f1: {stats[:, 8].mean() * 100:.2f}%"),
        (f"model time: {stats[:, 9].mean():.4f}s  "
         f"data time: {stats[:, 10].mean():.4f}s  "
         f"pairs/sec (model): {1.0 / max(stats[:, 9].mean(), 1e-9):.2f}"),
    ]
    # per-scene breakdown when multiple scene indices present
    scenes = np.unique(stats[:, 11])
    if len(scenes) > 1:
        for s in scenes:
            sub = stats[stats[:, 11] == s]
            lines.append(f"  scene {int(s)}: recall "
                         f"{sub[:, 0].mean() * 100:.2f}% ({len(sub)} pairs)")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stats", nargs="+")
    args = ap.parse_args()
    for path in args.stats:
        stats = np.load(path)
        print(f"== {path} ==")
        print(summarize(stats))


if __name__ == "__main__":
    main()
