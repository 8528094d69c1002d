"""Evaluation harnesses and classical baselines.

Reference parity targets (SURVEY.md §2.2 P12-P14, P18):
- evaluation/test_3DMatch.py / test_KITTI.py / test_3DLoMatch.py
  -> harness.py (12-column per-pair stats, scene + pair aggregation)
- baseline_scripts/ (SM / RANSAC / PMC / GC-RANSAC) -> baselines.py
"""

from gmf_tpu.eval.harness import (
    PairStats,
    evaluate_pairs,
    aggregate_scenes,
    format_report,
    STAT_COLUMNS,
)
