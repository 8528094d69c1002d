"""analyze_stats vs the reference's ACTUAL shipped results artifact.

GMF_DGR_fcgf/assets/results.npz is the DGR paper's 10-method x 1623-pair
x 5-stat result tensor. Our port of scripts/analyze_stats.py must
reproduce the published aggregates from it — this is real-data parity
evidence, not a synthetic fixture.
"""

import os

import numpy as np
import pytest

from gmf_tpu.tools.analyze_stats import (
    analyze_by_pair, analyze_by_scene, precision_recall_curves,
    summarize_methods,
)

_REF_NPZ = ("/root/reference/GMF_DeepGlobalRegistration/"
            "GMF_DeepGlobalRegistration_fcgf/assets/results.npz")


@pytest.fixture(scope="module")
def ref_results():
    if not os.path.exists(_REF_NPZ):
        pytest.skip("reference results.npz not mounted")
    d = np.load(_REF_NPZ, allow_pickle=True)
    return [str(n) for n in d["names"]], d["stats"]


def test_reproduces_dgr_paper_table(ref_results):
    """'Ours' at 0.3 m / 15 deg must give the DGR paper's published
    numbers (recall 91.31%, TE 7.34 cm, RE 2.43 deg — the same values
    SURVEY.md cites from GMF_DGR_fcgf/README.md:73-75)."""
    names, stats = ref_results
    agg = analyze_by_pair(stats, rte_thresh=0.3, rre_thresh=15.0)
    ours = agg[names.index("Ours")]
    assert abs(ours[0] - 0.9131) < 5e-4, ours
    assert abs(ours[1] - 0.0734) < 5e-4          # TE (m)
    assert abs(ours[2] - 2.430) < 5e-3           # RE (deg)
    # sanity on the classical baselines the paper compares against
    ransac = agg[names.index("RANSAC")]
    assert 0.70 < ransac[0] < 0.72
    assert agg[names.index("DCP")][0] < 0.02


def test_by_scene_shapes_and_consistency(ref_results):
    names, stats = ref_results
    scenes = np.unique(stats[0, :, 4]).astype(int)
    assert len(scenes) == 8  # the 8 3DMatch test scenes
    by_scene = analyze_by_scene(stats, scenes)
    assert by_scene.shape == (len(names), 8, 4)
    # scene recalls bracket the overall recall
    agg = analyze_by_pair(stats, 0.3, 15.0)
    m = names.index("Ours")
    assert by_scene[m, :, 0].min() <= agg[m, 0] <= by_scene[m, :, 0].max()
    assert np.all((by_scene[:, :, 0] >= 0) & (by_scene[:, :, 0] <= 1))


def test_precision_recall_curves_monotone(ref_results):
    names, stats = ref_results
    rre_p = [3.0, 5.0, 10.0, 15.0]
    rte_p = [0.05, 0.1, 0.2, 0.3]
    rre_c, rte_c = precision_recall_curves(stats, rte_p, rre_p)
    assert rre_c.shape == (len(names), 4)
    # looser threshold can only admit more pairs
    assert np.all(np.diff(rre_c, axis=1) >= 0)
    assert np.all(np.diff(rte_c, axis=1) >= 0)


def test_summarize_methods_table(ref_results):
    names, stats = ref_results
    table = summarize_methods(names, stats)
    assert "Ours" in table and "91.31%" in table
