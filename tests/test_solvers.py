"""Eval solver wrapper: RANSAC post-filter + ICP refine paths.

Parity targets: GMF_PointDSC/evaluation/test_3DMatch.py:72-96 (solver
switch; RANSAC on the model's predicted inliers, ransac_n=3, 5000
iters) and benchmark_utils.py:40-56 (ICP at fixed 0.10 distance).
"""

import numpy as np

from gmf_tpu.eval.solvers import make_register_fn


def make_pair(rng, N=200, inlier_ratio=0.6):
    ang = 0.5
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([0.2, -0.1, 0.3], np.float32)
    src = rng.rand(N, 3).astype(np.float32) * 2
    tgt = src @ R.T + t + 0.003 * rng.randn(N, 3).astype(np.float32)
    out = rng.rand(N) >= inlier_ratio
    tgt[out] = rng.rand(out.sum(), 3) * 2
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3], T_gt[:3, 3] = R, t
    labels = (~out).astype(np.float32)
    return {"src_keypts": src, "tgt_keypts": tgt}, T_gt, labels


def test_ransac_solver_refits_on_predicted_inliers(rng):
    pair, T_gt, labels = make_pair(rng)

    def registrar(p):
        # model stub: garbage transform but correct inlier labels — the
        # RANSAC post-filter must recover the pose from the labels alone
        return np.eye(4, dtype=np.float32), labels

    fn = make_register_fn(registrar, solver="RANSAC",
                          inlier_threshold=0.10, ransac_iters=2000)
    trans, out_labels = fn(pair)
    np.testing.assert_allclose(trans[:3, :3], T_gt[:3, :3], atol=0.02)
    np.testing.assert_allclose(trans[:3, 3], T_gt[:3, 3], atol=0.03)
    assert out_labels.sum() >= 0.8 * labels.sum()


def test_ransac_solver_skips_with_too_few_inliers(rng):
    pair, T_gt, labels = make_pair(rng)
    few = np.zeros_like(labels)
    few[:2] = 1.0

    def registrar(p):
        return np.eye(4, dtype=np.float32), few

    fn = make_register_fn(registrar, solver="RANSAC")
    trans, out_labels = fn(pair)
    # <3 kept correspondences: wrapper keeps the registrar's output
    np.testing.assert_allclose(trans, np.eye(4))


def test_icp_refine_improves_coarse_transform(rng):
    pair, T_gt, labels = make_pair(rng, inlier_ratio=1.0)

    def registrar(p):
        T = T_gt.copy()
        T[:3, 3] += np.array([0.03, -0.02, 0.02], np.float32)  # coarse
        return T, labels

    base_err = 0.03
    fn = make_register_fn(registrar, use_icp=True)
    trans, _ = fn(pair)
    err = np.linalg.norm(trans[:3, 3] - T_gt[:3, 3])
    assert err < base_err, (err, base_err)
