"""Baseline method tests: SM / PMC / RANSAC must solve easy problems."""

import numpy as np
import pytest

from gmf_tpu.eval.baselines import make_baseline_register_fn


def make_pair(rng, N=200, inlier_ratio=0.5):
    ang = 0.6
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([0.3, 0.1, -0.2], np.float32)
    src = rng.rand(N, 3).astype(np.float32) * 2
    tgt = src @ R.T + t + 0.004 * rng.randn(N, 3).astype(np.float32)
    n_out = int(N * (1 - inlier_ratio))
    idx = rng.choice(N, n_out, replace=False)
    tgt[idx] = rng.rand(n_out, 3) * 2
    corr_pos = np.concatenate([src - src.mean(0), tgt - tgt.mean(0)], -1)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3], T_gt[:3, 3] = R, t
    return {
        "corr_pos": corr_pos.astype(np.float32),
        "src_keypts": src, "tgt_keypts": tgt,
        "gt_trans": T_gt, "labels": np.ones(N, np.float32),
    }, T_gt


@pytest.mark.parametrize("method,atol_r,atol_t", [
    ("SM", 0.05, 0.05),
    ("PMC", 0.02, 0.03),
    ("RANSAC", 0.02, 0.03),
    ("GCRANSAC", 0.02, 0.03),
])
def test_baseline_registers(rng, method, atol_r, atol_t):
    pair, T_gt = make_pair(rng)
    fn = make_baseline_register_fn(method, inlier_threshold=0.10,
                                   max_iteration=2048)
    trans, labels = fn(pair)
    np.testing.assert_allclose(trans[:3, :3], T_gt[:3, :3], atol=atol_r)
    np.testing.assert_allclose(trans[:3, 3], T_gt[:3, 3], atol=atol_t)
    assert labels.sum() >= 3


def test_gcransac_gated(rng):
    """Without the pygcransac wheel AND without a C++ toolchain,
    GC-RANSAC must fail at CONSTRUCTION with BaselineUnavailable so
    eval CLIs can log a skip up front."""
    from gmf_tpu.eval.baselines import BaselineUnavailable, gcransac_available

    if gcransac_available():
        pytest.skip("a GC-RANSAC backend is available; gate not exercised")
    with pytest.raises(BaselineUnavailable):
        make_baseline_register_fn("GCRANSAC")


class TestNativeGCRANSAC:
    """The first-party Graph-Cut RANSAC solver (cpp/gcransac)."""

    def _skip_unless_native(self):
        from gmf_tpu.utils.gcransac import native_available

        if not native_available():
            pytest.skip("no C++ toolchain to build cpp/gcransac")

    def test_low_inlier_ratio(self, rng):
        """25% inliers at N=600: the spatial-coherence graph cut should
        still recover the transform plain thresholding struggles with."""
        self._skip_unless_native()
        from gmf_tpu.utils.gcransac import gcransac_rigid

        pair, T_gt = make_pair(rng, N=600, inlier_ratio=0.25)
        pose, mask = gcransac_rigid(
            pair["src_keypts"], pair["tgt_keypts"], threshold=0.05,
            max_iters=4000, seed=3)
        np.testing.assert_allclose(pose[:3, :3], T_gt[:3, :3], atol=0.02)
        np.testing.assert_allclose(pose[:3, 3], T_gt[:3, 3], atol=0.03)
        assert mask.sum() >= 0.2 * 600

    def test_deterministic(self, rng):
        self._skip_unless_native()
        from gmf_tpu.utils.gcransac import gcransac_rigid

        pair, _ = make_pair(rng, N=300)
        a = gcransac_rigid(pair["src_keypts"], pair["tgt_keypts"],
                           threshold=0.05, max_iters=1000, seed=7)
        b = gcransac_rigid(pair["src_keypts"], pair["tgt_keypts"],
                           threshold=0.05, max_iters=1000, seed=7)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_degenerate_inputs(self):
        self._skip_unless_native()
        from gmf_tpu.utils.gcransac import gcransac_rigid

        pose, mask = gcransac_rigid(np.zeros((2, 3)), np.zeros((2, 3)),
                                    threshold=0.05)
        np.testing.assert_allclose(pose, np.eye(4))
        assert mask.sum() == 0

    def test_mask_matches_pose_residuals(self, rng):
        """The returned mask must be exactly the sub-threshold residual
        set under the returned pose."""
        self._skip_unless_native()
        from gmf_tpu.utils.gcransac import gcransac_rigid

        pair, _ = make_pair(rng, N=400, inlier_ratio=0.5)
        pose, mask = gcransac_rigid(pair["src_keypts"], pair["tgt_keypts"],
                                    threshold=0.05, max_iters=1500, seed=1)
        warped = pair["src_keypts"] @ pose[:3, :3].T + pose[:3, 3]
        r = np.linalg.norm(warped - pair["tgt_keypts"], axis=1)
        np.testing.assert_array_equal(mask, (r < 0.05).astype(np.float32))


def test_unknown_method_rejected():
    with pytest.raises(ValueError):
        make_baseline_register_fn("BOGUS")
