"""RANSAC / ICP / eval-harness tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gmf_tpu.geometry.ransac import ransac_registration
from gmf_tpu.geometry.icp import icp_refine
from gmf_tpu.eval import evaluate_pairs, aggregate_scenes, format_report


def make_problem(rng, N=300, outlier_ratio=0.7, noise=0.003):
    ang = 1.1
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    t = np.array([0.2, 0.5, -0.1], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t
    src = rng.rand(N, 3).astype(np.float32) * 2
    tgt = src @ R.T + t + noise * rng.randn(N, 3).astype(np.float32)
    n_out = int(N * outlier_ratio)
    out_idx = rng.choice(N, n_out, replace=False)
    tgt[out_idx] = rng.rand(n_out, 3) * 2
    return src, tgt, T


class TestRansac:
    def test_recovers_under_heavy_outliers(self, rng):
        src, tgt, T_gt = make_problem(rng, outlier_ratio=0.8)
        T, inliers, fitness = ransac_registration(
            jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(tgt),
            inlier_threshold=0.05, num_iters=2048, chunk=512)
        T = np.asarray(T)
        np.testing.assert_allclose(T[:3, :3], T_gt[:3, :3], atol=5e-3)
        np.testing.assert_allclose(T[:3, 3], T_gt[:3, 3], atol=1e-2)
        assert float(fitness) > 0.15

    def test_masked(self, rng):
        src, tgt, T_gt = make_problem(rng, N=200, outlier_ratio=0.5)
        # append garbage rows, masked out
        src_p = np.concatenate([src, rng.rand(56, 3).astype(np.float32) * 9])
        tgt_p = np.concatenate([tgt, rng.rand(56, 3).astype(np.float32) * 9])
        mask = np.concatenate([np.ones(200, np.float32), np.zeros(56, np.float32)])
        T, _, fit = ransac_registration(
            jax.random.PRNGKey(1), jnp.asarray(src_p), jnp.asarray(tgt_p),
            inlier_threshold=0.05, num_iters=2048, chunk=512,
            mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(T)[:3, :3], T_gt[:3, :3],
                                   atol=1e-2)

    def test_masked_never_samples_padding(self, rng):
        # Padded rows are NaN: if any hypothesis sampled them, the winning
        # transform could not be exact/finite. The valid-index remap
        # guarantees padding never enters a hypothesis triple.
        src, tgt, T_gt = make_problem(rng, N=64, outlier_ratio=0.3,
                                      noise=0.0)
        pad = np.full((192, 3), np.nan, np.float32)
        mask = np.concatenate([np.ones(64, np.float32),
                               np.zeros(192, np.float32)])
        T, _, fit = ransac_registration(
            jax.random.PRNGKey(2), jnp.asarray(np.concatenate([src, pad])),
            jnp.asarray(np.concatenate([tgt, pad])),
            inlier_threshold=0.05, num_iters=1024, chunk=256,
            mask=jnp.asarray(mask))
        T = np.asarray(T)
        assert np.all(np.isfinite(T))
        np.testing.assert_allclose(T[:3, :3], T_gt[:3, :3], atol=1e-4)
        np.testing.assert_allclose(T[:3, 3], T_gt[:3, 3], atol=1e-4)


class TestICP:
    def test_polishes_coarse_init(self, rng):
        src = rng.rand(400, 3).astype(np.float32) * 2
        ang = 0.5
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        t = np.array([0.1, 0.2, 0.0], np.float32)
        tgt = src @ R.T + t
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, :3], T_gt[:3, 3] = R, t
        # perturb the init by a few degrees / cm
        d = 0.05
        Rp = np.array([[np.cos(d), -np.sin(d), 0],
                       [np.sin(d), np.cos(d), 0], [0, 0, 1]], np.float32)
        T0 = T_gt.copy()
        T0[:3, :3] = Rp @ T_gt[:3, :3]
        T0[:3, 3] += 0.03
        T = np.asarray(icp_refine(jnp.asarray(src), jnp.asarray(tgt),
                                  jnp.asarray(T0), max_corr_dist=0.3,
                                  num_iters=30))
        np.testing.assert_allclose(T[:3, :3], T_gt[:3, :3], atol=1e-3)
        np.testing.assert_allclose(T[:3, 3], T_gt[:3, 3], atol=5e-3)

    def test_point_to_plane_beats_point_to_point_on_resampled_surface(
            self, rng):
        """Two INDEPENDENT samplings of a smooth surface: point-to-point
        NN has a tangential bias that stalls the estimate; point-to-plane
        (the depth-odometry objective) converges to the true offset."""
        from gmf_tpu.geometry.icp import icp_point_to_plane
        from gmf_tpu.ops.fpfh import estimate_normals

        def surf(n, x0, x1, seed):
            r = np.random.RandomState(seed)
            x = r.uniform(x0, x1, n)
            y = r.uniform(-1.0, 1.0, n)
            z = (0.3 * np.exp(-((x - 0.4) ** 2 + y ** 2) / 0.15)
                 - 0.2 * np.exp(-((x + 0.5) ** 2 + (y - 0.4) ** 2) / 0.1))
            return np.stack([x, y, z], 1).astype(np.float32)

        t_gt = np.array([0.12, 0.05, 0.0], np.float32)
        A = surf(1500, -1.0, 1.0, 0)
        B = surf(1500, -1.0, 1.0, 1) - t_gt  # frame-B coords
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, 3] = t_gt
        nA = estimate_normals(jnp.asarray(A), radius=0.2)
        T_pl = np.asarray(icp_point_to_plane(
            jnp.asarray(B), jnp.asarray(A), nA,
            jnp.asarray(np.eye(4, dtype=np.float32)),
            max_corr_dist=0.3, num_iters=50))
        T_pp = np.asarray(icp_refine(
            jnp.asarray(B), jnp.asarray(A),
            jnp.asarray(np.eye(4, dtype=np.float32)),
            max_corr_dist=0.3, num_iters=50))
        err_pl = np.linalg.norm(T_pl[:3, 3] - t_gt)
        err_pp = np.linalg.norm(T_pp[:3, 3] - t_gt)
        assert err_pl < 0.02, (err_pl, T_pl)
        assert err_pl < err_pp, (err_pl, err_pp)

    def test_point_to_plane_degenerate_inputs_stay_finite(self, rng):
        """All-far clouds (no matches) must return the init unchanged."""
        from gmf_tpu.geometry.icp import icp_point_to_plane

        src = rng.rand(100, 3).astype(np.float32)
        tgt = rng.rand(100, 3).astype(np.float32) + 100.0
        n = np.tile(np.array([0, 0, 1], np.float32), (100, 1))
        T0 = np.eye(4, dtype=np.float32)
        T = np.asarray(icp_point_to_plane(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(n),
            jnp.asarray(T0), max_corr_dist=0.1, num_iters=10))
        np.testing.assert_array_equal(T, T0)


class TestHarness:
    def test_stats_and_aggregation(self, rng):
        src, tgt, T_gt = make_problem(rng, N=100, outlier_ratio=0.0)
        pair = {
            "src_keypts": src, "tgt_keypts": tgt, "gt_trans": T_gt,
            "labels": np.ones(100, np.float32),
        }

        def perfect(p):
            return T_gt, np.ones(100, np.float32)

        def broken(p):
            return np.eye(4, dtype=np.float32), np.zeros(100, np.float32)

        stats_good = evaluate_pairs(perfect, [pair, pair])
        stats_bad = evaluate_pairs(broken, [pair], scene_index=1)
        assert stats_good.shape == (2, 12)
        assert stats_good[:, 0].all()
        assert stats_bad[0, 0] == 0
        agg = aggregate_scenes({"s0": stats_good, "s1": stats_bad})
        np.testing.assert_allclose(agg["recall_pct"], 200 / 3, atol=0.1)
        assert agg["num_pairs"] == 3
        report = format_report(agg)
        assert "Mean Reg Recall=66.67%" in report
