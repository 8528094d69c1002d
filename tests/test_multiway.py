"""Multiway pose-graph registration tests."""

import numpy as np

from gmf_tpu.apps.multiway import (
    PoseGraph, PoseGraphEdge, optimize_pose_graph, multiway_register,
    se3_exp, se3_log, read_trajectory, write_trajectory, ate_rmse,
)


class TestSE3Maps:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.randn(6) * 0.5
        T = se3_exp(xi)
        np.testing.assert_allclose(se3_log(T), xi, atol=1e-8)
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3),
                                   atol=1e-10)

    def test_small_angle(self):
        xi = np.array([1e-12, 0, 0, 0, 1e-12, 0])
        T = se3_exp(xi)
        np.testing.assert_allclose(se3_log(T), xi, atol=1e-10)


class TestPoseGraphOptimization:
    def test_noisy_odometry_with_loop_closure(self, rng):
        """A ring of 6 poses: noisy odometry + exact loop closure must pull
        the trajectory back to (near) ground truth."""
        n = 6
        gt = [np.eye(4)]
        for i in range(1, n):
            gt.append(gt[-1] @ se3_exp(rng.randn(6) * 0.3))

        edges = []
        nodes = [np.eye(4)]
        for i in range(n - 1):
            T_rel = np.linalg.inv(gt[i]) @ gt[i + 1]
            noisy = T_rel @ se3_exp(rng.randn(6) * 0.03)
            nodes.append(nodes[-1] @ noisy)
            edges.append(PoseGraphEdge(i, i + 1, noisy))
        # exact loop-closure edges to the first pose
        for j in (n - 1, n - 2):
            T_rel = np.linalg.inv(gt[0]) @ gt[j]
            edges.append(PoseGraphEdge(0, j, T_rel, np.eye(6) * 10,
                                       uncertain=True))

        graph = optimize_pose_graph(PoseGraph(nodes=nodes, edges=edges),
                                    max_iterations=60)
        err_before = ate_rmse(nodes, gt, align=False)
        err_after = ate_rmse(graph.nodes, gt, align=False)
        assert err_after < err_before * 0.7, (err_before, err_after)

    def test_perfect_edges_zero_residual(self, rng):
        gt = [np.eye(4), se3_exp(rng.randn(6) * 0.2)]
        edges = [PoseGraphEdge(0, 1, gt[1])]
        graph = optimize_pose_graph(
            PoseGraph(nodes=[np.eye(4), np.eye(4)], edges=edges))
        np.testing.assert_allclose(graph.nodes[1], gt[1], atol=1e-4)


class TestMultiwayRegister:
    def test_chain_of_fragments(self, rng):
        """Fragments = transformed copies of one cloud; a Kabsch-based
        register_fn must chain into consistent absolute poses."""
        base = rng.rand(100, 3).astype(np.float32)
        gt_poses = [np.eye(4)]
        frags = [base]
        for i in range(3):
            T = se3_exp(rng.randn(6) * 0.2)
            gt_poses.append(gt_poses[-1] @ T)
            inv = np.linalg.inv(gt_poses[-1])
            frags.append((base @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32))

        # fragment k = base seen from pose k: register via exact Kabsch
        import jax.numpy as jnp
        from gmf_tpu.geometry.kabsch import kabsch_quat

        def reg(fi, fj):
            T = np.asarray(kabsch_quat(jnp.asarray(fj[None]),
                                       jnp.asarray(fi[None])))[0]
            return T, 1.0

        graph = multiway_register(frags, reg)
        for est, gt in zip(graph.nodes, gt_poses):
            np.testing.assert_allclose(est, gt, atol=1e-3)


class TestTrajectoryIO:
    def test_roundtrip(self, tmp_path, rng):
        traj = [((0, 1, 2), np.eye(4)), ((1, 2, 3), se3_exp(rng.randn(6)))]
        p = str(tmp_path / "traj.log")
        write_trajectory(p, traj)
        back = read_trajectory(p)
        assert back[0][0] == (0, 1, 2)
        np.testing.assert_allclose(back[1][1], traj[1][1], atol=1e-7)

    def test_ate(self, rng):
        poses = [se3_exp(rng.randn(6) * 0.1) for _ in range(5)]
        assert ate_rmse(poses, poses) < 1e-6
