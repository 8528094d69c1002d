"""benchmark_utils + logging tests."""

import json
import os

import numpy as np

from gmf_tpu.eval.benchmark_utils import (
    exact_auc, set_seed, rot_to_euler, is_rotation_matrix,
    compute_transformation_error, evaluate_registration_rmse,
)
from gmf_tpu.utils.logging_utils import MetricsLogger


class TestBenchmarkUtils:
    def test_exact_auc_perfect(self):
        errors = np.zeros(10)
        aucs = exact_auc(errors, [0.1, 0.5])
        np.testing.assert_allclose(aucs, [1.0, 1.0], atol=1e-6)

    def test_exact_auc_partial(self):
        errors = np.array([0.05] * 5 + [10.0] * 5)
        (auc,) = exact_auc(errors, [0.1])
        assert 0.2 < auc < 0.5  # half the pairs recallable, late ramp

    def test_set_seed_reproducible(self):
        set_seed(51)
        a = np.random.rand(5)
        set_seed(51)
        b = np.random.rand(5)
        np.testing.assert_array_equal(a, b)

    def test_rot_to_euler_roundtrip(self):
        ang = np.radians([10.0, 20.0, 30.0])
        cx, sx = np.cos(ang[0]), np.sin(ang[0])
        cy, sy = np.cos(ang[1]), np.sin(ang[1])
        cz, sz = np.cos(ang[2]), np.sin(ang[2])
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        R = Rz @ Ry @ Rx
        assert is_rotation_matrix(R)
        np.testing.assert_allclose(rot_to_euler(R), [10, 20, 30], atol=1e-6)

    def test_transformation_error_zero_for_exact(self, rng):
        T = np.eye(4)
        T[:3, 3] = [0.1, 0.2, 0.3]
        err = compute_transformation_error(T, T, np.eye(6))
        assert err < 1e-10

    def test_lomatch_recall_protocol(self):
        T = np.eye(4)
        gt = {(0, 2): T, (0, 1): T, (1, 3): T}   # (0,1) consecutive: skipped
        est_good = {(0, 2): T, (1, 3): T}
        assert evaluate_registration_rmse(est_good, gt, {}) == 1.0
        T_bad = np.eye(4)
        T_bad[:3, 3] = [1, 1, 1]
        est_bad = {(0, 2): T_bad, (1, 3): T_bad}
        assert evaluate_registration_rmse(est_bad, gt, {}) == 0.0


class TestMetricsLogger:
    def test_jsonl_and_tensorboard(self, tmp_path):
        logger = MetricsLogger(str(tmp_path / "logs"))
        logger.log({"loss": 1.5, "recall": 0.8}, step=1, prefix="Train")
        logger.log({"loss": 1.2}, step=2, prefix="Train")
        logger.close()
        lines = open(tmp_path / "logs" / "metrics.jsonl").read().splitlines()
        assert len(lines) == 2
        row = json.loads(lines[0])
        assert row["loss"] == 1.5 and row["prefix"] == "Train"
        # tensorboard event file written (tensorboardX available here)
        assert any(f.startswith("events") for f in
                   os.listdir(tmp_path / "logs"))


class TestGtInfoIO:
    def test_read_gt_info_and_pairs(self, tmp_path):
        from gmf_tpu.eval.benchmark_utils import read_gt_info, read_gt_pairs

        info_path = tmp_path / "gt.info"
        with open(info_path, "w") as f:
            f.write("0 2 10\n")
            for r in range(6):
                row = ["1.0" if c == r else "0.0" for c in range(6)]
                f.write(" ".join(row) + "\n")
        info = read_gt_info(str(info_path))
        assert (0, 2) in info
        np.testing.assert_allclose(info[(0, 2)], np.eye(6))

        log_path = tmp_path / "gt.log"
        with open(log_path, "w") as f:
            f.write("1 3 10\n")
            for r in range(4):
                row = ["1.0" if c == r else "0.0" for c in range(4)]
                f.write(" ".join(row) + "\n")
        pairs = read_gt_pairs(str(log_path))
        np.testing.assert_allclose(pairs[(1, 3)], np.eye(4))
