"""Ops-level parity against the actual reference code (losses, SE3,
Kabsch, metrics, correspondence hashing).

Complements tests/test_reference_parity.py (module-level parity): here
every comparable pure function in the reference trees is imported and
compared numerically against the gmf_tpu equivalent on shared random
inputs.

Reference targets:
- GMF_PointDSC/utils/SE3.py (transform/integrate/decompose/concatenate)
- GMF_PointDSC/models/common.py (knn, rigid_transform_3d weighted Kabsch)
- GMF_PointDSC/libs/loss.py (Transformation/Classification/SM losses)
- GMF_DGR_fcgf/core/loss.py (Un/BalancedLoss, HighDimSmoothL1Loss)
- GMF_DGR_fcgf/core/metrics.py (batch rot/trans errors, corr_dist, pdist)
- GMF_DGR_fcgf/core/registration.py (weighted_procrustes, ortho2rotation)
- GMF_DGR_fcgf/core/correspondence.py (find_correct_correspondence)
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

REF_PD = "/root/reference/GMF_PointDSC"
REF_DGR = ("/root/reference/GMF_DeepGlobalRegistration/"
           "GMF_DeepGlobalRegistration_fcgf")


def _load(name, path, stub_o3d=False):
    if stub_o3d and "open3d" not in sys.modules:
        sys.modules["open3d"] = types.ModuleType("open3d")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_PD)
    sys.path.insert(0, REF_DGR)
    try:
        import utils.SE3 as se3
        import models.common as common
        import libs.loss as pd_loss
        ns = types.SimpleNamespace(
            se3=se3, common=common, pd_loss=pd_loss,
            dgr_loss=_load("ref_core_loss", f"{REF_DGR}/core/loss.py"),
            dgr_metrics=_load("ref_core_metrics",
                              f"{REF_DGR}/core/metrics.py"),
            dgr_reg=_load("ref_core_registration",
                          f"{REF_DGR}/core/registration.py"),
            dgr_corr=_load("ref_core_correspondence",
                           f"{REF_DGR}/core/correspondence.py",
                           stub_o3d=True),
        )
        yield ns
    finally:
        sys.path.remove(REF_PD)
        sys.path.remove(REF_DGR)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _rand_T(rng, b=None):
    def one():
        ang = rng.rand(3) * 2 - 1
        cx, cy, cz = np.cos(ang)
        sx, sy, sz = np.sin(ang)
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = (Rz @ Ry @ Rx).astype(np.float32)
        T[:3, 3] = rng.randn(3).astype(np.float32)
        return T
    if b is None:
        return one()
    return np.stack([one() for _ in range(b)])


class TestSE3:
    def test_transform_batched_and_flat(self, ref, rng):
        from gmf_tpu.geometry.se3 import transform

        pts = rng.randn(2, 50, 3).astype(np.float32)
        T = _rand_T(rng, 2)
        ref_out = ref.se3.transform(_t(pts), _t(T)).numpy()
        np.testing.assert_allclose(
            np.asarray(transform(jnp.asarray(pts), jnp.asarray(T))),
            ref_out, atol=1e-6)
        ref_flat = ref.se3.transform(_t(pts[0]), _t(T[0])).numpy()
        np.testing.assert_allclose(
            np.asarray(transform(jnp.asarray(pts[0]), jnp.asarray(T[0]))),
            ref_flat, atol=1e-6)

    def test_integrate_decompose_concatenate(self, ref, rng):
        from gmf_tpu.geometry.se3 import (
            concatenate, decompose_trans, integrate_trans,
        )

        T1, T2 = _rand_T(rng, 2)
        R, t = decompose_trans(jnp.asarray(T1[None]))
        rR, rt = ref.se3.decompose_trans(_t(T1[None]))
        np.testing.assert_allclose(np.asarray(R), rR.numpy(), atol=1e-7)
        np.testing.assert_allclose(np.asarray(t), rt.numpy(), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(integrate_trans(R, t)),
            ref.se3.integrate_trans(rR, rt).numpy(), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(concatenate(jnp.asarray(T1[None]),
                                   jnp.asarray(T2[None]))),
            ref.se3.concatenate(_t(T1[None]), _t(T2[None])).numpy(),
            atol=1e-6)


class TestCommonOps:
    def test_knn_matches(self, ref, rng):
        from gmf_tpu.geometry.knn import knn

        x = rng.randn(2, 64, 16).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        for ignore_self in (False, True):
            ref_idx = ref.common.knn(_t(x), k=8, ignore_self=ignore_self,
                                     normalized=True).numpy()
            mine = np.asarray(knn(jnp.asarray(x), k=8,
                                  ignore_self=ignore_self, normalized=True))
            # neighbor SETS must match (tie order within equal distances
            # may differ between top-k implementations)
            np.testing.assert_array_equal(np.sort(mine, -1),
                                          np.sort(ref_idx, -1),
                                          err_msg=f"ignore_self={ignore_self}")

    def test_rigid_transform_3d_weighted(self, ref, rng):
        from gmf_tpu.geometry.kabsch import rigid_transform_3d

        A = rng.randn(4, 40, 3).astype(np.float32)
        T = _rand_T(rng, 4)
        B = np.einsum("bij,bnj->bni", T[:, :3, :3], A) + T[:, None, :3, 3]
        B += 0.01 * rng.randn(4, 40, 3).astype(np.float32)
        w = rng.rand(4, 40).astype(np.float32)
        ref_T = ref.common.rigid_transform_3d(_t(A), _t(B), _t(w.copy())
                                              ).numpy()
        mine = np.asarray(rigid_transform_3d(
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(w)))
        np.testing.assert_allclose(mine, ref_T, atol=2e-4)


class TestPointDSCLosses:
    def test_transformation_loss(self, ref, rng):
        from gmf_tpu.train.losses import transformation_loss

        bs, N = 1, 80  # bs=1: the reference's RMSE broadcast is benign
        src = rng.rand(bs, N, 3).astype(np.float32)
        T_gt = _rand_T(rng, bs)
        tgt = np.einsum("bij,bnj->bni", T_gt[:, :3, :3], src) \
            + T_gt[:, None, :3, 3]
        T_pred = T_gt.copy()
        T_pred[:, :3, 3] += 0.02
        probs = rng.rand(bs, N).astype(np.float32)
        crit = ref.pd_loss.TransformationLoss(re_thre=15, te_thre=30)
        r_loss, r_recall, r_re, r_te, r_rmse = crit(
            _t(T_pred), _t(T_gt), _t(src), _t(tgt), _t(probs))
        out = transformation_loss(
            jnp.asarray(T_pred), jnp.asarray(T_gt), jnp.asarray(src),
            jnp.asarray(tgt), jnp.asarray(probs))
        np.testing.assert_allclose(float(out["loss"]), float(r_loss),
                                   rtol=1e-4, atol=1e-7)
        assert float(out["recall_pct"]) == float(r_recall)
        np.testing.assert_allclose(float(out["re_deg"]), float(r_re),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(float(out["te_cm"]), float(r_te),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(out["rmse"]), float(r_rmse),
                                   rtol=1e-4)

    def test_classification_loss(self, ref, rng):
        from gmf_tpu.train.losses import classification_loss

        pred = rng.randn(1, 100).astype(np.float32) * 2
        gt = (rng.rand(1, 100) < 0.3).astype(np.float32)
        for balanced in (True, False):
            crit = ref.pd_loss.ClassificationLoss(balanced=balanced)
            r = crit(_t(pred), _t(gt))
            out = classification_loss(jnp.asarray(pred), jnp.asarray(gt),
                                      balanced=balanced)
            np.testing.assert_allclose(float(out["loss"]),
                                       float(r["loss"]), rtol=1e-5)
            for k in ("precision", "recall", "f1"):
                np.testing.assert_allclose(float(out[k]), r[k], atol=1e-6)
            for k in ("logit_true", "logit_false"):
                np.testing.assert_allclose(float(out[k]), r[k], rtol=1e-4)

    def test_spectral_matching_loss(self, ref, rng):
        from gmf_tpu.train.losses import spectral_matching_loss

        N = 60
        gt = (rng.rand(2, N) < 0.4).astype(np.float32)
        M = np.abs(rng.randn(2, N, N)).astype(np.float32)
        M = np.clip((M + M.transpose(0, 2, 1)) / 4, 0, 1)
        M[:, np.arange(N), np.arange(N)] = 0  # the model zeroes the diag
        for balanced in (True, False):
            crit = ref.pd_loss.SpectralMatchingLoss(balanced=balanced)
            r = float(crit(_t(M), _t(gt)))
            mine = float(spectral_matching_loss(
                jnp.asarray(M), jnp.asarray(gt), balanced=balanced))
            np.testing.assert_allclose(mine, r, rtol=1e-5,
                                       err_msg=f"balanced={balanced}")


class TestDGROps:
    def test_bce_losses(self, ref, rng):
        from gmf_tpu.train.losses import (
            balanced_bce_loss, unbalanced_bce_loss,
        )

        logits = rng.randn(200).astype(np.float32)
        labels = (rng.rand(200) < 0.25).astype(np.float32)
        np.testing.assert_allclose(
            float(unbalanced_bce_loss(jnp.asarray(logits),
                                      jnp.asarray(labels))),
            float(ref.dgr_loss.UnbalancedLoss()(_t(logits), _t(labels))),
            rtol=1e-5)
        np.testing.assert_allclose(
            float(balanced_bce_loss(jnp.asarray(logits),
                                    jnp.asarray(labels))),
            float(ref.dgr_loss.BalancedLoss()(_t(logits), _t(labels))),
            rtol=1e-5)

    def test_high_dim_smooth_l1(self, ref, rng):
        from gmf_tpu.train.losses import high_dim_smooth_l1_loss

        X = rng.randn(150, 3).astype(np.float32) * 2
        Y = X + rng.randn(150, 3).astype(np.float32) * 0.7
        w = rng.rand(150, 1).astype(np.float32)
        crit = ref.dgr_loss.HighDimSmoothL1Loss(_t(w), quantization_size=1)
        r = float(crit(_t(X), _t(Y)))
        mine = float(high_dim_smooth_l1_loss(
            jnp.asarray(X), jnp.asarray(Y), weights=jnp.asarray(w[:, 0])))
        np.testing.assert_allclose(mine, r, rtol=1e-5)
        crit0 = ref.dgr_loss.HighDimSmoothL1Loss(None, quantization_size=0.3)
        np.testing.assert_allclose(
            float(high_dim_smooth_l1_loss(jnp.asarray(X), jnp.asarray(Y),
                                          quantization_size=0.3)),
            float(crit0(_t(X), _t(Y))), rtol=1e-5)

    def test_batch_errors_and_corr_dist(self, ref, rng):
        from gmf_tpu.geometry.metrics import corr_dist, rotation_error_deg

        T1, T2 = _rand_T(rng, 2)
        re_ref = float(ref.dgr_metrics.batch_rotation_error(
            _t(T1[:3, :3][None]), _t(T2[:3, :3][None]))[0])
        re_mine = float(rotation_error_deg(
            jnp.asarray(T1[:3, :3]), jnp.asarray(T2[:3, :3])))
        np.testing.assert_allclose(re_mine, np.degrees(re_ref), rtol=1e-3)

        xyz0 = rng.rand(100, 3).astype(np.float32)
        cd_ref = float(ref.dgr_metrics.corr_dist(
            _t(T1), _t(T2), _t(xyz0), None, max_dist=1))
        cd_mine = float(corr_dist(
            jnp.asarray(T1), jnp.asarray(xyz0),
            jnp.asarray(xyz0 @ T2[:3, :3].T + T2[:3, 3]), max_dist=1.0))
        np.testing.assert_allclose(cd_mine, cd_ref, rtol=1e-5)

    def test_weighted_procrustes(self, ref, rng):
        from gmf_tpu.geometry.kabsch import rigid_transform_3d

        X = rng.randn(120, 3).astype(np.float32)
        T = _rand_T(rng)
        Y = X @ T[:3, :3].T + T[:3, 3] \
            + 0.01 * rng.randn(120, 3).astype(np.float32)
        w = rng.rand(120).astype(np.float32)
        # the reference consumes w as a column (core/trainer.py passes
        # weights[:, None] shaped tensors)
        R_ref, t_ref = ref.dgr_reg.weighted_procrustes(
            _t(X), _t(Y), _t(w[:, None]), eps=np.finfo(np.float32).eps)
        mine = np.asarray(rigid_transform_3d(
            jnp.asarray(X)[None], jnp.asarray(Y)[None],
            jnp.asarray(w)[None])[0])
        np.testing.assert_allclose(mine[:3, :3], R_ref.numpy(), atol=2e-4)
        np.testing.assert_allclose(mine[:3, 3], t_ref.numpy(), atol=2e-4)

    def test_global_registration_refiner(self, ref, rng):
        """se3_refine vs the reference's ACTUAL GlobalRegistration
        (core/registration.py:135-194): same weighted problem, same
        Procrustes init, both Adam(0.1)+ExpLR(0.999) refiners must land
        on the same transform. (Caught in r2: the reference's
        break_counter is cumulative, never reset — ours used to reset.)
        """
        from gmf_tpu.geometry.kabsch import rigid_transform_3d
        from gmf_tpu.models.dgr import se3_refine

        N = 300
        X = (rng.rand(N, 3) * 2).astype(np.float32)
        T = _rand_T(rng)
        Y = (X @ T[:3, :3].T + T[:3, 3]
             + 0.02 * rng.randn(N, 3)).astype(np.float32)
        w = (0.5 + 0.5 * rng.rand(N)).astype(np.float32)

        R_ref, t_ref, opt = ref.dgr_reg.GlobalRegistration(
            _t(X), _t(Y), weights=_t(w[:, None]))
        R_ref = R_ref.detach().numpy()
        t_ref = t_ref.detach().numpy().reshape(3)

        T0 = rigid_transform_3d(jnp.asarray(X)[None], jnp.asarray(Y)[None],
                                jnp.asarray(w)[None])[0]
        T_mine, loss, iters = se3_refine(
            jnp.asarray(X), jnp.asarray(Y), jnp.asarray(w), T0)
        T_mine = np.asarray(T_mine)

        np.testing.assert_allclose(T_mine[:3, :3], R_ref, atol=2e-3)
        np.testing.assert_allclose(T_mine[:3, 3], t_ref, atol=2e-3)
        # both found the planted transform
        np.testing.assert_allclose(T_mine[:3, :3], T[:3, :3], atol=0.02)
        np.testing.assert_allclose(T_mine[:3, 3], T[:3, 3], atol=0.02)
        # comparable convergence (same stopping rules; fp noise may shift
        # the exact iteration the cumulative break counter fills up)
        assert abs(int(iters) - int(opt["iterations"])) <= 150, (
            int(iters), opt)

    def test_ortho2rotation(self, ref, rng):
        from gmf_tpu.models.dgr import ortho6d_to_rotation

        poses = rng.randn(8, 6).astype(np.float32)
        R_ref = ref.dgr_reg.ortho2rotation(_t(poses)).numpy()
        R_mine = np.asarray(ortho6d_to_rotation(jnp.asarray(poses)))
        np.testing.assert_allclose(R_mine, R_ref, atol=1e-5)

    def test_find_correct_correspondence(self, ref, rng):
        from gmf_tpu.data.dgr_loader import find_correct_correspondence

        N0, N1 = 70, 90
        pos = np.stack([rng.randint(0, N0, 40),
                        rng.randint(0, N1, 40)], axis=1)
        pred = np.stack([rng.randint(0, N0, 55),
                         rng.randint(0, N1, 55)], axis=1)
        seed = max(N0, N1)
        ref_out = ref.dgr_corr.find_correct_correspondence(
            [pos], [pred], hash_seed=seed)
        mine = find_correct_correspondence(pos, pred, hash_seed=seed)
        np.testing.assert_array_equal(mine, ref_out)
