"""Loss function tests vs NumPy oracles and reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from gmf_tpu.train import (
    transformation_loss,
    classification_loss,
    spectral_matching_loss,
    balanced_bce_loss,
    unbalanced_bce_loss,
    high_dim_smooth_l1_loss,
)


def np_bce(logits, labels, pos_weight=1.0):
    p = 1 / (1 + np.exp(-logits))
    return -(pos_weight * labels * np.log(p + 1e-12)
             + (1 - labels) * np.log(1 - p + 1e-12))


class TestClassificationLoss:
    def test_balanced_matches_oracle(self, rng):
        logits = rng.randn(2, 50).astype(np.float32)
        labels = (rng.rand(2, 50) > 0.7).astype(np.float32)
        out = classification_loss(jnp.asarray(logits), jnp.asarray(labels))
        npos = max(labels.sum() - 1, 0) + 1
        nneg = max((1 - labels).sum() - 1, 0) + 1
        expect = np_bce(logits, labels, pos_weight=nneg / npos).mean()
        np.testing.assert_allclose(float(out["loss"]), expect, rtol=1e-4)

    def test_unbalanced(self, rng):
        logits = rng.randn(1, 30).astype(np.float32)
        labels = (rng.rand(1, 30) > 0.5).astype(np.float32)
        out = classification_loss(jnp.asarray(logits), jnp.asarray(labels),
                                  balanced=False)
        expect = np_bce(logits, labels).mean()
        np.testing.assert_allclose(float(out["loss"]), expect, rtol=1e-4)

    def test_prf1_match_sklearn_convention(self, rng):
        logits = np.array([[2.0, -1.0, 3.0, -2.0]], np.float32)
        labels = np.array([[1, 1, 0, 0]], np.float32)
        out = classification_loss(jnp.asarray(logits), jnp.asarray(labels))
        # pred = [1,0,1,0]: TP=1, FP=1, FN=1 -> P=0.5, R=0.5
        np.testing.assert_allclose(float(out["precision"]), 0.5, atol=1e-5)
        np.testing.assert_allclose(float(out["recall"]), 0.5, atol=1e-5)


class TestSpectralMatchingLoss:
    def test_balanced_oracle(self, rng):
        N = 20
        M = rng.rand(2, N, N).astype(np.float32)
        labels = (rng.rand(2, N) > 0.5).astype(np.float32)
        got = float(spectral_matching_loss(jnp.asarray(M), jnp.asarray(labels)))
        # NumPy oracle replicating libs/loss.py:120-139 EXACTLY: the
        # reference's negative term does NOT exclude the diagonal (the
        # model zeroes M's diag, so only the denominator feels it; see
        # also tests/test_reference_parity_ops.py vs the actual code)
        gt_M = ((labels[:, None, :] + labels[:, :, None]) == 2).astype(np.float32)
        for i in range(2):
            np.fill_diagonal(gt_M[i], 0)
        pos = ((M - 1) ** 2 * gt_M).sum((-2, -1)) / (
            np.maximum(gt_M.sum((-2, -1)) - 1, 0) + 1)
        neg_M = 1 - gt_M
        neg = (M ** 2 * neg_M).sum((-2, -1)) / (
            np.maximum(neg_M.sum((-2, -1)) - 1, 0) + 1)
        expect = (0.5 * pos + 0.5 * neg).mean()
        np.testing.assert_allclose(got, expect, rtol=1e-3)

    def test_perfect_M_zero_loss(self):
        labels = jnp.asarray([[1.0, 1.0, 0.0]])
        M = jnp.asarray([[[0, 1, 0], [1, 0, 0], [0, 0, 0]]], jnp.float32)
        loss = float(spectral_matching_loss(M, labels))
        assert loss < 1e-6


class TestTransformationLoss:
    def test_perfect_registration(self, rng):
        src = jnp.asarray(rng.rand(2, 40, 3), jnp.float32)
        T = jnp.eye(4)[None].repeat(2, 0)
        out = transformation_loss(T, T, src, src, jnp.ones((2, 40)))
        assert float(out["loss"]) < 1e-9
        assert float(out["recall_pct"]) == 100.0
        assert float(out["te_cm"]) < 1e-4

    def test_failure_case(self, rng):
        src = jnp.asarray(rng.rand(1, 40, 3), jnp.float32)
        T_bad = jnp.eye(4).at[0, 3].set(1.0)[None]  # 1 m off
        out = transformation_loss(T_bad, jnp.eye(4)[None], src, src,
                                  jnp.ones((1, 40)))
        assert float(out["recall_pct"]) == 0.0
        np.testing.assert_allclose(float(out["te_cm"]), 100.0, atol=1e-3)

    def test_no_inlier_zeroes_loss(self, rng):
        src = jnp.asarray(rng.rand(1, 40, 3), jnp.float32)
        T_bad = jnp.eye(4).at[0, 3].set(1.0)[None]
        out = transformation_loss(T_bad, jnp.eye(4)[None], src, src,
                                  jnp.zeros((1, 40)))
        assert float(out["loss"]) == 0.0


class TestDGRLosses:
    def test_balanced_bce(self, rng):
        logits = rng.randn(100).astype(np.float32)
        labels = (rng.rand(100) > 0.8).astype(np.float32)
        got = float(balanced_bce_loss(jnp.asarray(logits), jnp.asarray(labels)))
        per = np_bce(logits, labels)
        expect = 0.5 * per[labels == 1].mean() + 0.5 * per[labels == 0].mean()
        np.testing.assert_allclose(got, expect, rtol=1e-4)

    def test_unbalanced_bce(self, rng):
        logits = rng.randn(50).astype(np.float32)
        labels = (rng.rand(50) > 0.5).astype(np.float32)
        got = float(unbalanced_bce_loss(jnp.asarray(logits), jnp.asarray(labels)))
        np.testing.assert_allclose(got, np_bce(logits, labels).mean(), rtol=1e-4)

    def test_smooth_l1(self, rng):
        pred = rng.randn(30, 3).astype(np.float32)
        tgt = rng.randn(30, 3).astype(np.float32)
        got = float(high_dim_smooth_l1_loss(jnp.asarray(pred), jnp.asarray(tgt)))
        # Oracle replicating core/loss.py:51-61 exactly.
        sq = (((pred - tgt)) ** 2).sum(-1)
        half = 0.5 * (sq < 1.0)
        per = (0.5 - half) * (np.sqrt(sq + 1.1920929e-07) - 0.5) + half * sq
        np.testing.assert_allclose(got, per.mean(), rtol=1e-4)

    def test_smooth_l1_weighted(self, rng):
        pred = rng.randn(30, 3).astype(np.float32)
        tgt = rng.randn(30, 3).astype(np.float32)
        w = rng.rand(30).astype(np.float32)
        got = float(high_dim_smooth_l1_loss(
            jnp.asarray(pred), jnp.asarray(tgt), weights=jnp.asarray(w)))
        sq = ((pred - tgt) ** 2).sum(-1)
        half = 0.5 * (sq < 1.0)
        per = (0.5 - half) * (np.sqrt(sq + 1.1920929e-07) - 0.5) + half * sq
        np.testing.assert_allclose(got, (per * w).sum() / w.sum(), rtol=1e-4)

    def test_grads(self, rng):
        logits = jnp.asarray(rng.randn(20), jnp.float32)
        labels = jnp.asarray((rng.rand(20) > 0.5).astype(np.float32))
        g = jax.grad(lambda x: balanced_bce_loss(x, labels))(logits)
        assert np.all(np.isfinite(np.asarray(g)))
