"""PointDSC+GMF model tests: shapes, geometry-driven registration, masking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gmf_tpu.models import PointDSC


def small_model(**kw):
    defaults = dict(num_layers=2, num_channels=32, ratio=0.1,
                    inlier_threshold=0.10, sigma_d=0.10, k=20, nms_radius=0.10)
    defaults.update(kw)
    return PointDSC(**defaults)


def make_pair(rng, B=2, N=100, inlier_ratio=0.7, noise=0.005):
    """Synthetic correspondence problem with known ground truth."""
    ang = 0.8
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32)
    t = np.array([0.4, -0.2, 0.3], np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3], T_gt[:3, 3] = R, t

    src = rng.rand(B, N, 3).astype(np.float32) * 2
    tgt = src @ R.T + t + noise * rng.randn(B, N, 3).astype(np.float32)
    n_out = int(N * (1 - inlier_ratio))
    labels = np.ones((B, N), np.float32)
    for b in range(B):
        out_idx = rng.choice(N, n_out, replace=False)
        tgt[b, out_idx] = rng.rand(n_out, 3) * 2
        labels[b, out_idx] = 0
    corr_pos = np.concatenate([src - src.mean(1, keepdims=True),
                               tgt - tgt.mean(1, keepdims=True)], -1)
    imgs = rng.rand(B, 24, 32, 3).astype(np.float32)
    return (jnp.asarray(corr_pos), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(imgs), jnp.asarray(imgs), T_gt, labels)


@pytest.fixture(scope="module")
def model_and_params():
    model = small_model()
    rng = np.random.RandomState(3)
    corr, src, tgt, p_img, q_img, T_gt, labels = make_pair(rng)
    variables = model.init(jax.random.PRNGKey(0), corr, src, tgt, p_img, q_img)
    return model, variables


class TestForward:
    def test_train_branch_shapes(self, model_and_params, rng):
        model, variables = model_and_params
        corr, src, tgt, p_img, q_img, T_gt, labels = make_pair(rng)
        out = model.apply(variables, corr, src, tgt, p_img, q_img,
                          testing=False)
        B, N = 2, 100
        assert out["final_trans"].shape == (B, 4, 4)
        assert out["final_labels"].shape == (B, N)
        assert out["M"].shape == (B, N, N)
        assert out["seed_trans"].shape == (B, 10, 4, 4)
        assert out["confidence"].shape == (B, N)
        # M diagonal zeroed (ref PointDSC.py:234)
        diag = np.asarray(out["M"])[:, np.arange(N), np.arange(N)]
        np.testing.assert_allclose(diag, 0.0, atol=1e-6)
        # M in [0, 1]
        M = np.asarray(out["M"])
        assert M.min() >= 0 and M.max() <= 1 + 1e-6

    def test_testing_branch_registers(self, model_and_params, rng):
        """Untrained net: seed/spectral/Kabsch machinery is geometry-driven,
        so a 70%-inlier problem must still register correctly."""
        model, variables = model_and_params
        corr, src, tgt, p_img, q_img, T_gt, labels = make_pair(rng)
        out = model.apply(variables, corr, src, tgt, p_img, q_img,
                          testing=True)
        assert out["M"] is None
        T = np.asarray(out["final_trans"])
        for b in range(2):
            np.testing.assert_allclose(T[b, :3, :3], T_gt[:3, :3], atol=0.01)
            np.testing.assert_allclose(T[b, :3, 3], T_gt[:3, 3], atol=0.02)
        # predicted inliers should agree well with GT labels
        pred = np.asarray(out["final_labels"])
        agreement = (pred == labels).mean()
        assert agreement > 0.95, agreement

    def test_masked_padding_equivalence(self, model_and_params, rng):
        """Zero-padded + masked batch must reproduce the unpadded result."""
        model, variables = model_and_params
        corr, src, tgt, p_img, q_img, T_gt, labels = make_pair(rng, B=1)
        out_ref = model.apply(variables, corr, src, tgt, p_img, q_img,
                              testing=True)
        pad = 28
        corr_p = jnp.pad(corr, ((0, 0), (0, pad), (0, 0)))
        src_p = jnp.pad(src, ((0, 0), (0, pad), (0, 0)))
        tgt_p = jnp.pad(tgt, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(jnp.ones((1, 100)), ((0, 0), (0, pad)))
        out_pad = model.apply(variables, corr_p, src_p, tgt_p, p_img, q_img,
                              testing=True, corr_mask=mask)
        np.testing.assert_allclose(
            np.asarray(out_pad["final_trans"]),
            np.asarray(out_ref["final_trans"]), atol=5e-3)

    def test_gradients_finite(self, model_and_params, rng):
        model, variables = model_and_params
        corr, src, tgt, p_img, q_img, T_gt, labels = make_pair(rng)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                corr, src, tgt, p_img, q_img, testing=False, train=True,
                mutable=["batch_stats"])
            # touch all three loss surfaces: trans, confidence, M
            return (jnp.sum(out["final_trans"] ** 2) * 1e-3
                    + jnp.mean(out["final_labels"] ** 2)
                    + jnp.mean(out["M"] ** 2))

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree.leaves(jax.tree.map(lambda x: jnp.all(jnp.isfinite(x)), g))
        assert all(bool(l) for l in leaves)
        # sigma param must receive gradient through M
        assert np.abs(np.asarray(g["sigma"])).max() > 0

    def test_jit_compiles_once_per_shape(self, model_and_params, rng):
        model, variables = model_and_params
        corr, src, tgt, p_img, q_img, *_ = make_pair(rng)

        @jax.jit
        def fwd(v, corr, src, tgt, p, q):
            return model.apply(v, corr, src, tgt, p, q, testing=True)

        out1 = fwd(variables, corr, src, tgt, p_img, q_img)
        out2 = fwd(variables, corr, src, tgt, p_img, q_img)
        assert np.asarray(out1["final_trans"]).shape == (2, 4, 4)
