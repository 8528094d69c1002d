"""Parity of the fused seed-solver kernel vs the XLA spectral+Kabsch path.

The kernel (ops/fused_seed_solver.py) fuses feat_M / spatial_M /
power-iteration / Horn-Kabsch into one Pallas program. It must reproduce
the XLA composition (models/pointdsc.py::_seed_trans_from_knn math) to
float tolerance: identical algorithm, f32 accumulation throughout, the
only differences are op ordering and the 4x4 eigensolver's squaring
count (effective power >= the XLA path's, so agreement is limited by
eigenvector conditioning, not by the kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmf_tpu.geometry.kabsch import rigid_transform_3d
from gmf_tpu.geometry.spectral import leading_eigenvector_fixed
from gmf_tpu.ops.fused_seed_solver import fused_seed_transforms


def _xla_reference(knn_features, src_knn, tgt_knn, sigma, sigma_d,
                   num_iters=10):
    """The dense-path math of _seed_trans_from_knn, f32, unbatched."""
    S, k, C = knn_features.shape
    feat_M = jnp.einsum("skc,sjc->skj", knn_features, knn_features,
                        precision=jax.lax.Precision.HIGHEST)
    feat_M = jnp.clip(1.0 - (1.0 - feat_M) / sigma ** 2, 0.0, None)
    src_d = jnp.linalg.norm(
        src_knn[:, :, None, :] - src_knn[:, None, :, :], axis=-1)
    tgt_d = jnp.linalg.norm(
        tgt_knn[:, :, None, :] - tgt_knn[:, None, :, :], axis=-1)
    spatial_M = jnp.clip(1.0 - (src_d - tgt_d) ** 2 / sigma_d ** 2,
                         0.0, None)
    total_M = feat_M * spatial_M * (1.0 - jnp.eye(k))
    w = leading_eigenvector_fixed(total_M, num_iters=num_iters)
    w = w / (jnp.sum(w, -1, keepdims=True) + 1e-6)
    return rigid_transform_3d(src_knn, tgt_knn, w, method="quat")


def _problem(rng, S, k, C, scale=3.0):
    feats = rng.randn(S, k, C).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    src = (rng.rand(S, k, 3) * scale).astype(np.float32)
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    tgt = src @ R.T + np.array([0.2, -0.1, 0.4], np.float32)
    tgt += 0.02 * rng.randn(S, k, 3).astype(np.float32)
    # a third of the points are gross outliers, like real seed kNN sets
    out = rng.rand(S, k) < 0.33
    tgt = np.where(out[..., None], rng.rand(S, k, 3) * scale, tgt)
    return (jnp.asarray(feats), jnp.asarray(src),
            jnp.asarray(tgt.astype(np.float32)))


@pytest.mark.parametrize("S,k,ts", [(8, 10, 4), (24, 40, 8), (13, 16, 8)])
def test_transforms_match_xla(S, k, ts):
    rng = np.random.RandomState(0)
    feats, src, tgt = _problem(rng, S, k, 64)
    sigma = 1.2

    T_fused = fused_seed_transforms(feats, src, tgt, sigma, 0.10, ts=ts,
                                    interpret=True)
    T_ref = _xla_reference(feats, src, tgt, sigma, 0.10)

    Tf, Tr = np.asarray(T_fused), np.asarray(T_ref)
    assert Tf.shape == (S, 4, 4)
    np.testing.assert_allclose(Tf[:, 3], Tr[:, 3], atol=0)
    # rotation / translation agreement (eigenvector conditioning bounds)
    np.testing.assert_allclose(Tf[:, :3, :3], Tr[:, :3, :3], atol=5e-4)
    np.testing.assert_allclose(Tf[:, :3, 3], Tr[:, :3, 3], atol=5e-3)
    # rotations are proper
    det = np.linalg.det(Tf[:, :3, :3])
    np.testing.assert_allclose(det, 1.0, atol=1e-4)


def test_recovers_clean_transform():
    """All-inlier neighborhoods: the hypothesis equals the generating
    rigid motion to float precision."""
    rng = np.random.RandomState(1)
    S, k = 8, 24
    feats = rng.randn(S, k, 32).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    src = (rng.rand(S, k, 3) * 2).astype(np.float32)
    ang = 0.7
    R = np.array([[1, 0, 0],
                  [0, np.cos(ang), -np.sin(ang)],
                  [0, np.sin(ang), np.cos(ang)]], np.float32)
    t = np.array([0.5, -0.3, 0.2], np.float32)
    tgt = src @ R.T + t

    T = np.asarray(fused_seed_transforms(
        jnp.asarray(feats), jnp.asarray(src), jnp.asarray(tgt),
        1.0, 0.10, ts=4, interpret=True))
    np.testing.assert_allclose(T[:, :3, :3], np.broadcast_to(R, (S, 3, 3)),
                               atol=2e-4)
    np.testing.assert_allclose(T[:, :3, 3], np.broadcast_to(t, (S, 3)),
                               atol=2e-4)


def test_model_fused_seed_solver_matches_xla(rng):
    """PointDSC(seed_solver='fused') must reproduce the XLA model's
    selection, transforms and fitness (CPU interpret mode, f32)."""
    from gmf_tpu.models import PointDSC

    kw = dict(num_layers=2, num_channels=32, ratio=0.1, k=10, sigma_d=0.10)
    mx = PointDSC(seed_solver="xla", **kw)
    mf = PointDSC(seed_solver="fused", **kw)

    N = 128
    src = rng.rand(1, N, 3).astype(np.float32) * 2
    ang = 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    tgt = src @ R.T + np.array([0.2, 0.1, 0.0], np.float32)
    out_idx = rng.choice(N, N // 3, replace=False)
    tgt[0, out_idx] = rng.rand(N // 3, 3) * 2
    corr = np.concatenate([src - src.mean(1, keepdims=True),
                           tgt - tgt.mean(1, keepdims=True)], -1)
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    args = (jnp.asarray(corr), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(img), jnp.asarray(img))

    variables = mx.init(jax.random.PRNGKey(0), *args)
    out_x = mx.apply(variables, *args, testing=True)
    out_f = mf.apply(variables, *args, testing=True)
    np.testing.assert_allclose(np.asarray(out_f["final_trans"]),
                               np.asarray(out_x["final_trans"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f["seed_fitness"]),
                               np.asarray(out_x["seed_fitness"]), atol=1e-6)

    # padded-batch path: masked tail must not change the result
    pad = 32
    maskp = jnp.asarray(
        np.concatenate([np.ones((1, N)), np.zeros((1, pad))], 1)
        .astype(np.float32))
    argsp = tuple(
        jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
        if a.ndim == 3 and a.shape[1] == N else a for a in args)
    out_p = mf.apply(variables, *argsp, testing=True, corr_mask=maskp)
    np.testing.assert_allclose(np.asarray(out_p["final_trans"]),
                               np.asarray(out_f["final_trans"]), atol=1e-4)


def test_seed_padding_is_dropped():
    """S not divisible by ts: padded seeds must not affect real ones."""
    rng = np.random.RandomState(2)
    feats, src, tgt = _problem(rng, 10, 12, 16)
    T_a = np.asarray(fused_seed_transforms(feats, src, tgt, 1.0, 0.10,
                                           ts=4, interpret=True))
    T_b = np.asarray(fused_seed_transforms(feats, src, tgt, 1.0, 0.10,
                                           ts=2, interpret=True))
    np.testing.assert_allclose(T_a, T_b, atol=1e-5)
