"""Unit tests for gmf_tpu.geometry against NumPy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gmf_tpu.geometry import (
    transform,
    integrate_trans,
    decompose_trans,
    concatenate,
    rigid_transform_3d,
    kabsch_svd,
    kabsch_quat,
    leading_eigenvector,
    knn,
    pdist,
    pick_seeds_nms,
    rotation_error_deg,
    translation_error,
    registration_success,
)
from gmf_tpu.geometry.knn import nearest_neighbor, mutual_nearest_mask
from gmf_tpu.geometry.metrics import precision_recall_f1
from gmf_tpu.geometry.se3 import random_rotation_matrix, inverse


def random_se3(rng, n=None):
    def one():
        A = rng.randn(3, 3)
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        T = np.eye(4)
        T[:3, :3] = Q
        T[:3, 3] = rng.randn(3)
        return T

    if n is None:
        return one()
    return np.stack([one() for _ in range(n)])


class TestSE3:
    def test_transform_roundtrip(self, rng):
        T = random_se3(rng)
        pts = rng.randn(100, 3).astype(np.float32)
        out = np.asarray(transform(jnp.asarray(pts), jnp.asarray(T, jnp.float32)))
        expected = pts @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)

    def test_transform_batched(self, rng):
        T = random_se3(rng, 4).astype(np.float32)
        pts = rng.randn(4, 50, 3).astype(np.float32)
        out = np.asarray(transform(jnp.asarray(pts), jnp.asarray(T)))
        for b in range(4):
            expected = pts[b] @ T[b, :3, :3].T + T[b, :3, 3]
            np.testing.assert_allclose(out[b], expected, rtol=1e-5, atol=1e-5)

    def test_integrate_decompose(self, rng):
        T = random_se3(rng, 3).astype(np.float32)
        R, t = decompose_trans(jnp.asarray(T))
        T2 = integrate_trans(R, t)
        np.testing.assert_allclose(np.asarray(T2), T, atol=1e-6)

    def test_concatenate_and_inverse(self, rng):
        T1 = random_se3(rng).astype(np.float32)
        T2 = random_se3(rng).astype(np.float32)
        cat = np.asarray(concatenate(jnp.asarray(T1), jnp.asarray(T2)))
        np.testing.assert_allclose(cat, T1 @ T2, rtol=1e-5, atol=1e-5)
        inv = np.asarray(inverse(jnp.asarray(T1)))
        np.testing.assert_allclose(inv @ T1, np.eye(4), atol=1e-5)

    def test_random_rotation_is_rotation(self, rng):
        for num_axis in (0, 1, 3):
            R = random_rotation_matrix(num_axis, 1.0, rng)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
            assert np.linalg.det(R) > 0


def numpy_kabsch(A, B, w):
    """Oracle: weighted Kabsch via numpy SVD."""
    wsum = w.sum()
    cA = (A * w[:, None]).sum(0) / wsum
    cB = (B * w[:, None]).sum(0) / wsum
    H = (A - cA).T @ np.diag(w) @ (B - cB)
    U, S, Vt = np.linalg.svd(H)
    V = Vt.T
    d = np.sign(np.linalg.det(V @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = V @ D @ U.T
    t = cB - R @ cA
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


class TestKabsch:
    @pytest.mark.parametrize("method", ["quat", "svd"])
    def test_exact_recovery(self, rng, method):
        """Noiseless weighted points must recover the exact transform."""
        T_gt = random_se3(rng, 8).astype(np.float32)
        A = rng.randn(8, 64, 3).astype(np.float32)
        B = np.einsum("bij,bkj->bki", T_gt[:, :3, :3], A) + T_gt[:, None, :3, 3]
        w = rng.rand(8, 64).astype(np.float32) + 0.1
        T = np.asarray(
            rigid_transform_3d(jnp.asarray(A), jnp.asarray(B), jnp.asarray(w),
                               method=method)
        )
        # Elementwise comparison: the acos-trace rotation metric has an f32
        # floor of ~0.15 deg, so compare matrices directly.
        np.testing.assert_allclose(T[:, :3, :3], T_gt[:, :3, :3], atol=5e-5)
        te = np.linalg.norm(T[:, :3, 3] - T_gt[:, :3, 3], axis=-1)
        assert te.max() < 1e-3, te

    @pytest.mark.parametrize("method", ["quat", "svd"])
    def test_noisy_matches_numpy_oracle(self, rng, method):
        A = rng.randn(48, 3).astype(np.float32)
        T_gt = random_se3(rng).astype(np.float32)
        B = (A @ T_gt[:3, :3].T + T_gt[:3, 3] + 0.05 * rng.randn(48, 3)).astype(
            np.float32
        )
        w = (rng.rand(48) + 0.05).astype(np.float32)
        T_np = numpy_kabsch(A.astype(np.float64), B.astype(np.float64),
                            w.astype(np.float64))
        T = np.asarray(
            rigid_transform_3d(
                jnp.asarray(A)[None], jnp.asarray(B)[None], jnp.asarray(w)[None],
                method=method,
            )
        )[0]
        np.testing.assert_allclose(T[:3, :3], T_np[:3, :3], atol=1e-4)
        np.testing.assert_allclose(T[:3, 3], T_np[:3, 3], atol=5e-3)

    def test_quat_handles_planar_degenerate(self, rng):
        """Coplanar points (rank-2 covariance) — the reflection trap."""
        A = rng.randn(40, 3).astype(np.float32)
        A[:, 2] = 0.0  # coplanar
        T_gt = random_se3(rng).astype(np.float32)
        B = (A @ T_gt[:3, :3].T + T_gt[:3, 3]).astype(np.float32)
        T = np.asarray(kabsch_quat(jnp.asarray(A)[None], jnp.asarray(B)[None]))[0]
        R = T[:3, :3]
        assert np.linalg.det(R) > 0.99  # proper rotation, no reflection
        warped = A @ R.T + T[:3, 3]
        assert np.abs(warped - B).max() < 1e-3

    def test_gradients_flow(self, rng):
        A = jnp.asarray(rng.randn(2, 16, 3), jnp.float32)
        B = jnp.asarray(rng.randn(2, 16, 3), jnp.float32)
        w = jnp.asarray(rng.rand(2, 16), jnp.float32)

        def loss(w):
            T = kabsch_quat(A, B, w)
            return jnp.sum(T[:, :3, 3] ** 2)

        g = jax.grad(loss)(w)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0


class TestSpectral:
    def test_matches_numpy_eig(self, rng):
        # Build symmetric nonnegative compat-like matrices.
        X = rng.rand(4, 30, 30).astype(np.float32)
        M = X @ np.transpose(X, (0, 2, 1))
        v = np.asarray(leading_eigenvector(jnp.asarray(M), num_iters=100))
        for b in range(4):
            w_np, v_np = np.linalg.eigh(M[b])
            lead = v_np[:, -1]
            lead = lead * np.sign(lead.sum())
            got = v[b] * np.sign(v[b].sum())
            cos = np.abs(np.dot(lead, got) / (np.linalg.norm(lead) * np.linalg.norm(got)))
            assert cos > 0.9999, cos

    def test_early_exit_equivalence(self, rng):
        X = rng.rand(2, 20, 20).astype(np.float32)
        M = jnp.asarray(X @ np.transpose(X, (0, 2, 1)))
        v10 = leading_eigenvector(M, num_iters=10)
        # Manual unrolled loop, same math.
        v = jnp.ones(M.shape[:-1])
        for _ in range(10):
            v_new = jnp.einsum("bij,bj->bi", M, v)
            v_new = v_new / (jnp.linalg.norm(v_new, axis=-1, keepdims=True) + 1e-6)
            if np.allclose(np.asarray(v_new), np.asarray(v)):
                v = v_new
                break
            v = v_new
        np.testing.assert_allclose(np.asarray(v10), np.asarray(v), atol=1e-5)


class TestKNN:
    def test_vs_numpy(self, rng):
        x = rng.randn(2, 50, 8).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        idx = np.asarray(knn(jnp.asarray(x), k=5, ignore_self=True, normalized=True))
        for b in range(2):
            d = np.linalg.norm(x[b][:, None] - x[b][None], axis=-1)
            np.fill_diagonal(d, np.inf)
            expect = np.argsort(d, axis=-1)[:, :5]
            # Compare as sets (ties may reorder).
            for i in range(50):
                assert set(idx[b, i]) == set(expect[i])

    def test_pdist(self, rng):
        A = rng.randn(10, 4).astype(np.float32)
        B = rng.randn(7, 4).astype(np.float32)
        d = np.asarray(pdist(jnp.asarray(A), jnp.asarray(B), "L2"))
        expect = np.linalg.norm(A[:, None] - B[None], axis=-1)
        np.testing.assert_allclose(d, expect, atol=1e-3)

    def test_nearest_neighbor_chunked(self, rng):
        F0 = rng.randn(100, 16).astype(np.float32)
        F1 = rng.randn(77, 16).astype(np.float32)
        idx, d2 = nearest_neighbor(jnp.asarray(F0), jnp.asarray(F1), chunk=32)
        expect = np.argmin(
            np.linalg.norm(F0[:, None] - F1[None], axis=-1), axis=-1
        )
        np.testing.assert_array_equal(np.asarray(idx), expect)

    def test_mutual_mask(self, rng):
        F0 = rng.randn(30, 8).astype(np.float32)
        F1 = rng.randn(30, 8).astype(np.float32)
        m, idx01 = mutual_nearest_mask(jnp.asarray(F0), jnp.asarray(F1), chunk=16)
        d = np.linalg.norm(F0[:, None] - F1[None], axis=-1)
        i01 = np.argmin(d, axis=1)
        i10 = np.argmin(d, axis=0)
        expect = i10[i01] == np.arange(30)
        np.testing.assert_array_equal(np.asarray(m), expect)


class TestNMS:
    def test_suppression(self, rng):
        # 1-D points at 0.0 and 0.05 (within radius 0.1): lower scorer
        # suppressed; point at 10.0 is isolated and survives.
        pts = np.array([[0.0, 0, 0], [0.05, 0, 0], [10.0, 0, 0]], np.float32)
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)[None]
        scores = np.array([[0.9, 0.5, 0.1]], np.float32)
        seeds = np.asarray(
            pick_seeds_nms(jnp.asarray(d), jnp.asarray(scores), 0.1, 2)
        )
        assert seeds[0, 0] == 0 and seeds[0, 1] == 2

    def test_mask_excludes_padding(self, rng):
        pts = rng.randn(1, 20, 3).astype(np.float32)
        d = np.linalg.norm(pts[:, :, None] - pts[:, None], axis=-1)
        scores = rng.rand(1, 20).astype(np.float32)
        mask = np.ones((1, 20), np.float32)
        mask[0, 15:] = 0
        seeds = np.asarray(
            pick_seeds_nms(jnp.asarray(d), jnp.asarray(scores), 0.01, 10,
                           mask=jnp.asarray(mask))
        )
        assert np.all(seeds < 15)


class TestMetrics:
    def test_rotation_error(self, rng):
        R = random_se3(rng)[None, :3, :3].astype(np.float32)
        re = np.asarray(rotation_error_deg(jnp.asarray(R), jnp.asarray(R)))
        assert re[0] < 0.5  # clamped acos near 0

    def test_success(self, rng):
        T = np.eye(4, dtype=np.float32)[None]
        T2 = T.copy()
        T2[0, 0, 3] = 0.5  # 50 cm off
        ok, re, te = registration_success(jnp.asarray(T2), jnp.asarray(T), 15.0, 0.3)
        assert not bool(ok[0])
        np.testing.assert_allclose(np.asarray(te), [0.5], atol=1e-6)

    def test_prf1(self):
        pred = jnp.asarray([[1, 1, 0, 0]], jnp.float32)
        gt = jnp.asarray([[1, 0, 1, 0]], jnp.float32)
        p, r, f1 = precision_recall_f1(pred, gt)
        np.testing.assert_allclose(np.asarray(p), [0.5], atol=1e-5)
        np.testing.assert_allclose(np.asarray(r), [0.5], atol=1e-5)
        np.testing.assert_allclose(np.asarray(f1), [0.5], atol=1e-4)
