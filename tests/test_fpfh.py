"""FPFH + normals + PLY tests."""

import os

import numpy as np
import jax.numpy as jnp

from gmf_tpu.ops.fpfh import estimate_normals, fpfh_features, compute_fpfh
from gmf_tpu.data.ply import read_ply, write_ply


class TestNormals:
    def test_plane_normals(self, rng):
        pts = np.zeros((200, 3), np.float32)
        pts[:, 0] = rng.rand(200) * 2
        pts[:, 1] = rng.rand(200) * 2  # z = 0 plane
        n = np.asarray(estimate_normals(jnp.asarray(pts), radius=0.5))
        # all normals must be ±z
        assert np.abs(np.abs(n[:, 2]) - 1.0).max() < 1e-3
        assert np.abs(n[:, :2]).max() < 1e-2

    def test_sphere_normals_radial(self, rng):
        v = rng.randn(300, 3).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        n = np.asarray(estimate_normals(jnp.asarray(v), radius=0.5))
        cos = np.abs(np.sum(n * v, axis=1))
        assert np.median(cos) > 0.98


class TestFPFH:
    def test_shape_and_finite(self, rng):
        pts = rng.rand(150, 3).astype(np.float32)
        feat = np.asarray(compute_fpfh(jnp.asarray(pts)))
        assert feat.shape == (150, 33)
        assert np.all(np.isfinite(feat))
        norms = np.linalg.norm(feat, axis=1)
        np.testing.assert_allclose(norms[norms > 0], 1.0, atol=1e-3)

    def test_rigid_invariance(self, rng):
        """FPFH is invariant under rigid transforms (same neighborhoods)."""
        pts = rng.rand(120, 3).astype(np.float32)
        ang = 0.7
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        t = np.array([5.0, -3.0, 2.0], np.float32)  # far from origin
        pts2 = pts @ R.T + t

        # Use explicitly transformed normals to remove viewpoint-orientation
        # differences (our normals orient towards the origin).
        n1 = np.asarray(estimate_normals(jnp.asarray(pts), radius=0.4))
        f1 = np.asarray(fpfh_features(jnp.asarray(pts), jnp.asarray(n1),
                                      radius=0.6))
        n2 = (n1 @ R.T).astype(np.float32)
        f2 = np.asarray(fpfh_features(jnp.asarray(pts2), jnp.asarray(n2),
                                      radius=0.6))
        np.testing.assert_allclose(f1, f2, atol=0.5, rtol=0.05)

    def test_mask_excludes_points(self, rng):
        pts = rng.rand(100, 3).astype(np.float32)
        big = np.concatenate([pts, np.full((28, 3), 99.0, np.float32)])
        mask = np.concatenate([np.ones(100, np.float32), np.zeros(28, np.float32)])
        f_small = np.asarray(compute_fpfh(jnp.asarray(pts)))
        f_big = np.asarray(compute_fpfh(jnp.asarray(big), mask=jnp.asarray(mask)))
        np.testing.assert_allclose(f_big[:100], f_small, atol=1e-4)


class TestPLY:
    def test_roundtrip_binary_and_ascii(self, tmp_path, rng):
        xyz = rng.rand(50, 3).astype(np.float32)
        for ascii_fmt in (False, True):
            p = str(tmp_path / f"c_{ascii_fmt}.ply")
            write_ply(p, xyz, ascii_fmt=ascii_fmt)
            back = read_ply(p)
            np.testing.assert_allclose(back["xyz"], xyz, atol=1e-5)

    def test_extra_properties(self, tmp_path, rng):
        # hand-written ply with colors
        p = str(tmp_path / "c.ply")
        with open(p, "wb") as f:
            f.write(b"ply\nformat ascii 1.0\nelement vertex 2\n"
                    b"property float x\nproperty float y\nproperty float z\n"
                    b"property uchar red\n"
                    b"end_header\n"
                    b"0 0 0 255\n1 2 3 10\n")
        out = read_ply(p)
        assert out["xyz"].shape == (2, 3)
        np.testing.assert_allclose(out["red"], [255, 10])
