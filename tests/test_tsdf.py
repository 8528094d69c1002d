"""TSDF integration + Redwood layout tests."""

import os

import numpy as np

from gmf_tpu.apps.tsdf import TSDFVolume
from gmf_tpu.data.redwood import RedwoodDataset
from gmf_tpu.data.ply import write_ply


class TestTSDF:
    def test_flat_wall_reconstruction(self):
        """A synthetic depth image of a wall at z=1 m must produce points
        near the z=1 plane."""
        H, W = 60, 80
        f = 50.0
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
        depth = np.ones((H, W), np.float32)  # wall 1 m ahead

        vol = TSDFVolume(origin=[-1.0, -1.0, 0.0], dims=(50, 50, 40),
                         voxel_size=0.04)
        vol.integrate(depth, K, np.eye(4))
        pts = vol.extract_point_cloud()
        assert len(pts) > 50
        # surface voxels concentrate near z = 1
        assert np.abs(np.median(pts[:, 2]) - 1.0) < 0.08

    def test_multiple_frames_average(self):
        H, W = 40, 40
        K = np.array([[40.0, 0, 20], [0, 40.0, 20], [0, 0, 1]], np.float32)
        vol = TSDFVolume(origin=[-1, -1, 0], dims=(40, 40, 30),
                         voxel_size=0.05)
        for _ in range(3):
            vol.integrate(np.full((H, W), 0.8, np.float32), K, np.eye(4))
        w = np.asarray(vol.weight)
        assert w.max() == 3.0


class TestRedwood:
    def test_fragment_listing(self, tmp_path, rng):
        scene = tmp_path / "livingroom1" / "fragments"
        os.makedirs(scene)
        for i in range(3):
            write_ply(str(scene / f"frag_{i}.ply"),
                      rng.rand(20, 3).astype(np.float32))
        ds = RedwoodDataset(str(tmp_path))
        assert ds.scene == "livingroom1"
        assert len(ds) == 3
        assert ds[0]["xyz"].shape == (20, 3)
        assert ds.gt_trajectory() is None
