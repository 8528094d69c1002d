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

    def test_pair_dataset(self, tmp_path, rng):
        """RedwoodPairDataset: poses -> relative GT, overlap filter,
        mutual-NN correspondences with correct labels (Redwood.py:9-236)."""
        from gmf_tpu.data.redwood import RedwoodPairDataset

        scene = "livingroom1-simulated"
        frag_dir = tmp_path / scene / "fragments"
        os.makedirs(frag_dir)
        base = rng.rand(120, 3).astype(np.float32) * 2
        feat = rng.randn(120, 33).astype(np.float32)
        poses = [np.eye(4)]
        for ang in (0.3, 2.0):  # 3rd fragment far away: tiny overlap
            T = np.eye(4)
            T[:3, :3] = np.array([[np.cos(ang), -np.sin(ang), 0],
                                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
            T[:3, 3] = [0.1 * ang, 0, 9.0 * (ang > 1)]
            poses.append(T)
        far = base + np.array([50.0, 0, 0], np.float32)  # disjoint region
        for i, T in enumerate(poses):
            # fragment i = its world-space content expressed in frame i
            # (pose maps fragment -> world): xyz_i = inv(T) @ world
            world = base if i < 2 else far
            inv = np.linalg.inv(T)
            xyz = (world @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
            np.savez(frag_dir / f"fragment_{i:03d}_fpfh.npz",
                     xyz=xyz, feature=feat)
            np.save(frag_dir / f"fragment_{i:03d}.npy", T)

        ds = RedwoodPairDataset(str(tmp_path), scene, descriptor="fpfh",
                                min_overlap=0.3, num_node="all",
                                rng=np.random.RandomState(0))
        # pair (0,1) overlaps fully; pairs with fragment 2 are 9 m away
        assert ds.keys == [f"{scene}@0_1"]
        assert (tmp_path / f"{scene}-overlap.pkl").exists()
        s = ds[0]
        # identical features -> identity matches -> all labels inlier
        assert s["labels"].mean() == 1.0
        warped = s["src_keypts"] @ s["gt_trans"][:3, :3].T \
            + s["gt_trans"][:3, 3]
        np.testing.assert_allclose(warped, s["tgt_keypts"], atol=1e-4)
        # overlap cache is honored on reload (no recompute)
        ds2 = RedwoodPairDataset(str(tmp_path), scene, descriptor="fpfh",
                                 min_overlap=0.0, num_node=50,
                                 rng=np.random.RandomState(0))
        assert len(ds2) == 3
        assert len(ds2[1]["src_keypts"]) <= 50 + 1
