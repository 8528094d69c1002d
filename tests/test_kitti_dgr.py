"""KITTI DGR loader tests on a synthetic sequence tree."""

import os

import numpy as np
import pytest

from gmf_tpu.data.kitti_dgr_loader import (
    KITTINMPairDataset, read_velodyne_bin, read_poses, read_calib,
)


@pytest.fixture
def kitti_tree(tmp_path, rng):
    seq_dir = tmp_path / "sequences" / "00"
    (seq_dir / "velodyne").mkdir(parents=True)
    (seq_dir / "image_2").mkdir()
    (tmp_path / "poses").mkdir()

    # straight-line trajectory, 6 m steps -> pairs at >= 10 m every 2 frames
    n_frames = 6
    poses = []
    base = rng.rand(400, 3).astype(np.float32) * 20 - 10
    for t in range(n_frames):
        T = np.eye(4)
        T[:3, 3] = [6.0 * t, 0, 0]
        poses.append(T[:3, :4].reshape(-1))
        # world cloud seen from the frame: x_velo = inv(pose) @ x_world
        pts = base - np.array([6.0 * t, 0, 0], np.float32)
        scan = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], 1)
        scan.astype(np.float32).tofile(seq_dir / "velodyne" / f"{t:06d}.bin")
        import matplotlib.image as mpimg

        mpimg.imsave(seq_dir / "image_2" / f"{t:06d}.png",
                     (rng.rand(24, 32, 3) * 255).astype(np.uint8))
    np.savetxt(tmp_path / "poses" / "00.txt", np.stack(poses))
    with open(seq_dir / "calib.txt", "w") as f:
        tr = np.eye(4)[:3, :4].reshape(-1)
        f.write("Tr: " + " ".join(f"{v:.6f}" for v in tr) + "\n")
    return str(tmp_path)


class TestKITTIDGRLoader:
    def test_io_primitives(self, kitti_tree):
        scan = read_velodyne_bin(
            os.path.join(kitti_tree, "sequences/00/velodyne/000000.bin"))
        assert scan.shape[1] == 3
        poses = read_poses(os.path.join(kitti_tree, "poses/00.txt"))
        assert poses.shape == (6, 4, 4)
        Tr = read_calib(os.path.join(kitti_tree, "sequences/00"))
        np.testing.assert_allclose(Tr, np.eye(4))

    def test_pairs_and_gt(self, kitti_tree):
        ds = KITTINMPairDataset(kitti_tree, sequences=[0], min_dist=10.0,
                                voxel_size=0.5, image_hw=(24, 32),
                                refine_icp=True)
        # 6 m steps -> pairs (0,2), (2,4): >= 10 m apart
        assert len(ds) >= 2
        s = ds[0]
        assert s["pcd0"].shape[1] == 3
        assert s["p_image"].shape == (24, 32, 3)
        # GT check: frames are translated copies; T_gt must map velo0->velo1
        T = s["T_gt"]
        seq, t0, t1 = s["meta"]
        expected_shift = -6.0 * (t1 - t0)
        np.testing.assert_allclose(T[:3, 3], [expected_shift, 0, 0],
                                   atol=0.3)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=0.05)
        assert len(s["correspondences"]) > 0
        # cache hit second time
        s2 = ds[0]
        np.testing.assert_allclose(s2["T_gt"], T, atol=1e-6)
