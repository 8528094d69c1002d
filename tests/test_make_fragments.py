"""RGBD sequence -> fragments -> multiway round trip.

VERDICT r2 item 8: the fragment-construction driver
(ref GMF_PointDSC/multiway/make_fragments.py:64-110). A synthetic RGBD
sequence over a bumpy wall is split into fragments; per-fragment odometry
+ pose-graph + TSDF produce fragment clouds; multiway registration of the
fragments recovers the ground-truth inter-fragment motion (ATE check).
"""

import os

import numpy as np
import pytest

from gmf_tpu.apps.make_fragments import (
    depth_to_cloud, make_fragments, make_posegraph_for_fragment,
    rgbd_odometry,
)

H, W = 96, 128
K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]], np.float32)

# Random Gaussian bumps on a wall: aperiodic landmarks, so the relative
# pose has a unique optimum (a periodic or flat wall lets ICP slide).
_r = np.random.RandomState(42)
_NB = 14
_BC = np.stack([_r.uniform(-1.2, 1.8, _NB), _r.uniform(-1.0, 1.0, _NB)], 1)
_BA = _r.uniform(-0.18, 0.18, _NB)
_BW = _r.uniform(0.15, 0.35, _NB)


def surf_z(x, y):
    z = np.full_like(x, 2.0)
    for (cx, cy), a, w in zip(_BC, _BA, _BW):
        z = z + a * np.exp(-(((x - cx) ** 2 + (y - cy) ** 2) / w ** 2))
    return z


def render_depth(cam_to_world: np.ndarray) -> np.ndarray:
    """Depth of the bumpy wall z_w = surf_z(x, y) seen from a camera pose
    (damped fixed-point ray intersection; residual ~5e-8)."""
    v, u = np.mgrid[0:H, 0:W].astype(np.float64)
    d_cam = np.stack([(u - K[0, 2]) / K[0, 0],
                      (v - K[1, 2]) / K[1, 1],
                      np.ones_like(u)], axis=-1)
    R, t = cam_to_world[:3, :3], cam_to_world[:3, 3]
    d_w = d_cam @ R.T
    o = t
    tt = np.full((H, W), 2.0)
    for _ in range(80):
        p = o[None, None, :] + tt[..., None] * d_w
        tt = tt + 0.7 * (surf_z(p[..., 0], p[..., 1]) - p[..., 2]) \
            / np.maximum(d_w[..., 2], 0.2)
    return tt.astype(np.float32)  # depth = z along the ray ~ camera z


def cam_pose(i: int) -> np.ndarray:
    """GT trajectory: slide along x with a slight yaw."""
    ang = 0.01 * i
    T = np.eye(4)
    T[:3, :3] = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                          [-np.sin(ang), 0, np.cos(ang)]])
    T[0, 3] = 0.04 * i
    T[1, 3] = 0.01 * i
    return T


@pytest.fixture(scope="module")
def sequence():
    poses = [cam_pose(i) for i in range(8)]
    depths = [render_depth(p) for p in poses]
    return depths, poses


def pose_err(Ta, Tb):
    d = np.linalg.inv(Ta) @ Tb
    re = np.degrees(np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1)))
    te = np.linalg.norm(d[:3, 3])
    return re, te


def test_depth_render_consistency(sequence):
    """Backprojecting frame i's depth and moving it by the GT relative
    pose lands on frame j's surface."""
    depths, poses = sequence
    c0 = depth_to_cloud(depths[0], K, num_points=512)
    w0 = c0 @ poses[0][:3, :3].T + poses[0][:3, 3]
    assert np.abs(w0[:, 2] - surf_z(w0[:, 0], w0[:, 1])).mean() < 0.002


def test_rgbd_odometry_recovers_gt(sequence):
    depths, poses = sequence
    c0 = depth_to_cloud(depths[0], K, seed=0)
    c1 = depth_to_cloud(depths[1], K, seed=1)
    ok, T01 = rgbd_odometry(c0, c1, max_corr_dist=0.10)
    assert ok
    T_gt = np.linalg.inv(poses[0]) @ poses[1]  # maps frame-1 cam pts to frame-0
    re, te = pose_err(T01, T_gt)
    assert re < 1.0 and te < 0.02, (re, te)


def test_fragment_posegraph_chains_odometry(sequence):
    depths, poses = sequence
    clouds = [depth_to_cloud(d, K, seed=i) for i, d in enumerate(depths[:4])]
    graph = make_posegraph_for_fragment(clouds, n_keyframes_per_n_frame=2,
                                        max_corr_dist=0.10)
    assert len(graph.nodes) == 4
    # odometry edges for every consecutive pair + >=1 loop closure
    kinds = [(e.i, e.j, e.uncertain) for e in graph.edges]
    for s in range(3):
        assert (s, s + 1, False) in kinds
    assert any(u for _, _, u in kinds)
    # node poses track the GT trajectory (frame 0 = fragment base)
    for i in range(4):
        T_gt = np.linalg.inv(poses[0]) @ poses[i]
        re, te = pose_err(graph.nodes[i], T_gt)
        assert re < 2.0 and te < 0.03, (i, re, te)


def test_sequence_to_fragments_to_multiway_ate(sequence, tmp_path):
    """The full round trip: 8 frames -> 2 fragments -> multiway -> ATE."""
    import jax.numpy as jnp

    from gmf_tpu.apps.multiway import ate_rmse, multiway_register
    from gmf_tpu.data.ply import read_ply
    from gmf_tpu.geometry.icp import icp_point_to_plane
    from gmf_tpu.ops.fpfh import estimate_normals

    depths, poses = sequence
    out = str(tmp_path / "fragments")
    frags = make_fragments(depths, K, out, n_frames_per_fragment=4,
                           n_keyframes_per_n_frame=2, voxel_size=0.02,
                           max_corr_dist=0.10)
    assert len(frags) == 2
    for fid in range(2):
        path = os.path.join(out, f"fragment_{fid:03d}.ply")
        assert os.path.exists(path)
        xyz = read_ply(path)["xyz"]
        assert len(xyz) > 200          # substantive fused cloud
        assert np.all(np.isfinite(xyz))

    rng = np.random.RandomState(0)

    def register_fn(fi, fj):
        a, b = fi["xyz"], fj["xyz"]
        a = a[rng.choice(len(a), 2000, replace=len(a) < 2000)]
        b = b[rng.choice(len(b), 2000, replace=len(b) < 2000)]
        na = estimate_normals(jnp.asarray(a), radius=0.15)
        # T_ij maps fragment j into fragment i (point-to-plane: the TSDF
        # crusts are two independent samplings of a smooth surface)
        T = np.asarray(icp_point_to_plane(
            jnp.asarray(b), jnp.asarray(a), na,
            jnp.asarray(np.eye(4, dtype=np.float32)),
            max_corr_dist=0.3, num_iters=50))
        return T.astype(np.float64), 1.0

    graph = multiway_register(frags, register_fn)
    # GT inter-fragment motion: fragment bases are frames 0 and 4
    gt = [np.eye(4), np.linalg.inv(poses[0]) @ poses[4]]
    re, te = pose_err(graph.nodes[1], gt[1])
    assert re < 3.0 and te < 0.05, (re, te)
    assert ate_rmse(graph.nodes, gt) < 0.05


def test_make_fragments_cli(sequence, tmp_path):
    """The __main__ CLI: depth .npy frames on disk -> fragment tree."""
    import subprocess
    import sys

    depths, _ = sequence
    ddir = tmp_path / "depth"
    ddir.mkdir()
    for i, d in enumerate(depths[:4]):
        np.save(ddir / f"{i:04d}.npy", d)
    np.save(tmp_path / "K.npy", K)
    out = tmp_path / "fragments"
    res = subprocess.run(
        [sys.executable, "-m", "gmf_tpu.apps.make_fragments",
         "--depth-dir", str(ddir), "--out", str(out),
         "--intrinsics", str(tmp_path / "K.npy"),
         "--n-frames-per-fragment", "2", "--voxel", "0.04", "--cpu"],
        cwd="/root/repo", capture_output=True, text=True, timeout=560)
    assert res.returncode == 0, res.stderr[-2000:]
    plys = sorted(os.listdir(out))
    assert "fragment_000.ply" in plys and "fragment_001.ply" in plys
    assert "fragment_000_pose.npy" in plys
