"""Fixture-driven CLI tests for the remaining eval entry points.

VERDICT r2 item 7: eval/test_dgr.py, eval/test_kitti.py and
eval/test_recurrent.py are the reference's acceptance tests
(GMF_DGR_fcgf/scripts/test_3dmatch.py:261-293,
GMF_PointDSC/evaluation/test_KITTI.py,
test_3DMatch_recurrent.py:230-284) — each main() must run end-to-end on
a tiny fixture tree and print its aggregate report.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_dgr_checkpoints(tmp_path):
    """Write tiny-net FCGF/inlier checkpoints matching the CLI's --tiny
    widths; returns (fcgf_ckpt, inlier_ckpt) paths."""
    from gmf_tpu.sparse.kernel_map import build_pyramid
    from gmf_tpu.sparse.resunet import SparseResUNet2, pyramid_to_arrays
    from gmf_tpu.utils.checkpoint import save_checkpoint

    fcgf = SparseResUNet2(in_channels=1, out_channels=8, dim=3,
                          conv1_kernel_size=3, normalize_feature=True,
                          channels=(4, 8, 16, 32), tr_channels=(8, 8, 8, 16))
    inlier = SparseResUNet2(in_channels=1, out_channels=1, dim=6,
                            conv1_kernel_size=3, with_gmf_fusion=True,
                            image_dim=16, channels=(4, 8, 16, 32),
                            tr_channels=(8, 8, 8, 16))
    r = np.random.RandomState(5)
    c3 = np.unique(r.randint(0, 10, (80, 3)).astype(np.int32), axis=0)
    a3 = pyramid_to_arrays(build_pyramid(c3, 4, conv1_kernel_size=3,
                                         granule=256))
    fv = fcgf.init(jax.random.PRNGKey(0),
                   jnp.ones((a3["mask_0"].shape[0], 1)), a3)
    c6 = np.unique(r.randint(0, 6, (60, 6)).astype(np.int32), axis=0)
    a6 = pyramid_to_arrays(build_pyramid(c6, 4, conv1_kernel_size=3,
                                         granule=256))
    img = jnp.zeros((1, 16, 16, 3))
    iv = inlier.init(jax.random.PRNGKey(1),
                     jnp.ones((a6["mask_0"].shape[0], 1)), a6,
                     p_image=img, q_image=img)
    fcgf_ckpt = str(tmp_path / "fcgf_ckpt")
    inlier_ckpt = str(tmp_path / "inlier_ckpt")
    save_checkpoint(fcgf_ckpt, dict(fv))
    save_checkpoint(inlier_ckpt, dict(iv))
    return fcgf_ckpt, inlier_ckpt


def _rigid_pair(rng, N=250, ang=0.3):
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([0.2, -0.1, 0.1], np.float32)
    xyz0 = rng.rand(N, 3).astype(np.float32) * 2
    xyz1 = (xyz0 @ R.T + t).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t
    return xyz0, xyz1, T


# ---------------------------------------------------------------------------
# eval/test_dgr.py — raw clouds -> DeepGlobalRegistration.register()
# ---------------------------------------------------------------------------


@pytest.fixture
def dgr_fixture_tree(tmp_path, rng):
    import matplotlib.image as mpimg

    from gmf_tpu.data.ply import write_ply

    scene = "7-scenes-redkitchen"
    seq = tmp_path / scene / "seq-01"
    os.makedirs(seq)
    xyz0, xyz1, T = _rigid_pair(rng)
    write_ply(str(seq / "cloud_bin_0.ply"), xyz0)
    write_ply(str(seq / "cloud_bin_1.ply"), xyz1)
    for i in range(2):
        mpimg.imsave(seq / f"cloud_bin_{i}_0.png",
                     (rng.rand(16, 16, 3) * 255).astype(np.uint8))
    T_ts = np.linalg.inv(T.astype(np.float64))
    with open(tmp_path / scene / "gt.log", "w") as f:
        f.write("0 1 2\n")
        for row in T_ts:
            f.write(" ".join(f"{v:.8f}" for v in row) + "\n")
        # second pair (reverse direction) so shard tests have >1 item
        f.write("1 0 2\n")
        for row in np.linalg.inv(T_ts):
            f.write(" ".join(f"{v:.8f}" for v in row) + "\n")

    fcgf_ckpt, inlier_ckpt = _tiny_dgr_checkpoints(tmp_path)
    return str(tmp_path), fcgf_ckpt, inlier_ckpt, scene


def test_dgr_cli(dgr_fixture_tree, monkeypatch, caplog):
    root, fcgf_ckpt, inlier_ckpt, scene = dgr_fixture_tree
    from gmf_tpu.eval import test_dgr

    out_dir = os.path.join(root, "dgr_out")
    monkeypatch.setattr(sys, "argv", [
        "test_dgr", "--root", root, "--fcgf-checkpoint", fcgf_ckpt,
        "--inlier-checkpoint", inlier_ckpt, "--scenes", scene,
        "--voxel", "0.1", "--tiny", "--out", out_dir,
    ])
    import logging

    with caplog.at_level(logging.INFO):
        test_dgr.main()
    stats = np.load(os.path.join(out_dir, "dgr_stats.npy"))
    assert stats.shape[0] == 2 and stats.shape[1] == 5
    assert np.all(np.isfinite(stats))
    assert "recall=" in caplog.text

    # --overlap/--workers: threaded pipeline must reproduce serial rows
    out_dir2 = os.path.join(root, "dgr_out_ovl")
    monkeypatch.setattr(sys, "argv", [
        "test_dgr", "--root", root, "--fcgf-checkpoint", fcgf_ckpt,
        "--inlier-checkpoint", inlier_ckpt, "--scenes", scene,
        "--voxel", "0.1", "--tiny", "--out", out_dir2,
        "--overlap", "2", "--workers", "2",
    ])
    test_dgr.main()
    stats2 = np.load(os.path.join(out_dir2, "dgr_stats.npy"))
    np.testing.assert_array_equal(stats2, stats)


def test_dgr_cli_sharded(dgr_fixture_tree, monkeypatch, caplog):
    """DP over register() streams (VERDICT r3 item 2a): two disjoint
    shards' union must reproduce the serial stats, and --merge-shards
    must aggregate them into the global summary."""
    root, fcgf_ckpt, inlier_ckpt, scene = dgr_fixture_tree
    from gmf_tpu.eval import test_dgr

    base = ["test_dgr", "--root", root, "--fcgf-checkpoint", fcgf_ckpt,
            "--inlier-checkpoint", inlier_ckpt, "--scenes", scene,
            "--voxel", "0.1", "--tiny"]

    out_ser = os.path.join(root, "dgr_serial")
    monkeypatch.setattr(sys, "argv", base + ["--out", out_ser])
    test_dgr.main()
    serial = np.load(os.path.join(out_ser, "dgr_stats.npy"))
    assert serial.shape[0] == 2

    out_sh = os.path.join(root, "dgr_sharded")
    for i in range(2):
        monkeypatch.setattr(sys, "argv", base + [
            "--out", out_sh, "--shard-index", str(i),
            "--shard-count", "2"])
        test_dgr.main()
        shard = np.load(os.path.join(out_sh,
                                     f"dgr_stats_shard{i}of2.npy"))
        assert shard.shape[0] == 1  # strided split of 2 pairs

    import logging

    monkeypatch.setattr(sys, "argv", base + ["--out", out_sh,
                                             "--merge-shards"])
    with caplog.at_level(logging.INFO):
        test_dgr.main()
    merged = np.load(os.path.join(out_sh, "dgr_stats.npy"))
    assert "[merged 2 shards]" in caplog.text
    # union == serial rows (order-independent)
    np.testing.assert_allclose(
        np.sort(merged, axis=0), np.sort(serial, axis=0), rtol=1e-6)


def test_dgr_merge_shards_rejects_stale_mixed_counts(tmp_path,
                                                     monkeypatch):
    """ADVICE r4: stale shard files from a previous run with a
    different --shard-count must not silently merge; incomplete shard
    sets must be rejected too."""
    from gmf_tpu.eval import test_dgr

    out = str(tmp_path)
    row = np.ones((1, 12), np.float32)
    # --merge-shards skips evaluation before the checkpoints are read;
    # the required args just need to parse
    base = ["test_dgr", "--root", out, "--fcgf-checkpoint", "x",
            "--inlier-checkpoint", "x", "--out", out, "--merge-shards"]

    # mixed shard counts (0of2 left over next to a fresh 0of4..3of4)
    for name in ("dgr_stats_shard0of2.npy", "dgr_stats_shard0of4.npy",
                 "dgr_stats_shard1of4.npy", "dgr_stats_shard2of4.npy",
                 "dgr_stats_shard3of4.npy"):
        np.save(os.path.join(out, name), row)
    monkeypatch.setattr(sys, "argv", base)
    with pytest.raises(SystemExit, match="mixed shard counts"):
        test_dgr.main()
    os.remove(os.path.join(out, "dgr_stats_shard0of2.npy"))

    # incomplete set: drop shard 2 of 4
    os.remove(os.path.join(out, "dgr_stats_shard2of4.npy"))
    monkeypatch.setattr(sys, "argv", base)
    with pytest.raises(SystemExit, match="expected shards"):
        test_dgr.main()

    # consistent complete set merges (incl. an empty shard — more
    # shards than pairs)
    np.save(os.path.join(out, "dgr_stats_shard2of4.npy"),
            np.zeros((0, 12), np.float32))
    monkeypatch.setattr(sys, "argv", base)
    test_dgr.main()
    merged = np.load(os.path.join(out, "dgr_stats.npy"))
    assert merged.shape == (3, 12)


def test_dgr_cli_kitti(tmp_path, rng, monkeypatch, caplog):
    """--dataset kitti: raw velodyne pairs through register()."""
    import matplotlib.image as mpimg

    # KITTI layout: straight-line trajectory, same world cloud per frame
    seq_dir = tmp_path / "sequences" / "00"
    (seq_dir / "velodyne").mkdir(parents=True)
    (seq_dir / "image_2").mkdir()
    (tmp_path / "poses").mkdir()
    base_cloud = rng.rand(500, 3).astype(np.float32) * 16 - 8
    poses = []
    for t in range(3):
        T = np.eye(4)
        T[:3, 3] = [11.0 * t, 0, 0]
        poses.append(T[:3, :4].reshape(-1))
        pts = base_cloud - np.array([11.0 * t, 0, 0], np.float32)
        scan = np.concatenate(
            [pts, np.ones((len(pts), 1), np.float32)], 1)
        scan.astype(np.float32).tofile(
            seq_dir / "velodyne" / f"{t:06d}.bin")
        mpimg.imsave(seq_dir / "image_2" / f"{t:06d}.png",
                     (rng.rand(24, 32, 3) * 255).astype(np.uint8))
    np.savetxt(tmp_path / "poses" / "00.txt", np.stack(poses))
    with open(seq_dir / "calib.txt", "w") as f:
        tr = np.eye(4)[:3, :4].reshape(-1)
        f.write("Tr: " + " ".join(f"{v:.6f}" for v in tr) + "\n")

    fcgf_ckpt, inlier_ckpt = _tiny_dgr_checkpoints(tmp_path)

    from gmf_tpu.eval import test_dgr

    out_dir = str(tmp_path / "dgr_kitti_out")
    monkeypatch.setattr(sys, "argv", [
        "test_dgr", "--root", str(tmp_path), "--dataset", "kitti",
        "--fcgf-checkpoint", fcgf_ckpt, "--inlier-checkpoint", inlier_ckpt,
        "--scenes", "0", "--voxel", "0.5", "--tiny", "--out", out_dir,
    ])
    import logging

    with caplog.at_level(logging.INFO):
        test_dgr.main()
    stats = np.load(os.path.join(out_dir, "dgr_stats.npy"))
    assert stats.shape[0] >= 1 and stats.shape[1] == 5
    assert np.all(np.isfinite(stats))
    assert "recall=" in caplog.text


# ---------------------------------------------------------------------------
# eval/test_kitti.py — precomputed npz-per-pair protocol
# ---------------------------------------------------------------------------


@pytest.fixture
def kitti_fixture_tree(tmp_path, rng):
    from gmf_tpu.models import PointDSC
    from gmf_tpu.utils.checkpoint import save_checkpoint

    d = tmp_path / "fcgf_test"
    os.makedirs(d)
    xyz0, xyz1, T = _rigid_pair(rng, N=200)
    feat = rng.randn(200, 16).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    img = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
    np.savez(d / "pair_000000.npz", xyz0=xyz0, xyz1=xyz1,
             features0=feat, features1=feat, p_image=img, q_image=img,
             gt_trans=T)

    model = PointDSC(num_layers=1, num_channels=16, k=10)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 6)), jnp.zeros((1, 32, 3)),
        jnp.zeros((1, 32, 3)), jnp.zeros((1, 24, 32, 3)),
        jnp.zeros((1, 24, 32, 3)))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }, config={"model": {"num_layers": 1, "num_channels": 16, "k": 10}})
    return str(tmp_path), ckpt


def test_kitti_cli(kitti_fixture_tree, monkeypatch):
    root, ckpt = kitti_fixture_tree
    from gmf_tpu.eval import test_kitti

    out_dir = os.path.join(root, "kitti_out")
    monkeypatch.setattr(sys, "argv", [
        "test_kitti", "--root", root, "--checkpoint", ckpt,
        "--num-node", "1000", "--out", out_dir, "--no-fused",
    ])
    test_kitti.main()
    stats = np.load(os.path.join(out_dir, "all_stats.npy"))
    assert stats.shape == (1, 12)
    # geometry-driven machinery registers the clean synthetic pair
    assert stats[0, 0] == 1.0, stats[0]


def test_kitti_cli_batched(kitti_fixture_tree, monkeypatch):
    root, ckpt = kitti_fixture_tree
    from gmf_tpu.eval import test_kitti

    out_dir = os.path.join(root, "kitti_out_b")
    monkeypatch.setattr(sys, "argv", [
        "test_kitti", "--root", root, "--checkpoint", ckpt,
        "--num-node", "1000", "--out", out_dir, "--no-fused",
        "--batch", "2", "--mesh", "2",
    ])
    test_kitti.main()
    stats = np.load(os.path.join(out_dir, "all_stats.npy"))
    assert stats.shape == (1, 12)
    assert stats[0, 0] == 1.0, stats[0]


def test_kitti_cli_device_match(kitti_fixture_tree, monkeypatch):
    root, ckpt = kitti_fixture_tree
    from gmf_tpu.eval import test_kitti

    out_dir = os.path.join(root, "kitti_out_dm")
    monkeypatch.setattr(sys, "argv", [
        "test_kitti", "--root", root, "--checkpoint", ckpt,
        "--num-node", "1000", "--out", out_dir, "--no-fused",
        "--batch", "2", "--device-match",
    ])
    test_kitti.main()
    stats = np.load(os.path.join(out_dir, "all_stats.npy"))
    assert stats.shape == (1, 12)
    assert stats[0, 0] == 1.0, stats[0]


# ---------------------------------------------------------------------------
# eval/test_recurrent.py — checkpoint sweep
# ---------------------------------------------------------------------------


def test_recurrent_cli(tmp_path, rng, monkeypatch, caplog):
    """Sweeps a snapshot dir of two checkpoints over the 3DMatch fixture
    tree and reports the best recall."""
    import matplotlib.image as mpimg

    from gmf_tpu.eval import test_recurrent
    from gmf_tpu.models import PointDSC
    from gmf_tpu.utils.checkpoint import save_checkpoint

    scene = "7-scenes-redkitchen"
    seq = tmp_path / scene / "seq-01"
    os.makedirs(seq)
    xyz0, xyz1, T = _rigid_pair(rng, N=120)
    feat = rng.randn(120, 16).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    for i, xyz in enumerate([xyz0, xyz1]):
        np.savez(seq / f"cloud_bin_{i}_fcgf.npz", xyz=xyz, feature=feat)
        mpimg.imsave(seq / f"cloud_bin_{i}_0.png",
                     (rng.rand(48, 64, 3) * 255).astype(np.uint8))
    T_ts = np.linalg.inv(T.astype(np.float64))
    with open(tmp_path / scene / "gt.log", "w") as f:
        f.write("0 1 2\n")
        for row in T_ts:
            f.write(" ".join(f"{v:.8f}" for v in row) + "\n")

    snap = tmp_path / "snapshot"
    os.makedirs(snap)
    model = PointDSC(num_layers=1, num_channels=16, k=10)
    for e in range(2):
        variables = model.init(
            jax.random.PRNGKey(e), jnp.zeros((1, 32, 6)),
            jnp.zeros((1, 32, 3)), jnp.zeros((1, 32, 3)),
            jnp.zeros((1, 24, 32, 3)), jnp.zeros((1, 24, 32, 3)))
        save_checkpoint(str(snap / f"epoch_{e}"), {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        }, config={"model": {"num_layers": 1, "num_channels": 16,
                             "k": 10}})

    import logging

    monkeypatch.setattr(sys, "argv", [
        "test_recurrent", "--root", str(tmp_path), "--snapshot-dir",
        str(snap), "--scenes", scene,
    ])
    with caplog.at_level(logging.INFO):
        test_recurrent.main()
    assert "sweeping 2 checkpoints" in caplog.text
    assert "BEST:" in caplog.text
    # both checkpoints evaluated with a recall line each
    assert caplog.text.count("recall=") >= 3  # 2 sweeps + BEST
