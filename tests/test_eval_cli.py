"""End-to-end eval CLI smoke test on a synthetic 3DMatch fixture tree."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture
def fixture_tree(tmp_path, rng):
    """Scene tree + tiny trained-shape checkpoint."""
    import jax
    import jax.numpy as jnp
    import matplotlib.image as mpimg

    from gmf_tpu.models import PointDSC
    from gmf_tpu.utils.checkpoint import save_checkpoint

    scene = "7-scenes-redkitchen"
    seq = tmp_path / scene / "seq-01"
    os.makedirs(seq)

    # two clouds related by a known transform, mutual-consistent features
    N = 120
    xyz0 = rng.rand(N, 3).astype(np.float32) * 2
    ang = 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([0.2, -0.1, 0.1], np.float32)
    xyz1 = (xyz0 @ R.T + t).astype(np.float32)
    feat = rng.randn(N, 16).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    for i, (xyz, f) in enumerate([(xyz0, feat), (xyz1, feat)]):
        np.savez(seq / f"cloud_bin_{i}_fcgf.npz", xyz=xyz, feature=f)
        mpimg.imsave(seq / f"cloud_bin_{i}_0.png",
                     (rng.rand(48, 64, 3) * 255).astype(np.uint8))
    # gt.log stores target->source
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    T_ts = np.linalg.inv(T)
    with open(tmp_path / scene / "gt.log", "w") as f:
        f.write("0 1 2\n")
        for row in T_ts:
            f.write(" ".join(f"{v:.8f}" for v in row) + "\n")

    # tiny checkpoint with embedded model config
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
    return str(tmp_path), ckpt, scene


def test_eval_3dmatch_cli(fixture_tree, monkeypatch, capsys):
    root, ckpt, scene = fixture_tree
    from gmf_tpu.eval import test_3dmatch

    out_dir = os.path.join(root, "eval_out")
    monkeypatch.setattr(sys, "argv", [
        "test_3dmatch", "--root", root, "--checkpoint", ckpt,
        "--num-node", "all", "--scenes", scene, "--out", out_dir,
    ])
    test_3dmatch.main()
    stats = np.load(os.path.join(out_dir, "all_stats.npy"))
    assert stats.shape == (1, 12)
    # geometry-driven registration should succeed even with random weights
    assert stats[0, 0] == 1.0, stats[0]
    assert stats[0, 1] < 15.0  # RE within threshold


def test_eval_3dmatch_cli_batched_mesh(fixture_tree, monkeypatch):
    """--batch/--mesh: the batched data-parallel dispatch path through
    the real CLI (pads the 1-pair batch to the 8-device mesh)."""
    root, ckpt, scene = fixture_tree
    from gmf_tpu.eval import test_3dmatch

    out_dir = os.path.join(root, "eval_out_dp")
    monkeypatch.setattr(sys, "argv", [
        "test_3dmatch", "--root", root, "--checkpoint", ckpt,
        "--num-node", "all", "--scenes", scene, "--out", out_dir,
        "--batch", "4", "--mesh", "8", "--inflight", "2",
    ])
    test_3dmatch.main()
    stats = np.load(os.path.join(out_dir, "all_stats.npy"))
    assert stats.shape == (1, 12)
    assert stats[0, 0] == 1.0, stats[0]
    # serial CLI run on the same tree must agree on the non-timing stats
    ser_dir = os.path.join(root, "eval_out_serial")
    monkeypatch.setattr(sys, "argv", [
        "test_3dmatch", "--root", root, "--checkpoint", ckpt,
        "--num-node", "all", "--scenes", scene, "--out", ser_dir,
    ])
    test_3dmatch.main()
    serial = np.load(os.path.join(ser_dir, "all_stats.npy"))
    cols = [0, 3, 4, 5, 6, 7, 8, 11]
    np.testing.assert_array_equal(stats[:, cols], serial[:, cols])
    np.testing.assert_allclose(stats[:, 1:3], serial[:, 1:3], atol=0.02)


def test_baseline_eval_cli_skips_unavailable(fixture_tree, monkeypatch,
                                             caplog):
    """SM/RANSAC run under the harness; GC-RANSAC logs SKIPPED (no wheel)
    instead of crashing (ref baseline_scripts/baseline_3DMatch.py)."""
    root, _, scene = fixture_tree
    from gmf_tpu.eval import baseline_eval
    from gmf_tpu.eval.baselines import gcransac_available

    out_dir = os.path.join(root, "baseline_out")
    monkeypatch.setattr(sys, "argv", [
        "baseline_eval", "--root", root, "--methods", "SM", "RANSAC",
        "GCRANSAC", "--scenes", scene, "--out", out_dir,
    ])
    import logging

    with caplog.at_level(logging.INFO):
        baseline_eval.main()
    for method in ("SM", "RANSAC"):
        stats = np.load(os.path.join(out_dir, f"{method}_stats.npy"))
        assert stats.shape == (1, 12)
        assert stats[0, 0] == 1.0, (method, stats[0])
    if not gcransac_available():
        assert "SKIPPED" in caplog.text
        assert not os.path.exists(os.path.join(out_dir,
                                               "GCRANSAC_stats.npy"))
    else:
        # native cpp/gcransac (or the wheel) ran under the harness and
        # must register the easy fixture pair
        stats = np.load(os.path.join(out_dir, "GCRANSAC_stats.npy"))
        assert stats.shape == (1, 12)
        assert stats[0, 0] == 1.0, ("GCRANSAC", stats[0])
