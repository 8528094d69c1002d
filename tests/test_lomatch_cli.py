"""3DLoMatch eval CLI smoke test on a fixture pair list + tree."""

import os
import pickle
import sys

import numpy as np
import pytest


@pytest.mark.parametrize("device_match", [False, True])
def test_lomatch_cli(tmp_path, rng, monkeypatch, device_match):
    import jax
    import jax.numpy as jnp
    import matplotlib.image as mpimg

    from gmf_tpu.models import PointDSC
    from gmf_tpu.utils.checkpoint import save_checkpoint

    # two clouds with a known transform + shared features
    N = 100
    xyz0 = rng.rand(N, 3).astype(np.float32)
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([0.1, 0.2, 0.0], np.float32)
    xyz1 = (xyz0 @ R.T + t).astype(np.float32)
    feat = rng.randn(N, 8).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    for i, xyz in enumerate([xyz0, xyz1]):
        base = str(tmp_path / f"cloud_{i}")
        np.savez(base + "_fcgf.npz", xyz=xyz, feature=feat)
        mpimg.imsave(base + "_0.png",
                     (rng.rand(48, 64, 3) * 255).astype(np.uint8))

    # PREDATOR-format pair list
    infos = {
        "rot": np.stack([R]),
        "trans": np.stack([t.reshape(3, 1)]),
        "src": np.array(["cloud_0.pth"]),
        "tgt": np.array(["cloud_1.pth"]),
    }
    pair_file = str(tmp_path / "3DLoMatch.pkl")
    with open(pair_file, "wb") as f:
        pickle.dump(infos, f)

    # tiny checkpoint
    model = PointDSC(num_layers=1, num_channels=16, k=10)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 6)),
                   jnp.zeros((1, 32, 3)), jnp.zeros((1, 32, 3)),
                   jnp.zeros((1, 24, 32, 3)), jnp.zeros((1, 24, 32, 3)))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": v["params"],
                           "batch_stats": v["batch_stats"]},
                    config={"model": {"num_layers": 1, "num_channels": 16,
                                      "k": 10}})

    from gmf_tpu.eval import test_3dlomatch

    out = str(tmp_path / "out")
    argv = ["lomatch", "--root", str(tmp_path), "--pair-file", pair_file,
            "--checkpoint", ckpt, "--num-node", "all", "--out", out]
    if device_match:
        argv += ["--device-match", "--batch", "1"]
    monkeypatch.setattr(sys, "argv", argv)
    test_3dlomatch.main()
    stats = np.load(os.path.join(out, "all_stats.npy"))
    assert stats.shape == (1, 12)
    assert stats[0, 0] == 1.0  # geometry-driven success


def test_lomatch_cli_ring(tmp_path, rng, monkeypatch):
    """--ring N (VERDICT r4 weak-5): the SP/CP megapair config driven
    end-to-end — every NonLocal layer runs ring attention over an
    8-virtual-device 'data' mesh, num_node='all', and the pair still
    registers with the same stats layout as the serial run."""
    import jax
    import jax.numpy as jnp
    import matplotlib.image as mpimg

    from gmf_tpu.models import PointDSC
    from gmf_tpu.utils.checkpoint import save_checkpoint

    N = 100
    xyz0 = rng.rand(N, 3).astype(np.float32)
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([0.1, 0.2, 0.0], np.float32)
    xyz1 = (xyz0 @ R.T + t).astype(np.float32)
    feat = rng.randn(N, 8).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    for i, xyz in enumerate([xyz0, xyz1]):
        base = str(tmp_path / f"cloud_{i}")
        np.savez(base + "_fcgf.npz", xyz=xyz, feature=feat)
        mpimg.imsave(base + "_0.png",
                     (rng.rand(48, 64, 3) * 255).astype(np.uint8))

    infos = {
        "rot": np.stack([R]),
        "trans": np.stack([t.reshape(3, 1)]),
        "src": np.array(["cloud_0.pth"]),
        "tgt": np.array(["cloud_1.pth"]),
    }
    pair_file = str(tmp_path / "3DLoMatch.pkl")
    with open(pair_file, "wb") as f:
        pickle.dump(infos, f)

    model = PointDSC(num_layers=1, num_channels=16, k=10)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 6)),
                   jnp.zeros((1, 32, 3)), jnp.zeros((1, 32, 3)),
                   jnp.zeros((1, 24, 32, 3)), jnp.zeros((1, 24, 32, 3)))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": v["params"],
                           "batch_stats": v["batch_stats"]},
                    config={"model": {"num_layers": 1, "num_channels": 16,
                                      "k": 10}})

    from gmf_tpu.eval import test_3dlomatch

    # serial reference run
    out_ser = str(tmp_path / "out_ser")
    monkeypatch.setattr(sys, "argv", [
        "lomatch", "--root", str(tmp_path), "--pair-file", pair_file,
        "--checkpoint", ckpt, "--num-node", "all", "--out", out_ser])
    test_3dlomatch.main()
    stats_ser = np.load(os.path.join(out_ser, "all_stats.npy"))

    out = str(tmp_path / "out_ring")
    monkeypatch.setattr(sys, "argv", [
        "lomatch", "--root", str(tmp_path), "--pair-file", pair_file,
        "--checkpoint", ckpt, "--num-node", "all", "--out", out,
        "--ring", "8"])
    test_3dlomatch.main()
    stats = np.load(os.path.join(out, "all_stats.npy"))
    assert stats.shape == (1, 12)
    assert stats[0, 0] == 1.0  # geometry-driven success
    # same registration outcome + error metrics as the serial run
    np.testing.assert_allclose(stats[0, :3], stats_ser[0, :3], atol=1e-3)

    # --ring + --mesh is rejected
    monkeypatch.setattr(sys, "argv", [
        "lomatch", "--root", str(tmp_path), "--pair-file", pair_file,
        "--checkpoint", ckpt, "--out", out, "--ring", "8", "--mesh", "2"])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        test_3dlomatch.main()
