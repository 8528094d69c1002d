"""On-device correspondence building (eval raw-descriptor path).

The device matcher must reproduce the host ``build_correspondences``
recipe exactly (reference loaders ThreeDMatch.py:163-217): same match
set, same labels, same corr_pos encoding — and the registrar's raw path
must produce the same registration as the host-matching path.
"""

import numpy as np
import pytest


def make_pair(rng, ns=150, nt=130, d=16, inlier_frac=0.5):
    """Random pair where a known subset mutual-matches correctly."""
    xyz0 = rng.rand(ns, 3).astype(np.float32) * 2
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([0.2, -0.1, 0.3], np.float32)
    n_in = int(ns * inlier_frac)
    xyz1 = np.vstack([
        (xyz0[:n_in] @ R.T + t),
        rng.rand(nt - n_in, 3).astype(np.float32) * 2,
    ]).astype(np.float32)
    # descriptors: first n_in rows shared (inliers), rest random
    fs = rng.randn(ns, d).astype(np.float32)
    ft = rng.randn(nt, d).astype(np.float32)
    ft[:n_in] = fs[:n_in] + 0.01 * rng.randn(n_in, d).astype(np.float32)
    fs /= np.linalg.norm(fs, axis=1, keepdims=True)
    ft /= np.linalg.norm(ft, axis=1, keepdims=True)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t
    return xyz0, xyz1, fs, ft, T


@pytest.mark.parametrize("use_mutual,in_dim", [
    (True, 6), (False, 6), (True, 3), (True, 9), (True, 70),
])
def test_match_descriptors_device_parity(rng, use_mutual, in_dim):
    import jax.numpy as jnp

    from gmf_tpu.data.correspondence import (
        build_correspondences, match_descriptors_device,
    )

    # in_dim 70 = 6 + 2*32: the descriptor-concat encoding
    xyz0, xyz1, fs, ft, T = make_pair(rng, d=32 if in_dim == 70 else 16)
    ns, nt = len(xyz0), len(xyz1)
    host = build_correspondences(xyz0, xyz1, fs, ft, T, 0.10,
                                 use_mutual=use_mutual, in_dim=in_dim)

    bs, bt = 192, 160  # pad both sides
    pad = lambda x, b: np.pad(x, [(0, b - len(x))] + [(0, 0)] * (x.ndim - 1))
    mask_s = np.zeros(bs, np.float32); mask_s[:ns] = 1
    mask_t = np.zeros(bt, np.float32); mask_t[:nt] = 1
    dev = match_descriptors_device(
        jnp.asarray(pad(xyz0, bs)), jnp.asarray(pad(xyz1, bt)),
        jnp.asarray(pad(fs, bs)), jnp.asarray(pad(ft, bt)),
        jnp.asarray(T), 0.10, jnp.asarray(mask_s), jnp.asarray(mask_t),
        use_mutual=use_mutual, in_dim=in_dim)

    cmask = np.asarray(dev["corr_mask"])
    valid = cmask > 0
    assert not valid[ns:].any()  # padding rows never match
    assert int(valid.sum()) == len(host["labels"])
    np.testing.assert_array_equal(
        np.asarray(dev["labels"])[valid], host["labels"])
    np.testing.assert_allclose(
        np.asarray(dev["src_keypts"])[valid], host["src_keypts"],
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dev["tgt_keypts"])[valid], host["tgt_keypts"],
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dev["corr_pos"])[valid], host["corr_pos"], atol=1e-5)


def test_match_descriptors_mutual_fallback(rng):
    """<10 mutual matches -> in-graph fallback to plain 1-NN (the host
    re-calls build_correspondences with use_mutual=False)."""
    import jax.numpy as jnp

    from gmf_tpu.data.correspondence import match_descriptors_device

    ns, nt = 32, 40
    xyz0 = rng.rand(ns, 3).astype(np.float32)
    xyz1 = rng.rand(nt, 3).astype(np.float32)
    # adversarial descriptors: every src row closest to tgt row 0,
    # whose own 1-NN is a single src row -> at most 1 mutual match
    fs = np.tile(rng.randn(1, 8).astype(np.float32), (ns, 1))
    fs += 1e-3 * rng.randn(ns, 8).astype(np.float32)
    ft = rng.randn(nt, 8).astype(np.float32) * 10
    fs /= np.linalg.norm(fs, axis=1, keepdims=True)
    ft /= np.linalg.norm(ft, axis=1, keepdims=True)
    dev = match_descriptors_device(
        jnp.asarray(xyz0), jnp.asarray(xyz1), jnp.asarray(fs),
        jnp.asarray(ft), jnp.eye(4, dtype=np.float32), 0.10,
        jnp.ones(ns, np.float32), jnp.ones(nt, np.float32),
        use_mutual=True, in_dim=6)
    # fallback keeps every valid source row
    assert int(np.asarray(dev["corr_mask"]).sum()) == ns


def test_registrar_raw_matches_host_path(rng):
    """Registrar raw-descriptor path == host-matching path end to end."""
    import jax
    import jax.numpy as jnp

    from gmf_tpu.data.correspondence import build_correspondences
    from gmf_tpu.eval.registration import PointDSCRegistrar
    from gmf_tpu.models import PointDSC

    xyz0, xyz1, fs, ft, T = make_pair(rng, ns=150, nt=130)
    host_sample = build_correspondences(xyz0, xyz1, fs, ft, T, 0.10,
                                        use_mutual=True, in_dim=6)
    img = rng.rand(24, 32, 3).astype(np.float32)
    host_sample["p_image"] = img
    host_sample["q_image"] = img
    host_sample["gt_trans"] = T

    model = PointDSC(num_layers=1, num_channels=16, k=10)
    n0 = 64
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, n0, 6)), jnp.zeros((1, n0, 3)),
        jnp.zeros((1, n0, 3)), jnp.zeros((1, 24, 32, 3)),
        jnp.zeros((1, 24, 32, 3)))
    reg = PointDSCRegistrar(model, variables, buckets=(256, 512))

    t_host, l_host = reg(dict(host_sample))

    raw = {
        "src_keypts": xyz0, "tgt_keypts": xyz1,
        "src_desc": fs, "tgt_desc": ft,
        "gt_trans": T, "p_image": img, "q_image": img,
    }
    t_dev, l_dev = reg(raw)
    # raw path wrote compacted matched rows back into the sample
    np.testing.assert_allclose(raw["src_keypts"], host_sample["src_keypts"],
                               atol=1e-6)
    np.testing.assert_array_equal(raw["labels"], host_sample["labels"])
    np.testing.assert_array_equal(l_dev, l_host)
    np.testing.assert_allclose(t_dev, t_host, atol=1e-4)


def test_registrar_raw_batched_mesh(rng):
    """Raw batched path on the 8-device mesh == unsharded, rows intact."""
    import jax
    import jax.numpy as jnp

    from gmf_tpu.eval.registration import PointDSCRegistrar
    from gmf_tpu.models import PointDSC
    from gmf_tpu.parallel.mesh import make_mesh

    model = PointDSC(num_layers=1, num_channels=16, k=10)
    n0 = 64
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, n0, 6)), jnp.zeros((1, n0, 3)),
        jnp.zeros((1, n0, 3)), jnp.zeros((1, 24, 32, 3)),
        jnp.zeros((1, 24, 32, 3)))

    def raw_sample(seed):
        r = np.random.RandomState(seed)
        xyz0, xyz1, fs, ft, T = make_pair(r, ns=140 + seed, nt=120)
        img = r.rand(24, 32, 3).astype(np.float32)
        return {"src_keypts": xyz0, "tgt_keypts": xyz1, "src_desc": fs,
                "tgt_desc": ft, "gt_trans": T, "p_image": img,
                "q_image": img}

    samples = [raw_sample(s) for s in range(3)]

    reg = PointDSCRegistrar(model, variables, buckets=(256, 512))
    ref = reg.register_batch([dict(s) for s in samples])

    mesh = make_mesh(n_data=8)
    reg_dp = PointDSCRegistrar(model, variables, buckets=(256, 512),
                               mesh=mesh)
    got = reg_dp.register_batch([dict(s) for s in samples])

    for (t0, l0), (t1, l1) in zip(ref, got):
        np.testing.assert_array_equal(l0, l1)
        np.testing.assert_allclose(t0, t1, atol=1e-5)


def test_eval_cli_device_match(tmp_path, rng, monkeypatch):
    """The real CLI with --device-match registers the fixture pair."""
    import sys

    sys.path.insert(0, "scripts")
    from bench_eval_cli import SCENE, build_fixture, make_checkpoint

    from gmf_tpu.eval import test_3dmatch

    root = str(tmp_path)
    build_fixture(root, pairs=2, points=150, feat_dim=16,
                  inlier_ratio=0.5, image_hw=(120, 160))
    ckpt = str(tmp_path / "ckpt")
    make_checkpoint(ckpt, tiny=True)

    out_dir = str(tmp_path / "eval_out")
    monkeypatch.setattr(sys, "argv", [
        "test_3dmatch", "--root", root, "--checkpoint", ckpt,
        "--num-node", "all", "--scenes", SCENE, "--out", out_dir,
        "--batch", "2", "--device-match",
    ])
    test_3dmatch.main()
    stats = np.load(f"{out_dir}/all_stats.npy")
    assert stats.shape == (2, 12)
    assert stats[:, 0].all(), stats  # both register
    # designed 50% inlier ratio recovered by the device matcher
    np.testing.assert_allclose(stats[:, 4], 0.5, atol=0.05)
