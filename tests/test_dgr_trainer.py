"""WeightedProcrustesTrainer tests on synthetic DGR pairs."""

import numpy as np
import jax
import jax.numpy as jnp

from gmf_tpu.configs.presets import DGRTrainConfig
from gmf_tpu.data.dgr_loader import (
    make_dgr_pair, get_matching_indices, find_correct_correspondence,
)
from gmf_tpu.sparse.kernel_map import build_pyramid
from gmf_tpu.sparse.resunet import SparseResUNet2, pyramid_to_arrays
from gmf_tpu.train.dgr_trainer import WeightedProcrustesTrainer


def tiny_nets(rng_key=0, feat_type="ones"):
    from gmf_tpu.models.dgr import inlier_input_feature_dim

    in_ch = inlier_input_feature_dim(feat_type, fcgf_dim=8)
    fcgf = SparseResUNet2(in_channels=1, out_channels=8, dim=3,
                          conv1_kernel_size=3, normalize_feature=True,
                          channels=(4, 8, 16, 32), tr_channels=(8, 8, 8, 16))
    inlier = SparseResUNet2(in_channels=in_ch, out_channels=1, dim=6,
                            conv1_kernel_size=3, with_gmf_fusion=True,
                            image_dim=16, channels=(4, 8, 16, 32),
                            tr_channels=(8, 8, 8, 16))
    rng = np.random.RandomState(9)
    coords = np.unique(rng.randint(0, 12, (100, 3)).astype(np.int32), axis=0)
    pyr = build_pyramid(coords, 4, granule=256)
    fv = fcgf.init(jax.random.PRNGKey(rng_key),
                   jnp.ones((pyr.levels[0].cap, 1)), pyramid_to_arrays(pyr))
    coords6 = np.unique(rng.randint(0, 8, (80, 6)).astype(np.int32), axis=0)
    pyr6 = build_pyramid(coords6, 4, granule=256)
    img = jnp.zeros((1, 16, 16, 3))
    iv = inlier.init(jax.random.PRNGKey(rng_key + 1),
                     jnp.ones((pyr6.levels[0].cap, in_ch)),
                     pyramid_to_arrays(pyr6), p_image=img, q_image=img)
    return fcgf, fv, inlier, iv


class TestMatching:
    def test_get_matching_indices(self, rng):
        src = rng.rand(50, 3).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        tgt = src.copy()  # identical under identity
        m = get_matching_indices(src, tgt, T, 0.01)
        # every point matches itself at least
        assert len(m) >= 50
        self_pairs = m[m[:, 0] == m[:, 1]]
        assert len(self_pairs) == 50

    def test_find_correct_correspondence(self):
        pos = np.array([[0, 0], [1, 2], [3, 3]])
        pred = np.array([[0, 0], [1, 1], [3, 3]])
        ok = find_correct_correspondence(pos, pred, hash_seed=10)
        np.testing.assert_array_equal(ok, [True, False, True])


class TestDGRTrainer:
    def test_train_step_updates_and_metrics(self, rng):
        fcgf, fv, inlier, iv = tiny_nets()
        cfg = DGRTrainConfig(lr=1e-3, optimizer="SGD")
        trainer = WeightedProcrustesTrainer(
            fcgf, fv, inlier, iv, cfg,
            voxel_cap_granule=256, corr_cap_granule=256)
        pairs = [make_dgr_pair(rng, n_points=300, voxel_size=0.08,
                               image_hw=(16, 16)) for _ in range(2)]
        before = jax.tree.leaves(trainer.inlier_params)[0].copy()
        metrics = trainer.train_step(pairs)
        assert metrics["skipped"] == 0.0
        assert np.isfinite(metrics["loss"])
        after = jax.tree.leaves(trainer.inlier_params)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))
        # frozen FCGF untouched by construction (held in fcgf_vars)
        assert "rot_err_deg" in metrics and "success" in metrics

    def test_train_step_with_feats_and_coords_modes(self, rng):
        """inlier_feature_type reaches the trainer's net input
        (ref core/trainer.py:622-644)."""
        for ft in ("feats", "coords"):
            fcgf, fv, inlier, iv = tiny_nets(feat_type=ft)
            cfg = DGRTrainConfig(lr=1e-3, optimizer="SGD",
                                 inlier_feature_type=ft)
            trainer = WeightedProcrustesTrainer(
                fcgf, fv, inlier, iv, cfg,
                voxel_cap_granule=256, corr_cap_granule=256)
            pair = make_dgr_pair(rng, n_points=250, voxel_size=0.08,
                                 image_hw=(16, 16))
            metrics = trainer.train_step([pair])
            assert metrics["skipped"] == 0.0, ft
            assert np.isfinite(metrics["loss"]), ft
            val = trainer.validate([pair])
            assert np.isfinite(val["rte"]), ft

    def test_loss_decreases_over_steps(self, rng):
        fcgf, fv, inlier, iv = tiny_nets(2)
        cfg = DGRTrainConfig(lr=3e-3, optimizer="SGD")
        trainer = WeightedProcrustesTrainer(
            fcgf, fv, inlier, iv, cfg,
            voxel_cap_granule=256, corr_cap_granule=256)
        pair = make_dgr_pair(rng, n_points=300, voxel_size=0.08,
                             image_hw=(16, 16))
        losses = []
        for _ in range(4):
            m = trainer.train_step([pair])
            losses.append(m["inlier_loss"])
        assert losses[-1] < losses[0] * 1.2, losses


class TestDGRValidate:
    def test_validation_metrics(self, rng):
        fcgf, fv, inlier, iv = tiny_nets(7)
        cfg = DGRTrainConfig()
        trainer = WeightedProcrustesTrainer(
            fcgf, fv, inlier, iv, cfg,
            voxel_cap_granule=256, corr_cap_granule=256)
        pairs = [make_dgr_pair(rng, n_points=250, voxel_size=0.08,
                               image_hw=(16, 16))]
        m = trainer.validate(pairs)
        for key in ("hit_ratio", "precision", "recall", "f1", "rte", "rre",
                    "success"):
            assert key in m and np.isfinite(m[key]), (key, m)
        assert 0.0 <= m["hit_ratio"] <= 1.0
