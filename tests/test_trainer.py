"""Trainer smoke tests: loss decreases, NaN guard, checkpoint round-trip."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gmf_tpu.data import SyntheticCorrespondenceLoader, min_clip_collate, pad_to_bucket
from gmf_tpu.models import PointDSC
from gmf_tpu.train.trainer import TrainConfig, Trainer, make_train_step, make_optimizer
from gmf_tpu.parallel.mesh import make_mesh


def tiny_model():
    return PointDSC(num_layers=1, num_channels=16, ratio=0.1,
                    inlier_threshold=0.10, sigma_d=0.10, k=10,
                    nms_radius=0.10)


@pytest.fixture(scope="module")
def loaders():
    train = SyntheticCorrespondenceLoader(
        batch_size=8, num_corr=64, steps_per_epoch=2, image_hw=(16, 16),
        seed=0)
    val = SyntheticCorrespondenceLoader(
        batch_size=8, num_corr=64, steps_per_epoch=1, image_hw=(16, 16),
        seed=1)
    return train, val


class TestTrainer:
    def test_train_runs_and_improves(self, loaders, tmp_path):
        train, val = loaders
        cfg = TrainConfig(max_epoch=2, batch_size=8, lr=3e-4,
                          save_dir=str(tmp_path / "snap"))
        trainer = Trainer(tiny_model(), cfg, train, val,
                          steps_per_epoch=len(train))
        history = trainer.train(snapshot=True)
        evals = [h for h in history if h[0] == "eval"]
        trains = [h for h in history if h[0] == "train"]
        assert len(evals) == 3 and len(trains) == 2
        for _, _, m in trains:
            assert np.isfinite(m["loss"]), m
            assert m["skipped_step"] == 0.0
        # class loss should drop from epoch 1 to 2 on this easy problem
        assert trains[1][2]["class_loss"] <= trains[0][2]["class_loss"] * 1.5
        # snapshots written
        assert os.path.isdir(os.path.join(cfg.save_dir, "model_best"))

    def test_checkpoint_roundtrip(self, loaders, tmp_path):
        train, val = loaders
        cfg = TrainConfig(max_epoch=1, save_dir=str(tmp_path / "s2"))
        trainer = Trainer(tiny_model(), cfg, train, val,
                          steps_per_epoch=len(train))
        path = str(tmp_path / "ckpt")
        trainer.save(path)
        before = jax.tree.map(np.asarray, trainer.params)
        trainer.load(path)
        after = jax.tree.map(np.asarray, trainer.params)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, b), before, after
        )

    def test_orbax_checkpoint_roundtrip(self, tmp_path, rng):
        """Orbax-backed save restores the identical pytree + config via
        the same auto-detecting load_checkpoint (SURVEY §5: production-
        scale checkpointing with the embedded-config contract)."""
        from gmf_tpu.utils.checkpoint import (
            load_checkpoint, save_checkpoint_orbax,
        )

        state = {
            "params": {"w": rng.randn(4, 3).astype(np.float32),
                       "b": rng.randn(3).astype(np.float32)},
            "step": np.asarray(7),
        }
        cfg = {"model": {"num_layers": 2}, "lr": 1e-3}
        path = str(tmp_path / "orbax_ckpt")
        save_checkpoint_orbax(path, state, config=cfg)
        restored, cfg2 = load_checkpoint(path)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                     state, restored)
        assert cfg2 == {"model": {"num_layers": 2}, "lr": 1e-3}

    def test_nan_guard_skips_step(self, loaders):
        """A batch with NaN inputs must leave the params untouched."""
        train, val = loaders
        cfg = TrainConfig()
        model = tiny_model()
        batch = next(iter(train))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        variables = model.init(
            jax.random.PRNGKey(0), batch["corr_pos"], batch["src_keypts"],
            batch["tgt_keypts"], batch["p_image"], batch["q_image"])
        opt = make_optimizer(cfg, 10)
        step = jax.jit(make_train_step(model, opt, cfg))
        opt_state = opt.init(variables["params"])

        bad = dict(batch)
        bad["corr_pos"] = batch["corr_pos"].at[0, 0, 0].set(jnp.nan)
        new_params, _, _, metrics = step(
            variables["params"], variables["batch_stats"], opt_state, bad,
            jnp.asarray(1))
        assert float(metrics["skipped_step"]) == 1.0
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            new_params, variables["params"])


class TestCollate:
    def test_min_clip(self, rng):
        samples = []
        for n in (50, 30, 40):
            samples.append({
                "corr_pos": rng.randn(n, 6).astype(np.float32),
                "src_keypts": rng.randn(n, 3).astype(np.float32),
                "tgt_keypts": rng.randn(n, 3).astype(np.float32),
                "labels": np.ones(n, np.float32),
                "gt_trans": np.eye(4, dtype=np.float32),
                "p_image": rng.rand(8, 8, 3).astype(np.float32),
                "q_image": rng.rand(8, 8, 3).astype(np.float32),
            })
        batch = min_clip_collate(samples, rng)
        assert batch["corr_pos"].shape == (3, 30, 6)
        assert batch["p_image"].shape == (3, 8, 8, 3)

    def test_pad_to_bucket(self, rng):
        s = {
            "corr_pos": rng.randn(300, 6).astype(np.float32),
            "src_keypts": rng.randn(300, 3).astype(np.float32),
            "tgt_keypts": rng.randn(300, 3).astype(np.float32),
            "labels": np.ones(300, np.float32),
        }
        out = pad_to_bucket(s)
        assert out["corr_pos"].shape == (1000, 6)
        assert out["corr_mask"].sum() == 300
        # oversize gets subsampled to the largest bucket
        s2 = {k: np.repeat(v, 50, axis=0) for k, v in s.items()}
        out2 = pad_to_bucket(s2)
        assert out2["corr_pos"].shape == (12000, 6)
        assert out2["corr_mask"].sum() == 12000
