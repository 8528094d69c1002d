"""DGR data-parallel training step: mesh equality vs serial semantics.

VERDICT r3 item 2(b): the DGR side of SURVEY §2.6 DP. The
WeightedProcrustesTrainer's ``train_step_dp`` shards a pair group over
the 'data' axis of a jax.sharding.Mesh (params replicated, weighted
gradient mean = XLA psum over ICI) and must produce the same update as
the serial gradient accumulation computed with the same step-initial
batch stats, on the 8-virtual-device CPU mesh.

Tolerance note: bitwise serial-loop vs vmapped-batch gradient equality
does NOT hold for this model — the sparse convs' scatter-add sums are
cancellation-prone and the full loss additionally runs arccos at its
+-1 clip boundary (derivative ~2e3), so reassociation alone moves some
gradient leaves by O(1) while every per-pair LOSS agrees to 1e-6
(measured, r4). The sharding-equality tests therefore compare the SAME
vmapped step on a 1-device mesh vs the 8-device mesh — isolating
exactly what DP adds (batch sharding + the psum XLA inserts for the
cross-shard mean) — and the serial iter_size semantics are pinned at
the metrics level (per-pair loss mean).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(__file__))
from test_dgr_trainer import tiny_nets  # noqa: E402

from gmf_tpu.configs.presets import DGRTrainConfig
from gmf_tpu.data.dgr_loader import make_dgr_pair
from gmf_tpu.train.dgr_trainer import WeightedProcrustesTrainer


def _make_trainer(**cfg_kw):
    fcgf, fv, inlier, iv = tiny_nets()
    cfg = DGRTrainConfig(**cfg_kw)
    return WeightedProcrustesTrainer(
        fcgf, fv, inlier, iv, cfg, voxel_cap_granule=256,
        corr_cap_granule=256)


def _pairs(n, n_points=300):
    rng = np.random.RandomState(7)
    cfg = DGRTrainConfig()
    return [make_dgr_pair(rng, n_points=n_points,
                          voxel_size=cfg.voxel_size, image_hw=(16, 16))
            for _ in range(n)]


def _serial_expected(trainer, pairs):
    """Serial accumulation with step-initial batch stats (the DP
    semantics), through the trainer's own jitted pair-grads."""
    params0 = trainer.inlier_params
    bstats0 = trainer.inlier_bstats
    acc, losses = None, []
    for p in pairs:
        prep = trainer._prep_pair(p)
        grads, metrics, _ = trainer._pair_grads(
            params0, bstats0, prep["feats"], prep["pyramid"],
            prep["p_img"], prep["q_img"], prep["src"], prep["tgt"],
            prep["mask"], prep["corr_ok"], prep["T_gt"], prep["inv"])
        losses.append(float(metrics["loss"]))
        acc = grads if acc is None else jax.tree.map(jnp.add, acc, grads)
    acc = jax.tree.map(lambda g: g / len(pairs), acc)
    updates, _ = trainer.optimizer.update(acc, trainer.opt_state, params0)
    return optax.apply_updates(params0, updates), losses


def _assert_updates_close(params0, expected, actual, atol=2e-3):
    """Per-leaf comparison of the applied updates, relative to each
    leaf's own update scale."""
    for p0, e, d in zip(jax.tree.leaves(jax.tree.map(np.asarray, params0)),
                        jax.tree.leaves(jax.tree.map(np.asarray, expected)),
                        jax.tree.leaves(jax.tree.map(np.asarray, actual))):
        ue, ud = e - p0, d - p0
        scale = np.abs(ue).max() + 1e-8
        np.testing.assert_allclose(ud / scale, ue / scale, atol=atol)


def test_dp_step_sharded_equals_single_device():
    """The 8-device-sharded step must equal the SAME vmapped step on a
    1-device mesh (what sharding + the psum adds), and its loss must
    equal the serial per-pair loss mean (the iter_size contract)."""
    pairs = _pairs(8)

    t_one = _make_trainer(procrustes_loss_weight=0.0)
    params0 = t_one.inlier_params
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    m_one = t_one.train_step_dp(pairs, mesh1)
    assert m_one["skipped"] == 0.0

    t_dp = _make_trainer(procrustes_loss_weight=0.0)
    mesh8 = Mesh(np.array(jax.devices()[:8]), ("data",))
    metrics = t_dp.train_step_dp(pairs, mesh8)
    assert metrics["skipped"] == 0.0
    np.testing.assert_allclose(metrics["loss"], m_one["loss"], rtol=1e-5)
    _assert_updates_close(params0, t_one.inlier_params,
                          t_dp.inlier_params)

    # serial iter_size semantics at the metrics level
    t_ser = _make_trainer(procrustes_loss_weight=0.0)
    _, losses = _serial_expected(t_ser, pairs)
    np.testing.assert_allclose(metrics["loss"], np.mean(losses), rtol=1e-5)


@pytest.mark.slow
def test_dp_step_pads_partial_groups():
    """5 pairs on an 8-device mesh: the group is padded with zero-weight
    repeats; the update and metrics average over the REAL pairs only."""
    pairs = _pairs(5)

    t_dp = _make_trainer(procrustes_loss_weight=0.0)
    params_before = jax.tree.map(np.asarray, t_dp.inlier_params)
    mesh8 = Mesh(np.array(jax.devices()[:8]), ("data",))
    metrics = t_dp.train_step_dp(pairs, mesh8)
    assert metrics["skipped"] == 0.0

    moved = any(
        not np.allclose(a, b) for a, b in zip(
            jax.tree.leaves(params_before),
            jax.tree.leaves(jax.tree.map(np.asarray, t_dp.inlier_params))))
    assert moved

    # 1-device mesh reference over the same 5 pairs: zero-weight padding
    # must not change the result
    t_one = _make_trainer(procrustes_loss_weight=0.0)
    params0 = t_one.inlier_params
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    m_one = t_one.train_step_dp(pairs, mesh1)
    np.testing.assert_allclose(metrics["loss"], m_one["loss"], rtol=1e-5)
    _assert_updates_close(params0, t_one.inlier_params,
                          t_dp.inlier_params)

    t_ser = _make_trainer(procrustes_loss_weight=0.0)
    _, losses = _serial_expected(t_ser, pairs)
    np.testing.assert_allclose(metrics["loss"], np.mean(losses), rtol=1e-5)


def test_dp_step_nan_pair_is_skipped_not_poisoning():
    """ADVICE r4 (medium): a pair whose loss is non-finite must
    contribute an exact ZERO to the psum — not NaN*0=NaN, which would
    drop the whole group's update, NaN the reported metrics, and commit
    corrupted batch stats. The group mean must cover the finite pairs
    only (serial ref :259-262 semantics)."""
    pairs = _pairs(4)
    # full loss: a NaN T_gt drives the Procrustes rotation error — and
    # therefore this pair's loss and gradients — non-finite
    pairs[1]["T_gt"] = np.full((4, 4), np.nan, np.float32)

    t_dp = _make_trainer()
    params_before = jax.tree.map(np.asarray, t_dp.inlier_params)
    bstats_before = jax.tree.map(np.asarray, t_dp.inlier_bstats)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    metrics = t_dp.train_step_dp(pairs, mesh)

    assert metrics["skipped"] == 0.0
    assert np.isfinite(metrics["loss"])

    # group mean over the three FINITE pairs only
    t_ser = _make_trainer()
    _, losses = _serial_expected(t_ser, [pairs[0], pairs[2], pairs[3]])
    np.testing.assert_allclose(metrics["loss"], np.mean(losses),
                               rtol=1e-4)

    # the update applied (params moved) and everything stayed finite
    leaves_after = jax.tree.leaves(
        jax.tree.map(np.asarray, t_dp.inlier_params))
    assert any(not np.allclose(a, b) for a, b in
               zip(jax.tree.leaves(params_before), leaves_after))
    assert all(np.isfinite(l).all() for l in leaves_after)
    bstats_after = jax.tree.leaves(
        jax.tree.map(np.asarray, t_dp.inlier_bstats))
    assert all(np.isfinite(b).all() for b in bstats_after)
    # and the stats actually updated (three finite pairs contributed)
    assert any(not np.allclose(a, b) for a, b in
               zip(jax.tree.leaves(bstats_before), bstats_after))


@pytest.mark.slow
def test_dp_step_full_loss_metrics_match():
    """Full reference loss (Procrustes + BCE): the DP step's averaged
    metrics equal the serial per-pair metrics' mean (the gradients are
    chaotic here — module docstring — but the losses are not)."""
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    pairs = _pairs(8)

    t_ser = _make_trainer()
    _, losses = _serial_expected(t_ser, pairs)

    t_dp = _make_trainer()
    metrics = t_dp.train_step_dp(pairs, mesh)
    assert metrics["skipped"] == 0.0
    np.testing.assert_allclose(metrics["loss"], np.mean(losses), rtol=1e-4)
    # params moved and stayed finite
    assert all(np.isfinite(l).all() for l in
               jax.tree.leaves(jax.tree.map(np.asarray,
                                            t_dp.inlier_params)))
