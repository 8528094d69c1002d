"""PointDSC+GMF trainer: data-parallel jitted steps, NaN guards, Orbax.

Parity targets (GMF_PointDSC/libs/trainer.py:10-282):
- loss = w_c * classification + w_sm * spectral-matching
  (+ w_t * transformation once epoch > transformation_loss_start_epoch)
- NaN-gradient guard: the optimizer step is SKIPPED whenever any gradient
  is non-finite (ref :158-166) — realized here as a jnp.where select so it
  stays inside the jitted step.
- Adam(lr=1e-4, weight_decay=1e-6) + per-epoch ExponentialLR(gamma=0.99)
  (config_3DMatch.py defaults).
- Per-epoch snapshots with recall-stamped names + best checkpoint
  (ref :57-61, 272-277).

TPU-first: one jitted train step over a ('data','model') mesh; batch
sharded on 'data', params replicated; XLA inserts the gradient psum.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from gmf_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from gmf_tpu.train.losses import (
    classification_loss,
    spectral_matching_loss,
    transformation_loss,
)


@dataclasses.dataclass
class TrainConfig:
    """Mirrors config_3DMatch.py's optimizer/loss groups."""

    lr: float = 1e-4
    weight_decay: float = 1e-6
    scheduler_gamma: float = 0.99
    max_epoch: int = 100
    batch_size: int = 16
    weight_classification: float = 1.0
    weight_spectralmatching: float = 1.0
    weight_transformation: float = 0.0
    transformation_loss_start_epoch: int = 0
    re_thresh: float = 15.0
    te_thresh: float = 30.0  # cm
    save_dir: str = "snapshot"


class TrainState:
    """Minimal mutable train-state holder (params live in a pytree)."""

    def __init__(self, params, batch_stats, opt_state, epoch=0):
        self.params = params
        self.batch_stats = batch_stats
        self.opt_state = opt_state
        self.epoch = epoch

    def tree(self):
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
        }


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """Adam + per-epoch exponential decay + decoupled weight decay."""
    schedule = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=max(steps_per_epoch, 1),
        decay_rate=cfg.scheduler_gamma,
        staircase=True,  # torch ExpLR steps once per epoch
    )
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.adam(schedule),
    )


def make_train_step(model, optimizer, cfg: TrainConfig) -> Callable:
    """Build the jitted train step.

    batch dict keys: corr_pos [B,N,6], src_keypts [B,N,3], tgt_keypts
    [B,N,3], gt_trans [B,4,4], labels [B,N], p_image/q_image [B,H,W,3],
    optional corr_mask [B,N].
    """

    def step(params, batch_stats, opt_state, batch, epoch):
        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["corr_pos"], batch["src_keypts"], batch["tgt_keypts"],
                batch["p_image"], batch["q_image"],
                testing=False, train=True,
                corr_mask=batch.get("corr_mask"),
                mutable=["batch_stats"],
            )
            cls = classification_loss(
                out["final_labels"], batch["labels"],
                mask=batch.get("corr_mask"),
            )
            sm = spectral_matching_loss(
                out["M"], batch["labels"], mask=batch.get("corr_mask")
            )
            tr = transformation_loss(
                out["final_trans"], batch["gt_trans"],
                batch["src_keypts"], batch["tgt_keypts"],
                out["final_labels"],
                re_thresh=cfg.re_thresh, te_thresh=cfg.te_thresh,
                mask=batch.get("corr_mask"),
            )
            w_t = jnp.where(
                epoch > cfg.transformation_loss_start_epoch,
                cfg.weight_transformation, 0.0,
            )
            loss = (
                cfg.weight_classification * cls["loss"]
                + cfg.weight_spectralmatching * sm
                + w_t * tr["loss"]
            )
            metrics = {
                "loss": loss,
                "class_loss": cls["loss"],
                "sm_loss": sm,
                "trans_loss": tr["loss"],
                "reg_recall": tr["recall_pct"],
                "re": tr["re_deg"],
                "te": tr["te_cm"],
                "precision": cls["precision"],
                "recall": cls["recall"],
                "f1": cls["f1"],
            }
            return loss, (metrics, mutated["batch_stats"])

        grads, (metrics, new_batch_stats) = jax.grad(
            loss_fn, has_aux=True
        )(params)

        # NaN-gradient guard (ref libs/trainer.py:158-166): skip the whole
        # optimizer step when any gradient is non-finite.
        grads_ok = jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(grads_ok, new, old), new_params, params
        )
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(grads_ok, new, old),
            new_opt_state, opt_state,
        )
        metrics["skipped_step"] = 1.0 - grads_ok.astype(jnp.float32)
        return new_params, new_batch_stats, new_opt_state, metrics

    return step


def make_eval_step(model, cfg: TrainConfig) -> Callable:
    """Validation step: same losses, running BN stats, no update."""

    def step(params, batch_stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["corr_pos"], batch["src_keypts"], batch["tgt_keypts"],
            batch["p_image"], batch["q_image"],
            testing=False, train=False,
            corr_mask=batch.get("corr_mask"),
        )
        cls = classification_loss(
            out["final_labels"], batch["labels"], mask=batch.get("corr_mask")
        )
        sm = spectral_matching_loss(
            out["M"], batch["labels"], mask=batch.get("corr_mask")
        )
        tr = transformation_loss(
            out["final_trans"], batch["gt_trans"],
            batch["src_keypts"], batch["tgt_keypts"], out["final_labels"],
            re_thresh=cfg.re_thresh, te_thresh=cfg.te_thresh,
            mask=batch.get("corr_mask"),
        )
        return {
            "class_loss": cls["loss"],
            "sm_loss": sm,
            "trans_loss": tr["loss"],
            "reg_recall": tr["recall_pct"],
            "re": tr["re_deg"],
            "te": tr["te_cm"],
            "precision": cls["precision"],
            "recall": cls["recall"],
            "f1": cls["f1"],
        }

    return step


class Trainer:
    """Epoch-loop trainer with data-parallel execution and snapshots.

    Parity with GMF_PointDSC/libs/trainer.py: eval at epoch 0, per-epoch
    training + eval, best-recall snapshot, recall-stamped epoch snapshots.
    """

    def __init__(self, model, cfg: TrainConfig, train_loader, val_loader,
                 rng_seed: int = 0, mesh=None,
                 steps_per_epoch: Optional[int] = None,
                 tboard_dir: Optional[str] = None, prefetch: int = 0):
        from gmf_tpu.utils.logging_utils import MetricsLogger

        self.cfg = cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.prefetch = prefetch
        self.mesh = mesh if mesh is not None else make_mesh()
        if (self.mesh.shape.get("data", 1) > 1
                and getattr(model, "compat_cache_shards", 0) == 1):
            # keep the compat-cache "auto" gate per-chip-honest under DP
            # batch sharding (see PointDSC.compat_cache_shards)
            model = model.clone(
                compat_cache_shards=self.mesh.shape["data"])
        self.model = model
        self.logger = MetricsLogger(tboard_dir)

        sample = next(iter(train_loader))
        variables = model.init(
            jax.random.PRNGKey(rng_seed),
            jnp.asarray(sample["corr_pos"]),
            jnp.asarray(sample["src_keypts"]),
            jnp.asarray(sample["tgt_keypts"]),
            jnp.asarray(sample["p_image"]),
            jnp.asarray(sample["q_image"]),
        )
        spe = steps_per_epoch if steps_per_epoch is not None else getattr(
            train_loader, "steps_per_epoch", 100
        )
        self.optimizer = make_optimizer(cfg, spe)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.optimizer.init(params)

        self.params = replicate(params, self.mesh)
        self.batch_stats = replicate(batch_stats, self.mesh)
        self.opt_state = replicate(opt_state, self.mesh)

        self._train_step = jax.jit(
            make_train_step(model, self.optimizer, cfg), donate_argnums=(0, 1, 2)
        )
        self._eval_step = jax.jit(make_eval_step(model, cfg))
        self.history = []

    def _prep(self, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return shard_batch(batch, self.mesh)

    def _batches(self, loader):
        """Optionally prefetch host batch construction on a thread."""
        if self.prefetch > 0:
            from gmf_tpu.data.prefetch import prefetch_iter

            return prefetch_iter(loader, self.prefetch)
        return loader

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        sums, count = {}, 0
        for batch in self._batches(self.train_loader):
            batch = self._prep(batch)
            self.params, self.batch_stats, self.opt_state, metrics = (
                self._train_step(
                    self.params, self.batch_stats, self.opt_state, batch,
                    jnp.asarray(epoch),
                )
            )
            count += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        return {k: v / max(count, 1) for k, v in sums.items()}

    def evaluate(self) -> Dict[str, float]:
        sums, count = {}, 0
        for batch in self._batches(self.val_loader):
            batch = self._prep(batch)
            metrics = self._eval_step(self.params, self.batch_stats, batch)
            count += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        return {k: v / max(count, 1) for k, v in sums.items()}

    def train(self, snapshot: bool = True):
        best_recall = -1.0
        res = self.evaluate()
        self.history.append(("eval", 0, res))
        self.logger.log(res, 0, "Val")
        for epoch in range(self.cfg.max_epoch):
            train_res = self.train_epoch(epoch + 1)
            self.history.append(("train", epoch + 1, train_res))
            self.logger.log(train_res, epoch + 1, "Train")
            res = self.evaluate()
            self.history.append(("eval", epoch + 1, res))
            self.logger.log(res, epoch + 1, "Val")
            if snapshot:
                if res["reg_recall"] > best_recall:
                    best_recall = res["reg_recall"]
                    self.save(os.path.join(self.cfg.save_dir, "model_best"))
                self.save(os.path.join(
                    self.cfg.save_dir,
                    f"model_{epoch + 1}_recall_{res['reg_recall']:.2f}",
                ))
        return self.history

    def save(self, path: str):
        """Snapshot params+batch_stats+config (ref :272-277 + config.json).

        The embedded config carries the MODEL hyperparameters too, so
        evaluation can rebuild the network from the checkpoint alone (the
        reference's eval-reads-ckpt-config contract,
        deep_global_registration.py:111-116)."""
        from gmf_tpu.utils.checkpoint import save_checkpoint

        model_fields = {}
        for f in getattr(type(self.model), "__dataclass_fields__", {}):
            if f in ("parent", "name", "dtype"):
                continue
            v = getattr(self.model, f, None)
            if isinstance(v, (int, float, str, bool)):
                model_fields[f] = v
        config = dataclasses.asdict(self.cfg)
        config["model"] = model_fields
        save_checkpoint(path, {
            "params": self.params,
            "batch_stats": self.batch_stats,
        }, config=config)

    def load(self, path: str):
        from gmf_tpu.utils.checkpoint import load_checkpoint

        payload, _ = load_checkpoint(path)
        self.params = replicate(payload["params"], self.mesh)
        self.batch_stats = replicate(payload["batch_stats"], self.mesh)
