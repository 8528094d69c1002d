"""Contrastive FCGF descriptor training (hardest-contrastive loss).

The reference pipelines CONSUME pretrained FCGF weights — the DGR trees
load ResUNet checkpoints trained elsewhere with the FCGF
hardest-contrastive objective (GMF_DGR_fcgf/config_3DMatch.py --weights,
GMF_PointDSC/misc/cal_fcgf.py:17-92 `extract_features`), and the GMF
training story sits ON TOP of a descriptor that already puts
corresponding voxels close in feature space. This module supplies that
missing link TPU-first, so the framework can produce its own descriptor
weights end-to-end:

- static-shape positive sampling (``n_pos`` GT voxel pairs, mask-padded)
  so one XLA executable serves every pair;
- in-batch hardest negatives with a spatial exclusion radius (a
  candidate voxel within ``exclude_radius`` of the anchor's true partner
  is not a negative — adjacent voxels legitimately share features);
- the FCGF margins: positives pulled inside ``pos_margin`` (0.1),
  hardest negatives pushed past ``neg_margin`` (1.4) on unit-norm
  features, squared-hinge both sides;
- jitted loss+Adam update over the sparse ResUNet with batch-stats
  threading (MaskedBatchNorm in train mode).

Used by the r5 synthetic train->eval closure
(scripts/train_eval_synthetic_r5.py): training the tiny descriptor on
surface pairs lifts the 1-NN hit ratio into the band where the inlier
net's local-coherence signal is learnable.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def hardest_contrastive_loss(f0, f1, pos0, pos1, pos_mask, xyz1,
                             pos_margin: float = 0.1,
                             neg_margin: float = 1.4,
                             exclude_radius: float = 0.1):
    """FCGF hardest-contrastive loss on one direction's positive set.

    Args:
      f0, f1: [cap0, C], [cap1, C] voxel features (pad rows arbitrary).
      pos0, pos1: [P] int32 row indices of GT-corresponding voxels
        (pad entries may repeat row 0).
      pos_mask: [P] 1.0 for real positives.
      xyz1: [cap1, 3] metric voxel centers for the spatial exclusion.
      exclude_radius: candidates within this distance of the anchor's
        true partner are not negatives.

    Returns (loss, metrics dict). Both anchor directions are taken
    (f0[i] against f1-candidates and f1[j] against f0-candidates would
    need the caller to swap arguments; the trainer calls it twice).
    """
    a = f0[pos0]                       # [P, C] anchors
    b = f1[pos1]                       # [P, C] true partners
    d_pos = jnp.sqrt(jnp.sum((a - b) ** 2, -1) + 1e-12)

    # in-batch negative candidates: the OTHER positives' partners
    D = jnp.sqrt(jnp.maximum(
        jnp.sum(a ** 2, -1)[:, None] + jnp.sum(b ** 2, -1)[None, :]
        - 2.0 * (a @ b.T), 0.0) + 1e-12)           # [P, P]
    p1 = xyz1[pos1]                    # [P, 3] partner positions
    spat = jnp.sqrt(jnp.sum(
        (p1[:, None, :] - p1[None, :, :]) ** 2, -1) + 1e-12)
    valid = (pos_mask[None, :] > 0) & (spat > exclude_radius)
    D = jnp.where(valid, D, jnp.inf)
    d_neg = jnp.min(D, axis=1)         # hardest negative per anchor
    has_neg = jnp.isfinite(d_neg) & (pos_mask > 0)
    d_neg = jnp.where(has_neg, d_neg, neg_margin)

    w = pos_mask / jnp.maximum(jnp.sum(pos_mask), 1.0)
    wn = has_neg.astype(jnp.float32)
    wn = wn / jnp.maximum(jnp.sum(wn), 1.0)
    loss_pos = jnp.sum(w * jnp.maximum(d_pos - pos_margin, 0.0) ** 2)
    loss_neg = jnp.sum(wn * jnp.maximum(neg_margin - d_neg, 0.0) ** 2)
    loss = loss_pos + loss_neg
    metrics = {
        "d_pos": jnp.sum(w * d_pos),
        "d_neg": jnp.sum(wn * d_neg),
        "loss_pos": loss_pos,
        "loss_neg": loss_neg,
    }
    return loss, metrics


class ContrastiveDescriptorTrainer:
    """Hardest-contrastive training loop for the sparse FCGF ResUNet."""

    def __init__(self, fcgf, fcgf_vars, voxel_size: float = 0.05,
                 granule: int = 256, n_pos: int = 128, lr: float = 1e-2,
                 pos_margin: float = 0.1, neg_margin: float = 1.4,
                 exclude_radius_mult: float = 2.0,
                 device_maps: Optional[bool] = None):
        self.fcgf = fcgf
        self.params = fcgf_vars["params"]
        self.bstats = fcgf_vars.get("batch_stats", {})
        self.voxel_size = voxel_size
        self.granule = granule
        self.n_pos = n_pos
        self.pos_margin = pos_margin
        self.neg_margin = neg_margin
        self.exclude_radius = exclude_radius_mult * voxel_size
        self.device_maps = (jax.default_backend() != "cpu"
                            if device_maps is None else device_maps)
        self.optimizer = optax.adam(lr)
        self.opt_state = self.optimizer.init(self.params)
        self._step = jax.jit(self._step_fn)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.bstats}

    # -- host prep -----------------------------------------------------

    def _pyramid(self, coords: np.ndarray):
        if self.device_maps:
            from gmf_tpu.sparse.device_maps import (
                build_pyramid_arrays_device)

            return build_pyramid_arrays_device(coords, 4,
                                               conv1_kernel_size=3,
                                               granule=self.granule)
        from gmf_tpu.sparse.kernel_map import build_pyramid
        from gmf_tpu.sparse.resunet import pyramid_to_arrays

        return pyramid_to_arrays(
            build_pyramid(coords, 4, conv1_kernel_size=3,
                          granule=self.granule))

    def prep_pair(self, pair: Dict[str, np.ndarray], rng=None):
        """Pyramids + a static-size positive sample for one pair."""
        rng = rng or np.random
        pyr0 = self._pyramid(pair["coords0"])
        pyr1 = self._pyramid(pair["coords1"])
        cap0 = int(np.asarray(pyr0["mask_0"]).shape[0])
        cap1 = int(np.asarray(pyr1["mask_0"]).shape[0])
        xyz0 = np.zeros((cap0, 3), np.float32)
        xyz0[: len(pair["pcd0"])] = pair["pcd0"]
        xyz1 = np.zeros((cap1, 3), np.float32)
        xyz1[: len(pair["pcd1"])] = pair["pcd1"]

        matches = np.asarray(pair["correspondences"])
        P = self.n_pos
        pos0 = np.zeros(P, np.int32)
        pos1 = np.zeros(P, np.int32)
        mask = np.zeros(P, np.float32)
        n = min(len(matches), P)
        if n:
            sel = (rng.choice(len(matches), P, replace=False)
                   if len(matches) > P else np.arange(len(matches)))
            pos0[: len(sel)] = matches[sel, 0]
            pos1[: len(sel)] = matches[sel, 1]
            mask[: len(sel)] = 1.0
        return dict(pyr0=pyr0, pyr1=pyr1,
                    pos0=jnp.asarray(pos0), pos1=jnp.asarray(pos1),
                    mask=jnp.asarray(mask), xyz0=jnp.asarray(xyz0),
                    xyz1=jnp.asarray(xyz1))

    # -- jitted step ----------------------------------------------------

    def _step_fn(self, params, bstats, opt_state, pyr0, pyr1, pos0, pos1,
                 mask, xyz0, xyz1):
        def loss_fn(p):
            vs = {"params": p, "batch_stats": bstats}
            f0, m0 = self.fcgf.apply(
                vs, jnp.ones((pyr0["mask_0"].shape[0], 1)), pyr0,
                train=True, mutable=["batch_stats"])
            f1, m1 = self.fcgf.apply(
                {"params": p, "batch_stats": m0["batch_stats"]},
                jnp.ones((pyr1["mask_0"].shape[0], 1)), pyr1,
                train=True, mutable=["batch_stats"])
            loss, metrics = hardest_contrastive_loss(
                f0, f1, pos0, pos1, mask, xyz1,
                pos_margin=self.pos_margin, neg_margin=self.neg_margin,
                exclude_radius=self.exclude_radius)
            # reverse direction: anchors in cloud 1, partners (and the
            # spatial-exclusion positions) in cloud 0
            loss_r, _ = hardest_contrastive_loss(
                f1, f0, pos1, pos0, mask, xyz0,
                pos_margin=self.pos_margin, neg_margin=self.neg_margin,
                exclude_radius=self.exclude_radius)
            metrics = dict(metrics, loss=loss + loss_r)
            return loss + loss_r, (metrics, m1["batch_stats"])

        (_, (metrics, new_bstats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = self.optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bstats, new_opt, metrics

    def train_pair(self, pair: Dict[str, np.ndarray], rng=None):
        p = self.prep_pair(pair, rng)
        (self.params, self.bstats, self.opt_state, metrics) = self._step(
            self.params, self.bstats, self.opt_state, p["pyr0"], p["pyr1"],
            p["pos0"], p["pos1"], p["mask"], p["xyz0"], p["xyz1"])
        return {k: float(v) for k, v in metrics.items()}
