"""WeightedProcrustesTrainer: DGR+GMF training loop.

Parity: GMF_DGR_fcgf/core/trainer.py:38-699 —
- frozen FCGF descriptor net + trainable GMF 6D inlier net (:162-164)
- per pair: FCGF fwd x2 -> 1-NN pairs -> hash-based correctness labels
  (generate_inlier_input :644-678) -> 6D sparse fwd with images
  (:217-229) -> non-inplace weight clip (:232-238) -> weighted
  Procrustes (:241-245) -> loss = procrustes_w * (rot_err +
  trans_w * trans_err)[ws > 10].mean() + inlier_w * BCE (:246-269)
- non-finite-loss skip (:259-262) and NaN-gradient zero-out (:292-300)
- SGD(momentum) + per-epoch ExpLR; gradient accumulation via iter_size.

TPU-first: pairs are processed as independent jitted pair-steps whose
gradients accumulate on device (the reference's iter_size semantics);
each pair's sparse pyramids are host-built with bucketed capacities.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gmf_tpu.configs.presets import DGRTrainConfig
from gmf_tpu.data.dgr_loader import find_correct_correspondence
from gmf_tpu.geometry.kabsch import kabsch_quat
from gmf_tpu.geometry.knn import nearest_neighbor
from gmf_tpu.models.dgr import inlier_input_features
from gmf_tpu.sparse.kernel_map import build_pyramid
from gmf_tpu.sparse.resunet import pyramid_to_arrays
from gmf_tpu.sparse.voxelize import sparse_quantize
from gmf_tpu.train.losses import balanced_bce_loss


class WeightedProcrustesTrainer:
    def __init__(self, fcgf_model, fcgf_vars, inlier_model, inlier_vars,
                 config: Optional[DGRTrainConfig] = None,
                 voxel_cap_granule: int = 512, corr_cap_granule: int = 512,
                 steps_per_epoch: int = 100, descriptor: str = "fcgf",
                 device_maps: Optional[bool] = None):
        """descriptor='fpfh' swaps the frozen FCGF extraction for JAX FPFH
        (the fpfh-variant deltas, GMF_DGR_fpfh core/trainer.py:659-697).
        device_maps: build kernel maps on device (sparse/device_maps.py);
        None = auto (on for non-CPU backends)."""
        self.cfg = config or DGRTrainConfig()
        self.descriptor = descriptor
        self.device_maps = (jax.default_backend() != "cpu"
                            if device_maps is None else device_maps)
        self.fcgf = fcgf_model
        self.fcgf_vars = fcgf_vars          # frozen (ref :163)
        self.inlier = inlier_model
        self.inlier_params = inlier_vars["params"]
        self.inlier_bstats = inlier_vars.get("batch_stats", {})
        self.voxel_cap_granule = voxel_cap_granule
        self.corr_cap_granule = corr_cap_granule

        schedule = optax.exponential_decay(
            self.cfg.lr, max(steps_per_epoch, 1), self.cfg.exp_gamma,
            staircase=True)
        if self.cfg.optimizer == "SGD":
            self.optimizer = optax.chain(
                optax.add_decayed_weights(self.cfg.weight_decay),
                optax.sgd(schedule, momentum=self.cfg.momentum))
        else:
            self.optimizer = optax.chain(
                optax.add_decayed_weights(self.cfg.weight_decay),
                optax.adam(schedule))
        self.opt_state = self.optimizer.init(self.inlier_params)

        self._fcgf_apply = jax.jit(lambda v, f, p: self.fcgf.apply(v, f, p))
        self._pair_grads = jax.jit(self._pair_grads_fn)

    # ------------------------------------------------------------------

    def _pyramid_arrays(self, coords: np.ndarray, conv1_kernel_size: int,
                        granule: int):
        """Kernel-map pyramid as the jittable dict (host or device builder
        per self.device_maps; identical outputs)."""
        if self.device_maps:
            from gmf_tpu.sparse.device_maps import build_pyramid_arrays_device

            return build_pyramid_arrays_device(
                coords, 4, conv1_kernel_size=conv1_kernel_size,
                granule=granule)
        pyr = build_pyramid(coords, 4, conv1_kernel_size=conv1_kernel_size,
                            granule=granule)
        return pyramid_to_arrays(pyr)

    def generate_inlier_input(self, pair: Dict[str, np.ndarray]):
        """Descriptor features, 1-NN pairs and correctness labels
        (ref :644-678; fpfh variant :659-697).

        Returns (pred_pairs [N,2], is_correct [N], F0, F1) — the
        descriptors feed 'feats'-mode inlier input generation
        (ref :622-644)."""
        feats = []
        for key_c, key_p in (("coords0", "pcd0"), ("coords1", "pcd1")):
            if self.descriptor == "fpfh":
                from gmf_tpu.ops.fpfh import compute_fpfh

                vs = self.cfg.voxel_size
                out = compute_fpfh(
                    jnp.asarray(pair[key_p]), normal_radius=2 * vs,
                    feature_radius=5 * vs)
                feats.append(np.asarray(out))
                continue
            coords = pair[key_c]
            arrays = self._pyramid_arrays(
                coords, self.cfg.feat_conv1_kernel_size,
                self.voxel_cap_granule)
            f = jnp.ones((arrays["mask_0"].shape[0], 1), jnp.float32)
            out = self._fcgf_apply(self.fcgf_vars, f, arrays)
            feats.append(np.asarray(out)[: len(coords)])
        F0, F1 = feats
        nn01, _ = nearest_neighbor(jnp.asarray(F0), jnp.asarray(F1),
                                   chunk=1024)
        nn01 = np.asarray(nn01)
        pred_pairs = np.stack([np.arange(len(F0)), nn01], axis=1)
        hash_seed = max(len(F0), len(F1))
        is_correct = find_correct_correspondence(
            pair["correspondences"], pred_pairs, hash_seed)
        return pred_pairs, is_correct.astype(np.float32), F0, F1

    def _uniq_feats(self, pair, pred_pairs, F0, F1, first_idx, cap):
        """[cap, C] inlier-net input on unique 6-D voxels (first
        occurrence; zero pad rows)."""
        if self.cfg.inlier_feature_type == "ones":
            return jnp.ones((cap, 1), jnp.float32)
        corr_feats = inlier_input_features(
            self.cfg.inlier_feature_type, pair["pcd0"], pair["pcd1"],
            F0, F1, pred_pairs[:, 0], pred_pairs[:, 1])
        c = corr_feats.shape[1]
        uniq_feats = corr_feats[jnp.asarray(first_idx)]
        feats = jnp.zeros((cap, c), jnp.float32)
        return feats.at[: len(first_idx)].set(
            uniq_feats.astype(jnp.float32))

    def _pair_grads_fn(self, params, bstats, feats, pyramid, p_img, q_img,
                       src, tgt, corr_mask, is_correct, T_gt, inverse_map):
        """Loss + grads for ONE pair (static shapes from the host)."""
        cfg = self.cfg

        def loss_fn(p):
            logits_vox, mutated = self.inlier.apply(
                {"params": p, "batch_stats": bstats},
                feats, pyramid, p_image=p_img, q_image=q_img, train=True,
                mutable=["batch_stats"])
            logits = logits_vox[inverse_map, 0]  # voxel -> correspondence
            weights = jax.nn.sigmoid(logits) * corr_mask
            # non-inplace clip (ref :232-238)
            weights = jnp.where(weights > cfg.clip_weight_thresh, weights, 0.0)

            T_pred = kabsch_quat(src[None], tgt[None], weights[None])[0]
            ws = jnp.sum(weights)
            tr = jnp.einsum("ij,ij->", T_pred[:3, :3], T_gt[:3, :3])
            rot_err = jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1 + 1e-7,
                                          1 - 1e-7))
            trans_err = jnp.linalg.norm(T_pred[:3, 3] - T_gt[:3, 3])
            individual = rot_err + cfg.trans_weight * trans_err
            valid = (ws > 10).astype(jnp.float32)  # ref :252-254
            procrustes_loss = cfg.procrustes_loss_weight * individual * valid

            inlier_loss = cfg.inlier_weight * balanced_bce_loss(
                logits, is_correct, mask=corr_mask)
            loss = procrustes_loss + inlier_loss
            metrics = {
                "loss": loss, "rot_err_deg": jnp.degrees(rot_err),
                "trans_err": trans_err, "ws": ws, "valid": valid,
                "inlier_loss": inlier_loss,
                "success": ((trans_err < cfg.success_rte_thresh)
                            & (jnp.degrees(rot_err) < cfg.success_rre_thresh)
                            ).astype(jnp.float32),
            }
            return loss, (metrics, mutated["batch_stats"])

        grads, (metrics, new_bstats) = jax.grad(loss_fn, has_aux=True)(params)
        return grads, metrics, new_bstats

    def _prep_pair_raw(self, pair: Dict[str, np.ndarray]):
        """Granule-independent host prep: descriptors, 1-NN matching,
        labels and the 6-D quantization (the expensive phase)."""
        pred_pairs, is_correct, F0, F1 = self.generate_inlier_input(pair)
        corr6d = np.concatenate(
            [pair["coords0"][pred_pairs[:, 0]],
             pair["coords1"][pred_pairs[:, 1]]], axis=1)
        uniq, first, inverse = sparse_quantize(
            corr6d.astype(np.float64), 1.0, return_index=True,
            return_inverse=True)
        return dict(pair=pair, pred_pairs=pred_pairs,
                    is_correct=is_correct, F0=F0, F1=F1, uniq=uniq,
                    first=first, inverse=inverse)

    def _prep_pair_arrays(self, raw, granule: int):
        """Static-shaped tensors for ``_pair_grads_fn`` at the given
        bucket granule (shared by the serial and DP paths)."""
        pair, pred_pairs = raw["pair"], raw["pred_pairs"]
        arrays = self._pyramid_arrays(
            raw["uniq"], self.cfg.inlier_conv1_kernel_size, granule)
        cap = arrays["mask_0"].shape[0]
        feats = self._uniq_feats(pair, pred_pairs, raw["F0"], raw["F1"],
                                 raw["first"], cap)

        n = len(pred_pairs)
        cap_corr = -(-n // granule) * granule
        inv = np.full(cap_corr, cap - 1, np.int32)  # padded -> any voxel
        inv[:n] = raw["inverse"]
        mask = np.zeros(cap_corr, np.float32)
        mask[:n] = 1.0
        corr_ok = np.zeros(cap_corr, np.float32)
        corr_ok[:n] = raw["is_correct"]
        src = np.zeros((cap_corr, 3), np.float32)
        tgt = np.zeros((cap_corr, 3), np.float32)
        src[:n] = pair["pcd0"][pred_pairs[:, 0]]
        tgt[:n] = pair["pcd1"][pred_pairs[:, 1]]

        return dict(
            feats=feats, pyramid=arrays,
            p_img=jnp.asarray(pair["p_image"])[None],
            q_img=jnp.asarray(pair["q_image"])[None],
            src=jnp.asarray(src), tgt=jnp.asarray(tgt),
            mask=jnp.asarray(mask), corr_ok=jnp.asarray(corr_ok),
            T_gt=jnp.asarray(pair["T_gt"]), inv=jnp.asarray(inv))

    def _prep_pair(self, pair: Dict[str, np.ndarray]):
        """Host prep for one pair at the trainer's default granule."""
        return self._prep_pair_arrays(self._prep_pair_raw(pair),
                                      self.corr_cap_granule)

    def train_pair(self, pair: Dict[str, np.ndarray]):
        """Host prep + jitted grads for one pair."""
        p = self._prep_pair(pair)
        grads, metrics, new_bstats = self._pair_grads(
            self.inlier_params, self.inlier_bstats, p["feats"],
            p["pyramid"], p["p_img"], p["q_img"], p["src"], p["tgt"],
            p["mask"], p["corr_ok"], p["T_gt"], p["inv"])
        self.inlier_bstats = new_bstats
        return grads, {k: float(v) for k, v in metrics.items()}

    def train_step(self, pairs: Iterable[Dict[str, np.ndarray]]):
        """Accumulate gradients over a batch of pairs, then one update.

        Reproduces the reference's non-finite-loss skip and NaN-grad
        zero-out (:259-262, :292-300).
        """
        acc = None
        count = 0
        agg: Dict[str, float] = {}
        for pair in pairs:
            grads, metrics = self.train_pair(pair)
            if not np.isfinite(metrics["loss"]):
                continue  # ref :259-262
            acc = grads if acc is None else jax.tree.map(
                jnp.add, acc, grads)
            count += 1
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + v
        if count == 0:
            return {"skipped": 1.0}
        acc = jax.tree.map(lambda g: g / count, acc)

        finite = all(bool(jnp.all(jnp.isfinite(g)))
                     for g in jax.tree.leaves(acc))
        if finite:
            updates, self.opt_state = self.optimizer.update(
                acc, self.opt_state, self.inlier_params)
            self.inlier_params = optax.apply_updates(
                self.inlier_params, updates)
        out = {k: v / count for k, v in agg.items()}
        out["skipped"] = 0.0 if finite else 1.0
        return out

    # -- data-parallel step (SURVEY §2.6 DP, DGR side) -------------------

    def _make_dp_step(self, mesh):
        """Jitted SPMD step: pair batch sharded over mesh axis 'data',
        params/opt_state replicated, gradients reduced with an explicit
        ``jax.lax.psum`` inside ``shard_map``.

        shard_map (not bare in_shardings) is deliberate: each device
        runs the UNPARTITIONED per-pair graph on its local shard and
        only the scalar-weighted gradient sums cross the mesh. Leaving
        the partitioning to XLA's automatic SPMD propagation silently
        DROPS the cross-shard reduction of conv-kernel gradients on the
        virtual CPU backend (r4 minimal repro: vmap(grad(conv)) summed
        over a batch-sharded dim returns one shard's partial, ~10-30x
        too small, while the loss stays exact); the explicit-collective
        form is bitwise equal to the single-device step and is also the
        shape a production multi-chip DP step should take — collectives
        ride ICI, everything else stays local."""
        from jax.sharding import PartitionSpec as P

        def step(params, bstats, opt_state, batch, wvec):
            def one(p, w):
                grads, metrics, new_bstats = self._pair_grads_fn(
                    params, bstats, p["feats"], p["pyramid"], p["p_img"],
                    p["q_img"], p["src"], p["tgt"], p["mask"],
                    p["corr_ok"], p["T_gt"], p["inv"])
                # non-finite-loss skip, in-graph (ref :259-262). A
                # skipped pair's contribution must be an exact zero, not
                # NaN*0=NaN: one divergent pair would otherwise poison
                # the psum and drop the whole group's update (the serial
                # loop drops only that pair). NaNs from pairs with a
                # FINITE loss still flow through, preserving the serial
                # whole-update NaN-grad skip below.
                wi = w * jnp.isfinite(metrics["loss"]).astype(jnp.float32)
                zmul = lambda x: jnp.where(wi > 0, x * wi, 0.0)  # noqa
                return (jax.tree.map(zmul, grads),
                        jax.tree.map(zmul, metrics),
                        jax.tree.map(zmul, new_bstats), wi)

            grads_k, metrics_k, bstats_k, w_k = jax.vmap(one)(batch, wvec)
            psum = lambda x: jax.lax.psum(jnp.sum(x, 0), "data")  # noqa
            total = jnp.maximum(psum(w_k), 1e-9)
            grads = jax.tree.map(lambda g: psum(g) / total, grads_k)
            metrics = jax.tree.map(lambda m: psum(m) / total, metrics_k)
            new_bstats = jax.tree.map(lambda b: psum(b) / total, bstats_k)

            # NaN-grad zero-out: skip the update if any grad is
            # non-finite (ref :292-300)
            finite = jnp.all(jnp.asarray([
                jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)
            ]))
            updates, new_opt = self.optimizer.update(grads, opt_state,
                                                     params)
            new_params = optax.apply_updates(params, updates)
            keep = finite & (total > 1e-8)
            new_params = jax.tree.map(lambda a, b: jnp.where(keep, a, b),
                                      new_params, params)
            new_opt = jax.tree.map(lambda a, b: jnp.where(keep, a, b),
                                   new_opt, opt_state)
            # commit batch stats only when they are themselves finite —
            # a kept pair with divergent activations must not corrupt
            # inlier_bstats permanently
            bstats_ok = jnp.all(jnp.asarray([
                jnp.all(jnp.isfinite(b))
                for b in jax.tree.leaves(new_bstats)
            ]))
            new_bstats = jax.tree.map(lambda a, b: jnp.where(
                (total > 1e-8) & bstats_ok, a, b), new_bstats, bstats)
            metrics = dict(metrics, skipped=1.0 - keep.astype(jnp.float32))
            return new_params, new_opt, new_bstats, metrics

        sharded = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P("data")),
            out_specs=(P(), P(), P(), P()),
            check_vma=False)
        return jax.jit(sharded)

    def train_step_dp(self, pairs, mesh):
        """One DP update: the pair group sharded over the mesh's 'data'
        axis — the TPU-native form of the reference's iter_size gradient
        accumulation (core/trainer.py:159-358), with the per-pair serial
        loop replaced by an SPMD batch and XLA collectives.

        Semantics vs :meth:`train_step`: every pair's forward uses the
        STEP-INITIAL batch stats (the serial loop threads them pair to
        pair); the applied gradient is the same finite-masked mean.
        Pairs must share bucket shapes (same granule caps); the group is
        right-padded to a multiple of the mesh size by repeating the
        last pair with weight 0.
        """
        # one common bucket for the whole group: every per-pair tensor is
        # built (and masked) at the max bucket any pair needs, so the
        # stacked batch is shard-able with static shapes
        raws = [self._prep_pair_raw(p) for p in pairs]
        g = self.corr_cap_granule
        cap = g
        for r in raws:
            cap = max(cap, -(-len(r["uniq"]) // g) * g,
                      -(-len(r["pred_pairs"]) // g) * g)
        preps = [self._prep_pair_arrays(r, cap) for r in raws]
        # unify the pruned-offset dimension across the group: pad each
        # kernel map's kept-offset rows to the group max with the
        # builder's own sentinel convention (all-sentinel neighbor row =
        # zero contribution, kept-id 0; kernel_map._pad_offsets)
        for key in [k for k in preps[0]["pyramid"] if "_map" in k]:
            kk = key.replace("_map", "_kept")
            K = max(p["pyramid"][key].shape[0] for p in preps)
            for p in preps:
                m = np.asarray(p["pyramid"][key])
                if m.shape[0] == K:
                    continue
                ks = np.asarray(p["pyramid"][kk])
                pad_rows = np.full((K - m.shape[0], m.shape[1]),
                                   m.shape[1], m.dtype)  # uniform caps:
                # sentinel index == input cap == column count
                p["pyramid"][key] = jnp.asarray(
                    np.concatenate([m, pad_rows], axis=0))
                p["pyramid"][kk] = jnp.asarray(np.concatenate(
                    [ks, np.zeros((K - ks.shape[0],), ks.dtype)], axis=0))
        n_dev = mesh.shape["data"]
        wts = [1.0] * len(preps)
        shapes = {k: jax.tree.map(jnp.shape, v)
                  for k, v in preps[0].items()}
        for p in preps[1:]:
            if {k: jax.tree.map(jnp.shape, v) for k, v in p.items()} \
                    != shapes:
                raise ValueError(
                    "train_step_dp needs bucket-identical preps; common-"
                    "bucket padding failed to unify shapes")
        while len(preps) % n_dev:
            preps.append(preps[-1])
            wts.append(0.0)
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *preps)
        wvec = jnp.asarray(wts, jnp.float32)

        key = (id(mesh), len(preps))
        if getattr(self, "_dp_step_cache", None) is None:
            self._dp_step_cache = {}
        if key not in self._dp_step_cache:
            self._dp_step_cache[key] = self._make_dp_step(mesh)
        step = self._dp_step_cache[key]

        (self.inlier_params, self.opt_state, self.inlier_bstats,
         metrics) = step(self.inlier_params, self.inlier_bstats,
                         self.opt_state, batch, wvec)
        return {k: float(v) for k, v in metrics.items()}

    def validate(self, pairs: Iterable[Dict[str, np.ndarray]]):
        """Validation pass: hit-ratio, P/R/F1, RTE/RRE, success rate.

        Parity: core/trainer.py _valid_epoch :360-503 (same metric set,
        computed with the current inlier net, no updates).
        """
        from gmf_tpu.models.dgr import se3_refine

        agg: Dict[str, float] = {}
        count = 0
        for pair in pairs:
            pred_pairs, is_correct, F0, F1 = self.generate_inlier_input(pair)
            # hit ratio: fraction of NN matches that are GT-correct
            hit_ratio = float(is_correct.mean()) if len(is_correct) else 0.0

            corr6d = np.concatenate(
                [pair["coords0"][pred_pairs[:, 0]],
                 pair["coords1"][pred_pairs[:, 1]]], axis=1)
            uniq, first, inverse = sparse_quantize(
                corr6d.astype(np.float64), 1.0, return_index=True,
                return_inverse=True)
            arrays = self._pyramid_arrays(
                uniq, self.cfg.inlier_conv1_kernel_size,
                self.corr_cap_granule)
            feats = self._uniq_feats(pair, pred_pairs, F0, F1, first,
                                     arrays["mask_0"].shape[0])
            logits_vox = self.inlier.apply(
                {"params": self.inlier_params,
                 "batch_stats": self.inlier_bstats},
                feats, arrays, p_image=jnp.asarray(pair["p_image"])[None],
                q_image=jnp.asarray(pair["q_image"])[None])
            logits = np.asarray(logits_vox)[inverse, 0]
            weights = 1.0 / (1.0 + np.exp(-logits))
            weights = np.where(weights < self.cfg.clip_weight_thresh, 0.0,
                               weights)

            src = pair["pcd0"][pred_pairs[:, 0]]
            tgt = pair["pcd1"][pred_pairs[:, 1]]
            T0 = np.asarray(kabsch_quat(
                jnp.asarray(src)[None], jnp.asarray(tgt)[None],
                jnp.asarray(weights)[None]))[0]
            T, _, _ = se3_refine(jnp.asarray(src), jnp.asarray(tgt),
                                 jnp.asarray(weights), jnp.asarray(T0),
                                 max_iter=200)
            T = np.asarray(T)
            T_gt = pair["T_gt"]
            tr = float(np.trace(T[:3, :3].T @ T_gt[:3, :3]))
            rre = float(np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1))))
            rte = float(np.linalg.norm(T[:3, 3] - T_gt[:3, 3]))

            pred = logits > 0
            tp = float((pred & (is_correct > 0)).sum())
            precision = tp / max(pred.sum(), 1)
            recall = tp / max((is_correct > 0).sum(), 1)
            f1 = 2 * precision * recall / max(precision + recall, 1e-9)
            stats = {
                "hit_ratio": hit_ratio, "precision": precision,
                "recall": recall, "f1": f1, "rte": rte, "rre": rre,
                "success": float((rte < self.cfg.success_rte_thresh)
                                 and (rre < self.cfg.success_rre_thresh)),
            }
            count += 1
            for k, v in stats.items():
                agg[k] = agg.get(k, 0.0) + v
        return {k: v / max(count, 1) for k, v in agg.items()}

    def inlier_variables(self):
        return {"params": self.inlier_params,
                "batch_stats": self.inlier_bstats}
