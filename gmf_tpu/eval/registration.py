"""PointDSC registration engine for evaluation: bucketed jitted inference.

Wraps a PointDSC model + variables into a ``register(sample) -> (trans,
labels)`` callable for the eval harness. Samples are padded to static
bucket sizes (collate.BUCKETS) so XLA compiles once per bucket — the TPU
answer to the reference's per-pair dynamic shapes
(evaluation/test_3DMatch.py:24-119).

Batched + data-parallel path: ``register_batch`` stacks several pairs
into one [B, N, ...] dispatch, optionally sharded over the 'data' axis of
a jax.sharding.Mesh — each device registers B/n_data pairs and XLA
gathers the [B, 4, 4] transforms. This is the measured multi-chip
pairs/sec lever (SURVEY.md §2.6): the reference evaluates strictly one
pair per forward (evaluation/test_3DMatch.py:24-119), the TPU path
amortizes dispatch and scales over ICI with zero model changes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gmf_tpu.data.collate import BUCKETS, next_bucket, pad_to_bucket


class PointDSCRegistrar:
    """Jitted per-bucket PointDSC inference.

    Args:
      model, variables: the flax module + params/batch_stats.
      buckets: static correspondence-count buckets.
      mesh: optional ('data', 'model') Mesh. When given, batched calls
        shard the pair batch over the data axis (params replicated);
        single-pair calls stay unsharded.
    """

    def __init__(self, model, variables, buckets: Sequence[int] = BUCKETS,
                 mesh=None):
        self.model = model
        self.variables = variables
        self.buckets = buckets
        self.mesh = mesh

        def _register(variables, corr_pos, src, tgt, p_img, q_img, mask):
            out = model.apply(variables, corr_pos, src, tgt, p_img, q_img,
                              testing=True, corr_mask=mask)
            return out["final_trans"], out["final_labels"]

        self._register = jax.jit(_register)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            bat = NamedSharding(mesh, P("data"))
            self._n_data = mesh.shape["data"]
            # params replicated, every batch-leading array sharded on
            # 'data'; outputs gathered back sharded (host fetch assembles)
            self._register_sharded = jax.jit(
                _register,
                in_shardings=(repl, bat, bat, bat, bat, bat, bat),
                out_shardings=(bat, bat))
            self._variables_repl = jax.device_put(variables, repl)
        else:
            self._n_data = 1
            self._register_sharded = None
            self._variables_repl = None

    # -- single pair ---------------------------------------------------------

    def _pad_one(self, sample: Dict[str, np.ndarray], bucket: int = None):
        n = sample["corr_pos"].shape[0]
        buckets = list(self.buckets)
        if n > max(buckets):
            # never subsample at eval time — open a new bucket instead
            buckets.append(-(-n // 4096) * 4096)
        if bucket is not None:
            buckets = [bucket]
        return pad_to_bucket(
            {k: sample[k] for k in
             ("corr_pos", "src_keypts", "tgt_keypts", "labels")},
            buckets)

    def __call__(self, sample: Dict[str, np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
        n = sample["corr_pos"].shape[0]
        padded = self._pad_one(sample)
        trans, labels = self._register(
            self.variables,
            jnp.asarray(padded["corr_pos"])[None],
            jnp.asarray(padded["src_keypts"])[None],
            jnp.asarray(padded["tgt_keypts"])[None],
            jnp.asarray(sample["p_image"])[None],
            jnp.asarray(sample["q_image"])[None],
            jnp.asarray(padded["corr_mask"])[None],
        )
        m = min(n, padded["corr_pos"].shape[0])
        return np.asarray(trans)[0], np.asarray(labels)[0][:m]

    # -- batched / data-parallel ---------------------------------------------

    def eval_bucket(self, samples: Sequence[Dict[str, np.ndarray]]) -> int:
        """The shared bucket a group of samples would batch into."""
        n_max = max(s["corr_pos"].shape[0] for s in samples)
        buckets = list(self.buckets)
        if n_max > max(buckets):
            buckets.append(-(-n_max // 4096) * 4096)
        return next_bucket(n_max, buckets)

    def register_batch(self, samples: Sequence[Dict[str, np.ndarray]]
                       ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Register many pairs in ONE dispatch (mesh-sharded when built
        with a mesh).

        All samples are padded to one shared bucket; the batch dim is
        padded up to a multiple of the mesh's data-axis size with copies
        of sample 0 (each batch row is independent in eval mode, so dummy
        rows cannot change real rows). Returns per-sample (trans [4,4],
        labels [n_i]) in input order.
        """
        if not samples:
            return []
        bucket = self.eval_bucket(samples)
        padded = [self._pad_one(s, bucket=bucket) for s in samples]
        b_real = len(samples)
        b = -(-b_real // self._n_data) * self._n_data
        idx = list(range(b_real)) + [0] * (b - b_real)

        def stack(key, source):
            return jnp.asarray(np.stack([source[i][key] for i in idx]))

        args = (
            stack("corr_pos", padded), stack("src_keypts", padded),
            stack("tgt_keypts", padded),
            jnp.asarray(np.stack([samples[i]["p_image"] for i in idx])),
            jnp.asarray(np.stack([samples[i]["q_image"] for i in idx])),
            stack("corr_mask", padded),
        )
        if self._register_sharded is not None:
            trans, labels = self._register_sharded(self._variables_repl,
                                                   *args)
        else:
            trans, labels = self._register(self.variables, *args)
        trans, labels = jax.device_get((trans, labels))
        out = []
        for i, s in enumerate(samples):
            n = min(s["corr_pos"].shape[0], bucket)
            out.append((np.asarray(trans[i]), np.asarray(labels[i])[:n]))
        return out
