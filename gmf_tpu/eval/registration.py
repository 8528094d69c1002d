"""PointDSC registration engine for evaluation: bucketed jitted inference.

Wraps a PointDSC model + variables into a ``register(sample) -> (trans,
labels)`` callable for the eval harness. Samples are padded to static
bucket sizes (collate.BUCKETS) so XLA compiles once per bucket — the TPU
answer to the reference's per-pair dynamic shapes
(evaluation/test_3DMatch.py:24-119).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gmf_tpu.data.collate import BUCKETS, pad_to_bucket


class PointDSCRegistrar:
    def __init__(self, model, variables, buckets: Sequence[int] = BUCKETS):
        self.model = model
        self.variables = variables
        self.buckets = buckets

        @jax.jit
        def _register(variables, corr_pos, src, tgt, p_img, q_img, mask):
            out = model.apply(variables, corr_pos, src, tgt, p_img, q_img,
                              testing=True, corr_mask=mask)
            return out["final_trans"], out["final_labels"]

        self._register = _register

    def __call__(self, sample: Dict[str, np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
        n = sample["corr_pos"].shape[0]
        buckets = list(self.buckets)
        if n > max(buckets):
            # never subsample at eval time — open a new bucket instead
            buckets.append(-(-n // 4096) * 4096)
        padded = pad_to_bucket(
            {k: sample[k] for k in
             ("corr_pos", "src_keypts", "tgt_keypts", "labels")},
            buckets)
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
