"""Eval-time solver variants: SVD (model output), RANSAC post-filter, ICP.

Parity: GMF_PointDSC/evaluation/test_3DMatch.py:71-96 — the model's
predicted inliers can feed an Open3D RANSAC instead of the model's own
transform ('RANSAC' solver, 5000 iterations on the predicted-inlier
correspondence set), and an optional ICP polish
(evaluation/benchmark_utils.py:40-56). Both are JAX here.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from gmf_tpu.geometry.icp import icp_refine
from gmf_tpu.geometry.ransac import ransac_registration


def make_register_fn(registrar: Callable, solver: str = "SVD",
                     use_icp: bool = False, inlier_threshold: float = 0.10,
                     ransac_iters: int = 5000) -> Callable:
    """Wrap a model registrar with the solver/ICP eval options.

    When the registrar exposes ``register_batch`` (PointDSCRegistrar),
    the returned callable carries a ``register_batch(pairs)`` attribute
    that runs the model part as one batched (optionally mesh-sharded)
    dispatch and then applies the per-pair solver/ICP post-steps — the
    eval harness uses it to amortize dispatch across pairs.
    """

    def _post(pair: Dict[str, np.ndarray], trans, labels):
        if solver == "RANSAC":
            # RANSAC on the model's predicted-inlier correspondences
            # (ref :75-93). Keep padded shapes static via a weight mask.
            keep = labels > 0
            src = pair["src_keypts"][: len(labels)]
            tgt = pair["tgt_keypts"][: len(labels)]
            if keep.sum() >= 3:
                T, inl, _ = ransac_registration(
                    jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(tgt),
                    inlier_threshold=inlier_threshold,
                    num_iters=ransac_iters,
                    mask=jnp.asarray(keep.astype(np.float32)))
                trans = np.asarray(T)
                labels = np.asarray(inl).astype(np.float32)

        if use_icp:
            # the reference's icp_refine hard-codes a 0.10 correspondence
            # distance regardless of the dataset threshold and uses o3d's
            # default 30 iterations (benchmark_utils.py:52-54)
            trans = np.asarray(icp_refine(
                jnp.asarray(pair["src_keypts"]), jnp.asarray(pair["tgt_keypts"]),
                jnp.asarray(trans), max_corr_dist=0.10,
                num_iters=30))
        return trans, labels

    def register(pair: Dict[str, np.ndarray]):
        trans, labels = registrar(pair)
        return _post(pair, trans, labels)

    if hasattr(registrar, "register_batch"):
        def register_batch(pairs):
            results = registrar.register_batch(list(pairs))
            return [_post(p, t, l) for p, (t, l) in zip(pairs, results)]

        register.register_batch = register_batch
        register.eval_bucket = registrar.eval_bucket

    if hasattr(registrar, "dispatch_batch"):
        # forward the async split so the harness's inflight pipeline can
        # keep dispatches pending; solver/ICP post-steps run at fetch time
        def dispatch_batch(pairs):
            pairs = list(pairs)
            return (pairs, registrar.dispatch_batch(pairs))

        def fetch_batch(handle):
            pairs, h = handle
            results = registrar.fetch_batch(h)
            return [_post(p, t, l) for p, (t, l) in zip(pairs, results)]

        register.dispatch_batch = dispatch_batch
        register.fetch_batch = fetch_batch

    return register
