"""Parallel non-maximum suppression for seed selection.

Parity: GMF_PointDSC/models/PointDSC.py:268-301 (``pick_seeds``): a point is
a local max if its score beats every higher-scoring point within radius R of
it; seeds are the top-``max_num`` local maxima by score. The reference's
"parallel NMS" is already a dense matrix formulation — it maps to the TPU
VPU directly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_num",))
def pick_seeds_nms(dists, scores, radius: float, max_num: int, mask=None):
    """Select up to ``max_num`` seed indices by score-NMS.

    Args:
      dists:  [B, N, N] pairwise source-keypoint distances.
      scores: [B, N] confidence per correspondence.
      radius: NMS suppression radius.
      max_num: number of seeds returned (static).
      mask:   optional [B, N] validity mask for padded batches; padded
              entries can never be seeds.

    Returns:
      [B, max_num] int32 seed indices, best first.
    """
    # score_relation[i, j] = True unless j is a strictly-higher-scoring
    # neighbor of i within the radius. i is a local max iff the row is all
    # True (min over j) — identical to the reference's boolean algebra.
    relation = (scores[..., :, None] >= scores[..., None, :]) | (dists >= radius)
    is_local_max = jnp.min(relation, axis=-1).astype(scores.dtype)
    ranked = scores * is_local_max
    if mask is not None:
        ranked = jnp.where(mask > 0, ranked, -jnp.inf)
    _, idx = jax.lax.top_k(ranked, max_num)
    return idx.astype(jnp.int32)
