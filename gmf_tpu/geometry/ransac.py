"""Batched RANSAC on correspondences — Open3D-free, jit-compiled.

Replaces the reference's host-side Open3D calls (SURVEY.md §2.5):
- PointDSC eval RANSAC solver (evaluation/test_3DMatch.py:75-93,
  registration_ransac_based_on_correspondence, 5000 iters)
- DGR safeguard RANSAC (core/deep_global_registration.py:348-396,
  80k iters)

TPU design: all hypotheses are sampled and solved at once (minimal 3-point
Kabsch via Horn quaternions = batched matmuls on the MXU); scoring is
chunked over hypotheses so HBM never holds the full
[num_hypotheses, N] distance matrix. A final weighted refit on the best
hypothesis's inliers replaces Open3D's internal polish.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gmf_tpu.geometry.kabsch import kabsch_quat, rigid_transform_3d

_PREC = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("num_iters", "sample_size", "chunk"))
def ransac_registration(key, src, tgt, inlier_threshold: float,
                        num_iters: int = 5000, sample_size: int = 3,
                        chunk: int = 1024, mask=None):
    """RANSAC over given correspondences.

    Args:
      key: PRNG key.
      src, tgt: [N, 3] corresponding points.
      inlier_threshold: max L2 distance for an inlier.
      num_iters: number of hypotheses (static; rounded up to chunk).
      chunk: hypotheses scored per pass (memory bound = chunk x N).
      mask: optional [N] validity mask.

    Returns:
      (trans [4, 4], inlier_mask [N] bool, fitness scalar).
    """
    N = src.shape[0]
    n_chunks = -(-num_iters // chunk)
    total = n_chunks * chunk
    if mask is None:
        idx = jax.random.randint(key, (total, sample_size), 0, N)
    else:
        # Rejection-free remap onto valid indices: stable-sort valid rows
        # to the front, then draw uniformly from the first n_valid slots,
        # so padded/invalid rows never enter a hypothesis sample.
        mask_b = mask.astype(bool)
        order = jnp.argsort(~mask_b)  # valid original indices first
        n_val = jnp.maximum(jnp.sum(mask_b.astype(jnp.int32)), 1)
        u = jax.random.uniform(key, (total, sample_size))
        pos = jnp.minimum((u * n_val).astype(jnp.int32), n_val - 1)
        idx = order[pos]

    valid = jnp.ones((N,), src.dtype) if mask is None else mask.astype(src.dtype)
    n_valid = jnp.sum(valid)
    if mask is not None:
        # Zero padded rows so NaN/garbage padding cannot contaminate the
        # weighted refit (0-weight x NaN = NaN) or the scoring einsum.
        src = jnp.where(valid[:, None] > 0, src, 0.0)
        tgt = jnp.where(valid[:, None] > 0, tgt, 0.0)

    A = src[idx]  # [total, 3, 3]
    B = tgt[idx]
    hyps = kabsch_quat(A, B)  # [total, 4, 4]

    def score_chunk(hyp_chunk):
        R = hyp_chunk[:, :3, :3]
        t = hyp_chunk[:, :3, 3]
        warped = jnp.einsum("cij,nj->cni", R, src, precision=_PREC) + t[:, None, :]
        d = jnp.linalg.norm(warped - tgt[None], axis=-1)
        inl = (d < inlier_threshold).astype(src.dtype) * valid[None, :]
        return jnp.sum(inl, axis=-1)

    scores = jax.lax.map(
        score_chunk, hyps.reshape(n_chunks, chunk, 4, 4)
    ).reshape(-1)
    best = jnp.argmax(scores)
    T_best = hyps[best]

    # Final refit on the best hypothesis's inliers (Open3D's internal
    # refinement equivalent).
    warped = src @ T_best[:3, :3].T + T_best[:3, 3]
    d = jnp.linalg.norm(warped - tgt, axis=-1)
    inlier = (d < inlier_threshold) & (valid > 0)
    w = inlier.astype(src.dtype)
    T = jnp.where(
        jnp.sum(w) >= sample_size,
        rigid_transform_3d(src[None], tgt[None], w[None])[0],
        T_best,
    )
    fitness = jnp.sum(w) / (n_valid + 1e-6)
    return T, inlier, fitness
