"""k-nearest-neighbor search in feature space, MXU-formulated.

Parity targets:
- GMF_PointDSC/models/common.py:53-75 (``knn``: topk over inner-product
  distance, optional self-exclusion via k+1).
- GMF_DGR core/knn.py:23-74 (``find_knn_gpu``: chunked 1-NN over pdist) and
  core/metrics.py:62-69 (``pdist``).

Design: the pairwise-distance matrix is one big matmul (MXU) + rank-1
corrections; top-k via ``jax.lax.top_k``. For large N we chunk over query
rows with ``lax.map`` so HBM never holds the full N0 x N1 matrix — the TPU
analogue of the reference's ``nn_max_n`` row-chunking.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def pdist(A, B, dist_type: str = "SquareL2"):
    """Pairwise distances between rows of A [..., N, D] and B [..., M, D].

    Parity: GMF_DGR core/metrics.py:62-69 (SquareL2 / L2).
    """
    d2 = (
        jnp.sum(A * A, axis=-1)[..., :, None]
        - 2.0 * jnp.matmul(A, jnp.swapaxes(B, -1, -2), precision=_PREC)
        + jnp.sum(B * B, axis=-1)[..., None, :]
    )
    if dist_type == "SquareL2":
        return d2
    if dist_type == "L2":
        return jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-7)
    raise NotImplementedError(f"dist_type {dist_type!r}")


@partial(jax.jit, static_argnames=("k", "ignore_self", "normalized"))
def knn(x, k: int, ignore_self: bool = False, normalized: bool = True,
        mask=None):
    """Indices of the k nearest neighbors of each row of x within x.

    Args:
      x: [B, N, C] features.
      k: neighbors to return.
      ignore_self: drop each point's self-match (computes k+1, slices).
      normalized: if True, assumes rows are L2-normalized so
        d = 2 - 2<x_i, x_j> (the reference uses `2 - inner` with
        inner = 2 x x^T; same ordering).
      mask: optional [B, N] validity mask; invalid rows are never selected
        as neighbors (padded-batch support; absent in the reference).

    Returns:
      [B, N, k] int32 neighbor indices.

    Parity: GMF_PointDSC/models/common.py:53-75.
    """
    inner = 2.0 * jnp.matmul(x, jnp.swapaxes(x, -1, -2), precision=_PREC)
    if normalized:
        dist = 2.0 - inner
    else:
        xx = jnp.sum(x * x, axis=-1, keepdims=True)
        dist = xx - inner + jnp.swapaxes(xx, -1, -2)
    if mask is not None:
        dist = jnp.where(mask[..., None, :] > 0, dist, jnp.inf)
    kk = k + 1 if ignore_self else k
    _, idx = jax.lax.top_k(-dist, kk)  # smallest distances
    if ignore_self:
        idx = idx[..., 1:]
    return idx


@partial(jax.jit, static_argnames=("chunk",))
def nearest_neighbor(F0, F1, chunk: int = 2048):
    """1-NN match: for each row of F0 [N0, D], index of nearest row in F1.

    Row-chunked so peak memory is chunk x N1 — the TPU equivalent of the
    reference's ``find_knn_gpu`` memory bound (core/knn.py:50-64). N0 must
    be a multiple of ``chunk`` after padding by the caller (static shapes).

    Returns:
      (idx [N0] int32, dist2 [N0] f32) nearest index and squared distance.
    """
    n0 = F0.shape[0]
    pad = (-n0) % chunk
    F0p = jnp.pad(F0, ((0, pad), (0, 0)))
    F0c = F0p.reshape(-1, chunk, F0.shape[-1])
    b1 = jnp.sum(F1 * F1, axis=-1)

    def one_chunk(fc):
        d2 = jnp.sum(fc * fc, axis=-1)[:, None] - 2.0 * jnp.matmul(fc, F1.T, precision=_PREC) + b1[None, :]
        return jnp.argmin(d2, axis=-1).astype(jnp.int32), jnp.min(d2, axis=-1)

    idx, d2 = jax.lax.map(one_chunk, F0c)
    return idx.reshape(-1)[:n0], d2.reshape(-1)[:n0]


def mutual_nearest_mask(F0, F1, chunk: int = 2048):
    """Mutual 1-NN: mask over F0 rows whose NN in F1 points back at them.

    Mirrors the reference's optional mutual check when building putative
    correspondences (GMF_PointDSC/datasets/ThreeDMatch.py:163-177).
    """
    idx01, _ = nearest_neighbor(F0, F1, chunk=chunk)
    idx10, _ = nearest_neighbor(F1, F0, chunk=chunk)
    back = idx10[idx01]
    return back == jnp.arange(F0.shape[0], dtype=jnp.int32), idx01
