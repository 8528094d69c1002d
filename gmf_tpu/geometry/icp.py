"""Fixed-iteration point-to-point ICP, jit-compiled.

Replaces the reference's Open3D ICP polish
(evaluation/benchmark_utils.py:40-56 ``icp_refine``,
GMF_DGR core/deep_global_registration.py:398-406): point-to-point ICP from
an initial transform with a max correspondence distance.

TPU design: a ``lax.fori_loop`` with a static iteration count; the
nearest-neighbor step is the chunked matmul 1-NN from geometry.knn (no
KD-tree — dense distances ride the MXU and N here is ~10^3-10^4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gmf_tpu.geometry.kabsch import rigid_transform_3d

_PREC = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("num_iters",))
def icp_refine(src, tgt, init_trans, max_corr_dist: float = 0.10,
               num_iters: int = 20, src_mask=None, tgt_mask=None):
    """Point-to-point ICP refinement.

    Args:
      src: [N, 3] source points; tgt: [M, 3] target points.
      init_trans: [4, 4] initial transform.
      max_corr_dist: correspondence rejection radius.
      num_iters: fixed iteration count (Open3D default convergence is
        iteration-capped too).

    Returns:
      refined [4, 4] transform.
    """
    tgt_valid = (jnp.ones((tgt.shape[0],), src.dtype) if tgt_mask is None
                 else tgt_mask.astype(src.dtype))
    src_valid = (jnp.ones((src.shape[0],), src.dtype) if src_mask is None
                 else src_mask.astype(src.dtype))
    t2 = jnp.sum(tgt * tgt, axis=-1)

    def body(_, T):
        warped = jnp.matmul(src, T[:3, :3].T, precision=_PREC) + T[:3, 3]
        d2 = (
            jnp.sum(warped * warped, axis=-1)[:, None]
            - 2.0 * jnp.matmul(warped, tgt.T, precision=_PREC)
            + t2[None, :]
        )
        d2 = jnp.where(tgt_valid[None, :] > 0, d2, jnp.inf)
        nn = jnp.argmin(d2, axis=-1)
        nn_d2 = jnp.min(d2, axis=-1)
        w = ((nn_d2 < max_corr_dist ** 2).astype(src.dtype) * src_valid)
        matched_tgt = tgt[nn]
        # Weighted Kabsch on the matched set; falls back to identity update
        # when too few matches (degenerate guard).
        T_new = jnp.where(
            jnp.sum(w) >= 3.0,
            rigid_transform_3d(src[None], matched_tgt[None], w[None])[0],
            T,
        )
        return T_new

    return jax.lax.fori_loop(0, num_iters, body, init_trans)


def _so3_exp(w):
    """Rodrigues: [3] axis-angle -> [3, 3] rotation (jit-safe at w=0)."""
    th2 = jnp.sum(w * w)
    th = jnp.sqrt(th2 + 1e-24)
    K = jnp.array([[0.0, -w[2], w[1]],
                   [w[2], 0.0, -w[0]],
                   [-w[1], w[0], 0.0]], w.dtype)
    A = jnp.sinc(th / jnp.pi)                       # sin(th)/th
    B = jnp.where(th2 > 1e-12, (1.0 - jnp.cos(th)) / jnp.maximum(th2, 1e-24),
                  0.5)
    return jnp.eye(3, dtype=w.dtype) + A * K + B * (K @ K)


@partial(jax.jit, static_argnames=("num_iters",))
def icp_point_to_plane(src, tgt, tgt_normals, init_trans,
                       max_corr_dist: float = 0.10, num_iters: int = 20,
                       src_mask=None, tgt_mask=None):
    """Point-to-plane ICP: minimizes sum w ((R p + t - q) . n_q)^2.

    The right objective for smooth, independently-sampled surfaces
    (depth-frame odometry): point-to-point NN between two samplings of
    the same smooth surface carries a tangential bias that stalls or
    slides the estimate; projecting the residual on the target normal
    removes it (KinectFusion-style). Each iteration solves the standard
    small-angle 6x6 normal system J = [p x n ; n] and retracts with a
    Rodrigues exp, all inside one lax.fori_loop.
    """
    tgt_valid = (jnp.ones((tgt.shape[0],), src.dtype) if tgt_mask is None
                 else tgt_mask.astype(src.dtype))
    src_valid = (jnp.ones((src.shape[0],), src.dtype) if src_mask is None
                 else src_mask.astype(src.dtype))
    t2 = jnp.sum(tgt * tgt, axis=-1)

    def body(_, T):
        warped = jnp.matmul(src, T[:3, :3].T, precision=_PREC) + T[:3, 3]
        d2 = (
            jnp.sum(warped * warped, axis=-1)[:, None]
            - 2.0 * jnp.matmul(warped, tgt.T, precision=_PREC)
            + t2[None, :]
        )
        d2 = jnp.where(tgt_valid[None, :] > 0, d2, jnp.inf)
        nn = jnp.argmin(d2, axis=-1)
        nn_d2 = jnp.min(d2, axis=-1)
        w = ((nn_d2 < max_corr_dist ** 2).astype(src.dtype) * src_valid)
        q = tgt[nn]
        n = tgt_normals[nn]
        r = jnp.sum((warped - q) * n, axis=-1)          # [N]
        J = jnp.concatenate([jnp.cross(warped, n), n], axis=-1)  # [N, 6]
        H = jnp.matmul(J.T, J * w[:, None], precision=_PREC)
        b = -jnp.matmul((J * w[:, None]).T, r, precision=_PREC)
        # Levenberg damping keeps the solve sane on degenerate geometry
        H = H + 1e-6 * jnp.trace(H) / 6.0 * jnp.eye(6, dtype=src.dtype)
        xi = jnp.linalg.solve(H, b)
        R = _so3_exp(xi[:3])
        dT = jnp.eye(4, dtype=src.dtype)
        dT = dT.at[:3, :3].set(R).at[:3, 3].set(xi[3:])
        T_new = dT @ T
        ok = (jnp.sum(w) >= 6.0) & jnp.all(jnp.isfinite(T_new))
        return jnp.where(ok, T_new, T)

    return jax.lax.fori_loop(0, num_iters, body, init_trans)
