"""Spectral matching: leading eigenvector of a compatibility matrix.

Parity target: GMF_PointDSC/models/PointDSC.py:429-454
(``cal_leading_eigenvector`` with method='power': 10 iterations, L2
normalization with +1e-6, early exit when the iterate stops moving by
``torch.allclose`` tolerances). We reproduce the early exit as a
``lax.while_loop`` — same fixed cap, same convergence test, but fully
on-device and jit-compatible.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def _safe_norm(v, axis=-1, keepdims=True, eps=1e-24):
    """L2 norm with a NaN-free gradient at v=0 (sqrt(sum+eps) instead of
    jnp.linalg.norm, whose derivative is NaN at the origin — the exact
    hazard the reference papers over with its NaN-step-skip guard,
    libs/trainer.py:158-166)."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims) + eps)


@partial(jax.jit, static_argnames=("num_iters",))
def leading_eigenvector(M, num_iters: int = 10, rtol: float = 1e-5,
                        atol: float = 1e-8):
    """Power iteration for the leading eigenvector of symmetric PSD M.

    Args:
      M: [..., N, N] nonnegative compatibility matrices.
      num_iters: max iterations (reference default 10).

    Returns:
      [..., N] leading eigenvector estimate (nonnegative for nonneg M).
    """
    v0 = jnp.ones(M.shape[:-1], dtype=M.dtype)

    def cond(carry):
        i, v, v_last = carry
        converged = jnp.all(jnp.abs(v - v_last) <= atol + rtol * jnp.abs(v_last))
        return jnp.logical_and(i < num_iters, jnp.logical_not(converged))

    def body(carry):
        i, v, _ = carry
        v_new = jnp.einsum("...ij,...j->...i", M, v, precision=_PREC)
        # Reference normalizes with torch.norm over the token dim (+1e-6).
        v_new = v_new / (_safe_norm(v_new) + 1e-6)
        return i + 1, v_new, v

    # First iteration always runs (the reference compares against the
    # pre-update iterate). Seed v_last with a large finite sentinel — an inf
    # sentinel would satisfy |v - v_last| <= rtol*|v_last| trivially.
    v_last = jnp.full_like(v0, -1e30)
    _, v, _ = jax.lax.while_loop(cond, body, (0, v0, v_last))
    return v


def leading_eigenvector_fixed(M, num_iters: int = 10):
    """Branch-free variant (fori_loop, no convergence test).

    Preferable inside larger jitted graphs where the while_loop's dynamic
    trip count would inhibit XLA scheduling; 10 matvecs on [*,K,K] blocks is
    cheaper than the bookkeeping at PointDSC's k=40 seed-block sizes.
    """
    v0 = jnp.ones(M.shape[:-1], dtype=M.dtype)

    def body(_, v):
        v = jnp.einsum("...ij,...j->...i", M, v, precision=_PREC)
        return v / (_safe_norm(v) + 1e-6)

    return jax.lax.fori_loop(0, num_iters, body, v0)
