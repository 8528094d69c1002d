"""SE(3) rigid-transform utilities.

Behavioral parity with the reference's ``GMF_PointDSC/utils/SE3.py`` (same
math, same [4,4] homogeneous convention) but written for JAX: every device
function is shape-polymorphic over a leading batch dim, jit-safe, and
differentiable. Random-augmentation sampling stays on the host (NumPy) since
it only runs inside data loaders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Geometry math is tiny (3x3 / 4x4 / Nx3 matmuls) but precision-critical:
# force full-f32 MXU passes instead of TPU's default bf16 matmul.
_PREC = jax.lax.Precision.HIGHEST


def transform(pts, trans):
    """Apply an SE(3) transform: ``R @ p + t``.

    Args:
      pts:   [..., N, 3] points (unbatched [N, 3] or batched [B, N, 3]).
      trans: [..., 4, 4] homogeneous transform matching the batch shape.

    Returns:
      Transformed points, same shape as ``pts``.

    Parity: GMF_PointDSC/utils/SE3.py:43-57 (both branches).
    """
    R = trans[..., :3, :3]
    t = trans[..., :3, 3]
    return jnp.matmul(pts, jnp.swapaxes(R, -1, -2), precision=_PREC) + t[..., None, :]


def integrate_trans(R, t):
    """Assemble [..., 4, 4] from rotation [..., 3, 3] and translation.

    ``t`` may be [..., 3], [..., 3, 1] or [..., 1, 3].

    Parity: GMF_PointDSC/utils/SE3.py:73-96.
    """
    t = jnp.reshape(t, R.shape[:-2] + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), R.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def decompose_trans(trans):
    """Split [..., 4, 4] into (R [..., 3, 3], t [..., 3, 1]).

    Parity: GMF_PointDSC/utils/SE3.py:59-71.
    """
    return trans[..., :3, :3], trans[..., :3, 3:4]


def concatenate(trans1, trans2):
    """Compose two SE(3) transforms (trans1 ∘ trans2).

    Parity: GMF_PointDSC/utils/SE3.py:98-112.
    """
    return jnp.matmul(trans1, trans2, precision=_PREC)


def inverse(trans):
    """Closed-form SE(3) inverse (R^T, -R^T t)."""
    R, t = decompose_trans(trans)
    Rt = jnp.swapaxes(R, -1, -2)
    return integrate_trans(Rt, -jnp.matmul(Rt, t, precision=_PREC))


# --------------------------------------------------------------------------
# Host-side augmentation sampling (used only in data loaders).
# --------------------------------------------------------------------------


def random_rotation_matrix(num_axis, augment_rotation, rng=None):
    """Sample a random rotation about 1 or 3 axes scaled by augment_rotation.

    Parity: GMF_PointDSC/utils/SE3.py:5-30 (NumPy, host-side).
    """
    assert num_axis in (0, 1, 3)
    rng = rng or np.random
    if num_axis == 0:
        return np.eye(3)
    angles = rng.rand(3) * 2 * np.pi * augment_rotation
    cx, sx = np.cos(angles[0]), np.sin(angles[0])
    cy, sy = np.cos(angles[1]), np.sin(angles[1])
    cz, sz = np.cos(angles[2]), np.sin(angles[2])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    if num_axis == 1:
        return [Rx, Ry, Rz][int(rng.randint(3))]
    return Rx @ Ry @ Rz


def random_translation(augment_translation, rng=None):
    """Sample a random [3, 1] translation in [0, augment_translation)^3.

    Parity: GMF_PointDSC/utils/SE3.py:32-41.
    """
    rng = rng or np.random
    return (rng.rand(3) * augment_translation).reshape(3, 1)
