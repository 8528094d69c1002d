"""Registration error metrics.

Parity targets:
- GMF_DGR core/metrics.py:25-43 (batch rotation / translation errors),
- GMF_PointDSC/libs/loss.py:18-63 (per-sample RE/TE and success recall),
- eval harness success thresholds (config_3DMatch.py:81-82 etc.).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def rotation_error_deg(R_pred, R_gt, eps: float = 1e-7):
    """Geodesic rotation error in degrees between [..., 3, 3] rotations.

    acos((trace(R_p^T R_g) - 1) / 2), clamped as in the reference
    (libs/loss.py:33-36 clamps the cos to [-1+eps, 1-eps]).
    """
    tr = jnp.einsum("...ij,...ij->...", R_pred, R_gt)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    return jnp.degrees(jnp.arccos(cos))


def translation_error(t_pred, t_gt):
    """L2 translation error between [..., 3(, 1)] translations."""
    d = jnp.squeeze(t_pred, -1) if t_pred.shape[-1] == 1 else t_pred
    g = jnp.squeeze(t_gt, -1) if t_gt.shape[-1] == 1 else t_gt
    return jnp.linalg.norm(d - g, axis=-1)


def registration_success(trans_pred, trans_gt, re_thresh_deg: float,
                         te_thresh: float):
    """Success = RE < re_thresh AND TE < te_thresh.

    3DMatch: (15 deg, 0.30 m); KITTI: (5 deg, 0.60 m) — BASELINE.md.
    Returns (success bool [...], re_deg [...], te [...]).
    """
    re = rotation_error_deg(trans_pred[..., :3, :3], trans_gt[..., :3, :3])
    te = translation_error(trans_pred[..., :3, 3], trans_gt[..., :3, 3])
    return (re < re_thresh_deg) & (te < te_thresh), re, te


def corr_dist(T, xyz0, xyz1, weight=None, max_dist: float | None = None):
    """Mean (weighted) distance between T(xyz0) and xyz1 paired rows.

    Parity: GMF_DGR core/metrics.py:53-59.
    """
    warped = jnp.matmul(xyz0, jnp.swapaxes(T[..., :3, :3], -1, -2), precision=_PREC) + T[..., None, :3, 3]
    d = jnp.linalg.norm(warped - xyz1, axis=-1)
    if max_dist is not None:
        d = jnp.minimum(d, max_dist)
    if weight is not None:
        return jnp.sum(d * weight, axis=-1) / (jnp.sum(weight, axis=-1) + 1e-6)
    return jnp.mean(d, axis=-1)


def precision_recall_f1(pred, gt, mask=None, eps: float = 1e-8):
    """Binary classification P/R/F1 over the last axis.

    Replaces the reference's sklearn host call (libs/loss.py:97-100) with an
    on-device computation so eval never syncs to host per-iteration.
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        pred, gt = pred * m, gt * m
    tp = jnp.sum(pred * gt, axis=-1)
    precision = tp / (jnp.sum(pred, axis=-1) + eps)
    recall = tp / (jnp.sum(gt, axis=-1) + eps)
    f1 = 2 * precision * recall / (precision + recall + eps)
    return precision, recall, f1
