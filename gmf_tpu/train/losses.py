"""Loss functions for PointDSC+GMF and DGR+GMF training.

Parity targets:
- GMF_PointDSC/libs/loss.py:12-63   TransformationLoss
- GMF_PointDSC/libs/loss.py:66-112  ClassificationLoss (balanced BCE)
- GMF_PointDSC/libs/loss.py:115-139 SpectralMatchingLoss
- GMF_DGR core/loss.py:13-39        UnbalancedLoss / BalancedLoss
- GMF_DGR core/loss.py:42-61        HighDimSmoothL1Loss

All functions are pure, batched, jit-safe, and mask-aware. The reference
computed P/R/F1 via sklearn on the host per-iteration (libs/loss.py:97-100)
— here everything stays on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gmf_tpu.geometry.metrics import precision_recall_f1
from gmf_tpu.geometry.se3 import decompose_trans, transform


def transformation_loss(trans, gt_trans, src_keypts, tgt_keypts, probs,
                        re_thresh: float = 15.0, te_thresh: float = 30.0,
                        mask=None):
    """MSE of warped keypoints + registration metrics.

    Args:
      trans, gt_trans: [B, 4, 4]; src/tgt_keypts: [B, N, 3];
      probs: [B, N] predicted inlier probability (loss is zeroed for
        samples with no predicted inlier, ref :56-61).
      re_thresh (deg) / te_thresh (cm): success thresholds.

    Returns dict(loss, recall_pct, re_deg, te_cm, rmse) — scalars averaged
    over the batch (matches ref return tuple).

    Note: the reference's per-sample RMSE accidentally broadcasts against
    the whole batch of target keypoints (libs/loss.py:47); we compute the
    intended per-sample RMSE.
    """
    R, t = decompose_trans(trans)
    gt_R, gt_t = decompose_trans(gt_trans)

    tr = jnp.einsum("bij,bij->b", R, gt_R)  # trace(R^T gt_R)
    re = jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
    te = jnp.linalg.norm(t[..., 0] - gt_t[..., 0], axis=-1) * 100.0

    warped = transform(src_keypts, trans)
    sq = jnp.sum((warped - tgt_keypts) ** 2, axis=-1)  # [B, N]
    d = jnp.sqrt(sq + 1e-12)
    if mask is not None:
        denom = jnp.sum(mask, axis=-1) + 1e-6
        mse = jnp.sum(sq * mask, axis=-1) / denom
        rmse = jnp.sum(d * mask, axis=-1) / denom
        has_inlier = jnp.sum((probs > 0) * mask, axis=-1) > 0
    else:
        mse = jnp.mean(sq, axis=-1)
        rmse = jnp.mean(d, axis=-1)
        has_inlier = jnp.sum(probs > 0, axis=-1) > 0

    loss = jnp.where(has_inlier, mse, 0.0)
    success = (re < re_thresh) & (te < te_thresh)
    return {
        "loss": jnp.mean(loss),
        "recall_pct": jnp.mean(success.astype(jnp.float32)) * 100.0,
        "re_deg": jnp.mean(re),
        "te_cm": jnp.mean(te),
        "rmse": jnp.mean(rmse),
    }


def _bce_with_logits(logits, labels, pos_weight=None):
    """Numerically-stable BCE-with-logits, optional positive-class weight."""
    log_sig = -jax.nn.softplus(-logits)       # log sigmoid(x)
    log_one_minus = -jax.nn.softplus(logits)  # log (1 - sigmoid(x))
    pw = 1.0 if pos_weight is None else pos_weight
    return -(pw * labels * log_sig + (1.0 - labels) * log_one_minus)


def classification_loss(pred, gt, balanced: bool = True, weight=None,
                        mask=None):
    """(Balanced) BCE loss for inlier confidence + on-device P/R/F1.

    Parity: GMF_PointDSC/libs/loss.py:66-112. pos_weight = #neg/#pos with
    the reference's relu(x-1)+1 floor.

    Returns dict(loss, precision, recall, f1, logit_true, logit_false).
    """
    gt = gt.astype(pred.dtype)
    m = jnp.ones_like(gt) if mask is None else mask.astype(pred.dtype)
    num_pos = jax.nn.relu(jnp.sum(gt * m) - 1.0) + 1.0
    num_neg = jax.nn.relu(jnp.sum((1.0 - gt) * m) - 1.0) + 1.0

    if weight is not None:
        per = _bce_with_logits(pred, gt) * weight
        loss = jnp.sum(per * m) / jnp.sum(m)
    elif not balanced:
        loss = jnp.sum(_bce_with_logits(pred, gt) * m) / jnp.sum(m)
    else:
        per = _bce_with_logits(pred, gt, pos_weight=num_neg / num_pos)
        loss = jnp.sum(per * m) / jnp.sum(m)

    pred_labels = (pred > 0).astype(pred.dtype) * m
    precision, recall, f1 = precision_recall_f1(
        pred_labels.reshape(1, -1), (gt * m).reshape(1, -1)
    )
    logit_true = jnp.sum(pred * gt * m) / jnp.maximum(1.0, jnp.sum(gt * m))
    logit_false = jnp.sum(pred * (1 - gt) * m) / jnp.maximum(
        1.0, jnp.sum((1 - gt) * m)
    )
    return {
        "loss": loss,
        "precision": precision[0],
        "recall": recall[0],
        "f1": f1[0],
        "logit_true": logit_true,
        "logit_false": logit_false,
    }


def spectral_matching_loss(M, gt_labels, balanced: bool = True, mask=None):
    """MSE between the feature-similarity matrix and the GT inlier outer
    product, class-balanced.

    Parity: GMF_PointDSC/libs/loss.py:115-139 (gt_M = outer AND of labels,
    zero diagonal; balanced split averages positive/negative cells).
    """
    gt = gt_labels.astype(M.dtype)
    gt_M = gt[:, None, :] * gt[:, :, None]
    N = gt_M.shape[-1]
    eye = jnp.eye(N, dtype=M.dtype)
    gt_M = gt_M * (1.0 - eye)
    pair = (jnp.ones_like(gt_M) if mask is None
            else mask[:, None, :] * mask[:, :, None])
    gt_M = gt_M * pair
    if balanced:
        # NOTE: the reference's NEGATIVE term does not exclude the
        # diagonal (libs/loss.py:133-134): the model zeroes M's diagonal
        # so the numerator is unaffected, but the denominator counts the
        # N diagonal cells. Reproduced exactly (verified numerically in
        # tests/test_reference_parity_ops.py).
        pos = jnp.sum((M - 1.0) ** 2 * gt_M, axis=(-2, -1))
        npos = jax.nn.relu(jnp.sum(gt_M, axis=(-2, -1)) - 1.0) + 1.0
        neg_M = (1.0 - gt_M) * pair
        neg = jnp.sum(M ** 2 * neg_M, axis=(-2, -1))
        nneg = jax.nn.relu(jnp.sum(neg_M, axis=(-2, -1)) - 1.0) + 1.0
        return jnp.mean(0.5 * pos / npos + 0.5 * neg / nneg)
    # unbalanced: plain MSE over ALL cells (libs/loss.py:137 MSELoss)
    return jnp.sum(((M - gt_M) ** 2) * pair) / jnp.sum(pair)


# ---------------------------------------------------------------------------
# DGR losses (GMF_DGR core/loss.py)
# ---------------------------------------------------------------------------


def unbalanced_bce_loss(logits, labels, mask=None):
    """Plain mean BCE-with-logits. Parity: core/loss.py:13-20."""
    per = _bce_with_logits(logits, labels.astype(logits.dtype))
    if mask is not None:
        return jnp.sum(per * mask) / (jnp.sum(mask) + 1e-6)
    return jnp.mean(per)


def balanced_bce_loss(logits, labels, mask=None):
    """0.5 * mean(BCE | positives) + 0.5 * mean(BCE | negatives).

    Parity: core/loss.py:23-39.
    """
    labels = labels.astype(logits.dtype)
    m = jnp.ones_like(labels) if mask is None else mask.astype(logits.dtype)
    per = _bce_with_logits(logits, labels)
    pos_m = labels * m
    neg_m = (1.0 - labels) * m
    pos = jnp.sum(per * pos_m) / jnp.maximum(1.0, jnp.sum(pos_m))
    neg = jnp.sum(per * neg_m) / jnp.maximum(1.0, jnp.sum(neg_m))
    return 0.5 * pos + 0.5 * neg


def high_dim_smooth_l1_loss(pred, target, weights=None,
                            quantization_size: float = 1.0,
                            eps: float = 1.1920929e-07, mask=None):
    """Smooth-L1 on the FULL squared point distance (not per-coordinate).

    Exact parity with GMF_DGR core/loss.py:42-61: with
    sq = ||(X-Y)/q||^2, loss = 0.5*sq when sq < 1 else 0.5*sqrt(sq)-0.25;
    weighted mean uses sum(w) normalization.
    """
    sq = jnp.sum(((pred - target) / quantization_size) ** 2, axis=-1)
    half = 0.5 * (sq < 1.0).astype(pred.dtype)
    per = (0.5 - half) * (jnp.sqrt(sq + eps) - 0.5) + half * sq
    if weights is not None:
        w = weights if mask is None else weights * mask
        return jnp.sum(per * w) / (jnp.sum(weights) + 1e-12)
    if mask is not None:
        return jnp.sum(per * mask) / (jnp.sum(mask) + 1e-6)
    return jnp.mean(per)
