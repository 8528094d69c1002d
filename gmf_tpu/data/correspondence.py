"""Putative-correspondence construction from descriptors (host-side).

The shared recipe of every reference loader (ThreeDMatch.py:163-217,
KITTI.py:95-140): 1-NN in descriptor space (optional mutual check), GT
labels by distance under the GT transform, and the ``in_dim``-dependent
``corr_pos`` encoding.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from gmf_tpu.geometry.se3 import transform as se3_transform


def build_correspondences(
    src_keypts: np.ndarray, tgt_keypts: np.ndarray,
    src_desc: np.ndarray, tgt_desc: np.ndarray,
    gt_trans: np.ndarray, inlier_threshold: float,
    use_mutual: bool = True, in_dim: int = 6,
) -> Optional[Dict[str, np.ndarray]]:
    """Returns dict(corr_pos, src_keypts, tgt_keypts, labels, src_desc,
    tgt_desc) or None when fewer than 10 matches survive (the reference
    resamples such pairs, ThreeDMatch.py:175-177)."""
    distance = np.sqrt(np.maximum(2 - 2 * (src_desc @ tgt_desc.T), 0) + 1e-6)
    source_idx = np.argmin(distance, axis=1)
    if use_mutual:
        target_idx = np.argmin(distance, axis=0)
        mutual = target_idx[source_idx] == np.arange(len(source_idx))
        corr = np.stack([np.where(mutual)[0], source_idx[mutual]], axis=-1)
    else:
        corr = np.stack([np.arange(len(source_idx)), source_idx], axis=-1)
    if len(corr) < 10:
        return None

    frag1 = src_keypts[corr[:, 0]]
    frag2 = tgt_keypts[corr[:, 1]]
    frag1_warp = np.asarray(se3_transform(frag1, gt_trans))
    dist = np.sqrt(np.sum((frag1_warp - frag2) ** 2, axis=1))
    labels = (dist < inlier_threshold).astype(np.float32)

    input_src = src_keypts[corr[:, 0]].astype(np.float32)
    input_tgt = tgt_keypts[corr[:, 1]].astype(np.float32)
    corr_pos = encode_corr_pos(input_src, input_tgt, in_dim,
                               src_desc[corr[:, 0]], tgt_desc[corr[:, 1]])
    return {
        "corr_pos": corr_pos.astype(np.float32),
        "src_keypts": input_src,
        "tgt_keypts": input_tgt,
        "labels": labels,
        "src_desc": src_desc[corr[:, 0]].astype(np.float32),
        "tgt_desc": tgt_desc[corr[:, 1]].astype(np.float32),
    }


def match_descriptors_device(src_keypts, tgt_keypts, src_desc, tgt_desc,
                             gt_trans, inlier_threshold: float,
                             mask_s, mask_t, use_mutual: bool = True,
                             in_dim: int = 6):
    """On-device putative-correspondence construction (jit/vmap-able).

    The TPU-native replacement for the host ``build_correspondences``
    recipe (reference loaders ThreeDMatch.py:163-217): the [Ns, Nt]
    descriptor-distance matrix, the (mutual) 1-NN argmins, GT labels and
    the ``corr_pos`` encoding all run inside the registration dispatch,
    so eval throughput is no longer bound by single-core host matching.

    Static padded shapes: one correspondence row per SOURCE point; rows
    whose source point is padding or fails the mutual check are masked
    (and zeroed — the LCPE depthwise conv requires zeroed padding).
    When fewer than 10 mutual matches survive, falls back in-graph to
    non-mutual 1-NN, mirroring ``ThreeDMatchTest.__getitem__``'s host
    fallback (data/threedmatch.py:207-212).

    Args:
      src_keypts: [Ns, 3] f32 (padded).   tgt_keypts: [Nt, 3] f32.
      src_desc:   [Ns, D] f32.            tgt_desc:   [Nt, D] f32.
      gt_trans:   [4, 4] f32.
      mask_s/mask_t: [Ns]/[Nt] f32 validity masks.
    Returns dict(corr_pos [Ns, in_dim], src_keypts [Ns, 3],
      tgt_keypts [Ns, 3], labels [Ns], corr_mask [Ns]) — same row
      semantics as the host builder, uncompacted.
    """
    import jax.numpy as jnp
    from jax import lax

    ns = src_desc.shape[0]
    sim = jnp.matmul(src_desc, tgt_desc.T, precision=lax.Precision.HIGHEST)
    dist = jnp.sqrt(jnp.maximum(2.0 - 2.0 * sim, 0.0) + 1e-6)
    big = jnp.float32(1e9)
    dist = dist + big * (1.0 - mask_t)[None, :]
    src_idx = jnp.argmin(dist, axis=1)
    if use_mutual:
        dist_r = dist + big * (1.0 - mask_s)[:, None]
        tgt_idx = jnp.argmin(dist_r, axis=0)
        mutual = (tgt_idx[src_idx] == jnp.arange(ns)).astype(jnp.float32)
        mutual_mask = mask_s * mutual
        # reference fallback: <10 mutual matches -> plain 1-NN
        corr_mask = jnp.where(mutual_mask.sum() >= 10, mutual_mask, mask_s)
    else:
        corr_mask = mask_s

    tgt_sel = tgt_keypts[src_idx]
    warped = jnp.asarray(se3_transform(src_keypts, gt_trans))
    d = jnp.sqrt(jnp.sum((warped - tgt_sel) ** 2, axis=1))
    labels = (d < inlier_threshold).astype(jnp.float32) * corr_mask

    cm = corr_mask[:, None]
    src_sel = src_keypts * cm
    tgt_sel = tgt_sel * cm
    if in_dim == 3:
        corr_pos = src_sel - tgt_sel
    elif in_dim == 6:
        pos = jnp.concatenate([src_sel, tgt_sel], axis=-1)
        mean = pos.sum(0) / jnp.maximum(corr_mask.sum(), 1.0)
        corr_pos = (pos - mean) * cm
    elif in_dim == 9:
        corr_pos = jnp.concatenate(
            [src_sel, tgt_sel, src_sel - tgt_sel], axis=-1)
    elif in_dim == 6 + 2 * src_desc.shape[1]:  # reference's in_dim 70
        pos = jnp.concatenate([src_sel, tgt_sel], axis=-1)
        mean = pos.sum(0) / jnp.maximum(corr_mask.sum(), 1.0)
        corr_pos = jnp.concatenate(
            [(pos - mean) * cm, src_desc * cm, tgt_desc[src_idx] * cm],
            axis=-1)
    else:
        raise ValueError(f"unsupported in_dim {in_dim} for device matching")
    return {
        "corr_pos": corr_pos, "src_keypts": src_sel, "tgt_keypts": tgt_sel,
        "labels": labels, "corr_mask": corr_mask,
        # int32 match indices: lets callers reconstruct the matched rows
        # host-side from arrays they already hold, fetching [N] int32
        # instead of two [N, 3] f32 coordinate blocks (D2H on this box's
        # tunnel is ~34 MB/s — fetch bytes are wall time)
        "src_idx": src_idx.astype(jnp.int32),
    }


def encode_corr_pos(src, tgt, in_dim: int, src_desc=None, tgt_desc=None):
    """The in_dim-dependent correspondence encoding (ThreeDMatch.py:205-217)."""
    if in_dim == 3:
        return src - tgt
    if in_dim == 6:
        pos = np.concatenate([src, tgt], axis=-1)
        return pos - pos.mean(0)
    if in_dim == 9:
        return np.concatenate([src, tgt, src - tgt], axis=-1)
    if in_dim == 70:
        pos = np.concatenate([src, tgt], axis=-1)
        pos = pos - pos.mean(0)
        return np.concatenate([pos, src_desc, tgt_desc], axis=-1)
    raise ValueError(f"unsupported in_dim {in_dim}")
