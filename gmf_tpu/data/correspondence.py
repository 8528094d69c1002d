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
