"""KITTI odometry pair dataset (precomputed npz-per-pair layout).

Parity: GMF_PointDSC/datasets/KITTI.py:8-157 — each ``{descriptor}_{split}``
file holds one pair: {xyz0, xyz1, features0, features1, p_image, q_image,
gt_trans}; inlier threshold 0.60 (train) / 1.2-scale eval, downsample 0.30,
train-time jitter 0.05.
"""

from __future__ import annotations

import os
import random
from typing import Dict

import numpy as np

from gmf_tpu.data.correspondence import build_correspondences
from gmf_tpu.data.imageio import process_image
from gmf_tpu.geometry.se3 import (
    random_rotation_matrix, random_translation,
    transform as se3_transform,
)


class KITTIDataset:
    def __init__(self, root: str, split: str = "train",
                 descriptor: str = "fcgf", in_dim: int = 6,
                 inlier_threshold: float = 0.60, num_node=5000,
                 use_mutual: bool = True, augment_axis: int = 0,
                 augment_rotation: float = 1.0,
                 augment_translation: float = 0.01,
                 image_hw=(120, 160), device_match: bool = False):
        assert descriptor in ("fcgf", "fpfh")
        self.__dict__.update(locals())
        d = os.path.join(root, f"{descriptor}_{split}")
        self.ids_list = [os.path.join(d, f) for f in sorted(os.listdir(d))]

    def __len__(self):
        return len(self.ids_list)

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        data = np.load(self.ids_list[index])
        src_keypts = data["xyz0"].astype(np.float32)
        tgt_keypts = data["xyz1"].astype(np.float32)
        src_feat = data["features0"].astype(np.float32)
        tgt_feat = data["features1"].astype(np.float32)
        H, W = self.image_hw

        def prep_img(img):
            if img.shape[0] != H or img.shape[1] != W:
                img = process_image(img, H, W)
            if img.dtype == np.uint8:
                img = img.astype(np.float32) / 255.0
            return img.astype(np.float32)

        p_image = prep_img(data["p_image"])
        q_image = prep_img(data["q_image"])

        if self.descriptor == "fpfh":
            src_feat = src_feat / (np.linalg.norm(src_feat, axis=1,
                                                  keepdims=True) + 1e-6)
            tgt_feat = tgt_feat / (np.linalg.norm(tgt_feat, axis=1,
                                                  keepdims=True) + 1e-6)

        orig_trans = data["gt_trans"].astype(np.float64)
        if self.split == "train":
            src_keypts = src_keypts + np.random.rand(len(src_keypts), 3) * 0.05
            tgt_keypts = tgt_keypts + np.random.rand(len(tgt_keypts), 3) * 0.05
        aug_R = random_rotation_matrix(self.augment_axis, self.augment_rotation)
        aug_T = random_translation(self.augment_translation)
        aug = np.eye(4)
        aug[:3, :3], aug[:3, 3:4] = aug_R, aug_T
        tgt_keypts = np.asarray(se3_transform(tgt_keypts, aug), np.float32)
        gt_trans = (aug @ orig_trans).astype(np.float32)

        if self.num_node != "all" and len(src_keypts) > self.num_node:
            sel = np.random.choice(len(src_keypts), self.num_node,
                                   replace=False)
            src_keypts, src_feat = src_keypts[sel], src_feat[sel]
        if self.num_node != "all" and len(tgt_keypts) > self.num_node:
            sel = np.random.choice(len(tgt_keypts), self.num_node,
                                   replace=False)
            tgt_keypts, tgt_feat = tgt_keypts[sel], tgt_feat[sel]

        if self.device_match:
            # raw descriptors: matching runs on device in the registrar
            sample = {
                "src_keypts": src_keypts.astype(np.float32),
                "tgt_keypts": tgt_keypts.astype(np.float32),
                "src_desc": src_feat.astype(np.float32),
                "tgt_desc": tgt_feat.astype(np.float32),
            }
        else:
            sample = build_correspondences(
                src_keypts, tgt_keypts, src_feat, tgt_feat, gt_trans,
                self.inlier_threshold, self.use_mutual, self.in_dim)
            if sample is None:
                return self[int(np.random.choice(len(self)))]
        sample["gt_trans"] = gt_trans
        sample["p_image"] = p_image
        sample["q_image"] = q_image
        return sample
