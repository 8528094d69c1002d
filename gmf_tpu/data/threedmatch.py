"""3DMatch / 3DLoMatch datasets (3DImageMatch layout).

Parity: GMF_PointDSC/datasets/ThreeDMatch.py —
- TrainVal (:16-255): pair lists from per-scene overlap files, precomputed
  ``*_fcgf.npz`` / ``*_fpfh.npz`` {xyz, feature} descriptors, an RGB frame
  per cloud (``*_0.png/jpg`` -> 120x160), jitter + random SE(3)
  augmentation, ``num_node`` random keypoints, descriptor-space NN
  correspondences, GT labels by distance, resample when <10 matches.
- Test (:258-476): per-scene ``gt.log`` parsing (inverse transform — the
  file stores target->source), num_node='all', mutual matching.
- ThreeDLOMatchTest (:478-580): pair list from ``misc/3DLoMatch.pkl``.

Samples are dicts consumed by min_clip_collate / pad_to_bucket.
"""

from __future__ import annotations

import glob
import os
import pickle
import random
from typing import Dict, List, Optional

import numpy as np

from gmf_tpu.data.correspondence import build_correspondences
from gmf_tpu.data.imageio import load_image
from gmf_tpu.geometry.se3 import (
    random_rotation_matrix, random_translation,
    transform as se3_transform,
)

SCENE_LIST = [
    "7-scenes-redkitchen",
    "sun3d-home_at-home_at_scan1_2013_jan_1",
    "sun3d-home_md-home_md_scan9_2012_sep_30",
    "sun3d-hotel_uc-scan3",
    "sun3d-hotel_umd-maryland_hotel1",
    "sun3d-hotel_umd-maryland_hotel3",
    "sun3d-mit_76_studyroom-76-1studyroom2",
    "sun3d-mit_lab_hj-lab_hj_tea_nov_2_2012_scan1_erika",
]


def load_gt_log(scene_path: str) -> Dict[str, np.ndarray]:
    """Parse a 3DMatch ``gt.log``: blocks of one header line (i j total)
    followed by a 4x4 matrix. Key format '<i>_<j>'.

    Parity: ThreeDMatchTest.__loadlog__ (ThreeDMatch.py:462-476).
    """
    out = {}
    path = os.path.join(scene_path, "gt.log")
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    i = 0
    while i + 4 < len(lines) or (i + 4 == len(lines) and len(lines) >= 5):
        head = lines[i].split()
        key = f"{head[0]}_{head[1]}"
        mat = np.array(
            [[float(x) for x in lines[i + r].split()] for r in range(1, 5)]
        )
        out[key] = mat
        i += 5
    return out


# Process-wide byte-budgeted LRU of per-fragment host arrays. Every
# fragment in a 3DMatch eval set appears in many pairs (redkitchen: 60
# fragments, 506 pairs), so re-reading / re-decoding its npz + image per
# pair is the dominant host data cost once matching runs on device.
# Cached arrays are READ-ONLY; all consumers copy (astype / fancy
# indexing / augmentation), so an accidental in-place write fails loudly
# instead of corrupting neighbouring samples. Budget:
# ``GMF_FRAG_IO_CACHE_MB`` (default 2048; 0 disables). The cache itself
# is the PROCESS-WIDE one in utils/lru.py, shared with the DGR eval CLI
# so the env budget bounds total host cache use.
from gmf_tpu.utils.lru import cache_host_arrays as _cache_host_arrays


def _load_descriptors(path_base: str, descriptor: str):
    def build():
        data = np.load(f"{path_base}_{descriptor}.npz")
        xyz = data["xyz"].astype(np.float32)
        feat = data["feature"].astype(np.float32)
        if descriptor == "fpfh":
            feat = np.nan_to_num(feat)
            feat = feat / (np.linalg.norm(feat, axis=1, keepdims=True)
                           + 1e-6)
        return xyz, feat

    return _cache_host_arrays(("desc", path_base, descriptor), build)


def _load_frame_image(path_base: str, image_hw):
    def build():
        for ext in ("_0.png", "_0.jpg"):
            p = path_base + ext
            if os.path.exists(p):
                return load_image(p, *image_hw)
        raise FileNotFoundError(f"no image for {path_base}")

    return _cache_host_arrays(("img", path_base, tuple(image_hw)), build)


class ThreeDMatchTrainVal:
    """Training/validation pairs with augmentation."""

    def __init__(self, root: str, split: str, overlap_path: str,
                 descriptor: str = "fcgf", in_dim: int = 6,
                 inlier_threshold: float = 0.10, num_node=1000,
                 use_mutual: bool = True, augment_axis: int = 3,
                 augment_rotation: float = 1.0,
                 augment_translation: float = 0.5,
                 image_hw=(120, 160),
                 split_file: Optional[str] = None):
        assert descriptor in ("fcgf", "fpfh")
        self.__dict__.update(locals())
        if split_file is None:
            split_file = os.path.join(
                os.path.dirname(__file__), "splits", f"{split}_3dmatch.txt")
        subset_names = open(split_file).read().split()
        self.files: List[List[str]] = []
        for name in subset_names:
            for fname_txt in glob.glob(os.path.join(overlap_path, name + "*")):
                with open(fname_txt) as f:
                    for line in f:
                        parts = line.strip().split()
                        if len(parts) >= 2:
                            self.files.append([parts[0], parts[1]])

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        src_id, tgt_id = self.files[index]
        if random.random() > 0.5:
            src_id, tgt_id = tgt_id, src_id

        src_keypts, src_feat = _load_descriptors(
            os.path.join(self.root, src_id.replace(".ply", "")),
            self.descriptor)
        tgt_keypts, tgt_feat = _load_descriptors(
            os.path.join(self.root, tgt_id.replace(".ply", "")),
            self.descriptor)
        p_image = _load_frame_image(
            os.path.join(self.root, src_id.replace(".ply", "")), self.image_hw)
        q_image = _load_frame_image(
            os.path.join(self.root, tgt_id.replace(".ply", "")), self.image_hw)

        # jitter + random SE(3) augmentation (ThreeDMatch.py:136-147)
        src_keypts = src_keypts + np.random.rand(len(src_keypts), 3) * 0.005
        tgt_keypts = tgt_keypts + np.random.rand(len(tgt_keypts), 3) * 0.005
        aug_R = random_rotation_matrix(self.augment_axis, self.augment_rotation)
        aug_T = random_translation(self.augment_translation)
        aug_trans = np.eye(4)
        aug_trans[:3, :3], aug_trans[:3, 3:4] = aug_R, aug_T
        tgt_keypts = np.asarray(se3_transform(tgt_keypts, aug_trans),
                                np.float32)
        gt_trans = aug_trans.astype(np.float32)

        # num_node random keypoints (with replacement, as the reference)
        if self.num_node != "all":
            src_sel = np.random.choice(len(src_keypts), self.num_node)
            tgt_sel = np.random.choice(len(tgt_keypts), self.num_node)
            src_keypts, src_feat = src_keypts[src_sel], src_feat[src_sel]
            tgt_keypts, tgt_feat = tgt_keypts[tgt_sel], tgt_feat[tgt_sel]

        sample = build_correspondences(
            src_keypts.astype(np.float32), tgt_keypts, src_feat, tgt_feat,
            gt_trans, self.inlier_threshold, self.use_mutual, self.in_dim)
        if sample is None:  # too few matches -> resample (ref :175-177)
            return self[int(np.random.choice(len(self)))]
        sample["gt_trans"] = gt_trans
        sample["p_image"] = p_image
        sample["q_image"] = q_image
        return sample


class ThreeDMatchTest:
    """Per-scene test pairs from gt.log; num_node='all' by default."""

    def __init__(self, root: str, descriptor: str = "fcgf", in_dim: int = 6,
                 inlier_threshold: float = 0.10, num_node="all",
                 use_mutual: bool = True, select_scene: Optional[str] = None,
                 image_hw=(120, 160), device_match: bool = False):
        assert descriptor in ("fcgf", "fpfh")
        self.__dict__.update(locals())
        self.scene_list = ([select_scene] if select_scene in SCENE_LIST
                           else list(SCENE_LIST))
        self.gt_trans: Dict[str, np.ndarray] = {}
        for scene in self.scene_list:
            for k, v in load_gt_log(os.path.join(root, scene)).items():
                self.gt_trans[f"{scene}@{k}"] = v
        self.keys = list(self.gt_trans.keys())

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        key = self.keys[index]
        scene, pair = key.split("@")
        src_id, tgt_id = pair.split("_")
        base = os.path.join(self.root, scene, "seq-01")

        src_keypts, src_feat = _load_descriptors(
            os.path.join(base, f"cloud_bin_{src_id}"), self.descriptor)
        tgt_keypts, tgt_feat = _load_descriptors(
            os.path.join(base, f"cloud_bin_{tgt_id}"), self.descriptor)
        p_image = _load_frame_image(
            os.path.join(base, f"cloud_bin_{src_id}"), self.image_hw)
        q_image = _load_frame_image(
            os.path.join(base, f"cloud_bin_{tgt_id}"), self.image_hw)

        # gt.log stores target->source (ThreeDMatch.py:363)
        gt_trans = np.linalg.inv(self.gt_trans[key]).astype(np.float32)

        if self.num_node != "all":
            src_sel = np.random.choice(len(src_keypts), self.num_node)
            tgt_sel = np.random.choice(len(tgt_keypts), self.num_node)
            src_keypts, src_feat = src_keypts[src_sel], src_feat[src_sel]
            tgt_keypts, tgt_feat = tgt_keypts[tgt_sel], tgt_feat[tgt_sel]

        if self.device_match:
            # raw descriptors: matching/labels/corr_pos run ON DEVICE
            # inside the registrar dispatch (PointDSCRegistrar raw path)
            # np.asarray: a free view when the (cached, read-only)
            # arrays are already f32 — an .astype here would memcpy
            # ~1.5 MB x 4 per pair that a fragment-cache-hit dispatch
            # never reads
            sample = {
                "src_keypts": np.asarray(src_keypts, np.float32),
                "tgt_keypts": np.asarray(tgt_keypts, np.float32),
                "src_desc": np.asarray(src_feat, np.float32),
                "tgt_desc": np.asarray(tgt_feat, np.float32),
            }
            if self.num_node == "all":
                # stable per-fragment identity -> the registrar's device
                # fragment cache ships each fragment over H2D once
                # (random num_node subsampling makes arrays pair-specific,
                # so no key is attached then)
                sample["src_key"] = os.path.join(base, f"cloud_bin_{src_id}")
                sample["tgt_key"] = os.path.join(base, f"cloud_bin_{tgt_id}")
        else:
            sample = build_correspondences(
                src_keypts.astype(np.float32), tgt_keypts.astype(np.float32),
                src_feat, tgt_feat, gt_trans, self.inlier_threshold,
                self.use_mutual, self.in_dim)
            if sample is None:
                # test pairs are never skipped — fall back to non-mutual
                sample = build_correspondences(
                    src_keypts.astype(np.float32),
                    tgt_keypts.astype(np.float32),
                    src_feat, tgt_feat, gt_trans, self.inlier_threshold,
                    False, self.in_dim)
        sample["gt_trans"] = gt_trans
        sample["p_image"] = p_image
        sample["q_image"] = q_image
        sample["scene"] = scene
        return sample


class ThreeDLoMatchTest(ThreeDMatchTest):
    """Low-overlap benchmark: pairs come from 3DLoMatch.pkl
    (ThreeDMatch.py:478-580)."""

    def __init__(self, root: str, pair_file: str, num_node=5000, **kw):
        self.root = root
        kw.setdefault("descriptor", "fcgf")
        self.descriptor = kw["descriptor"]
        self.in_dim = kw.get("in_dim", 6)
        self.inlier_threshold = kw.get("inlier_threshold", 0.10)
        self.num_node = num_node
        self.use_mutual = kw.get("use_mutual", True)
        self.image_hw = kw.get("image_hw", (120, 160))
        self.device_match = kw.get("device_match", False)
        with open(pair_file, "rb") as f:
            self.infos = pickle.load(f)
        # infos: dict with 'src', 'tgt', 'rot', 'trans' arrays (PREDATOR fmt)
        self.keys = list(range(len(self.infos["rot"])))

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        rot = self.infos["rot"][index]
        tsl = self.infos["trans"][index].reshape(3)
        src_path = self.infos["src"][index]
        tgt_path = self.infos["tgt"][index]
        gt_trans = np.eye(4, dtype=np.float32)
        gt_trans[:3, :3], gt_trans[:3, 3] = rot, tsl

        def resolve(p):
            # Reference layout first (ThreeDMatch.py:512-524): entries are
            # 'test/<scene>/cloud_bin_<id>.pth' and descriptors live under
            # '{root}/fragments/<scene>/cloud_bin_<id>_<desc>.npz'.
            parts = p.split("/")
            if len(parts) >= 3:
                scene, fname = parts[1], parts[-1]
                stem = os.path.join(self.root, "fragments", scene,
                                    fname.replace(".pth", "")
                                         .replace(".ply", ""))
                if os.path.exists(f"{stem}_{self.descriptor}.npz"):
                    return stem
            # fallback: path taken relative to root (fixture layout)
            stem = os.path.join(self.root, p)
            return stem.replace(".pth", "").replace(".ply", "")

        src_keypts, src_feat = _load_descriptors(resolve(src_path),
                                                 self.descriptor)
        tgt_keypts, tgt_feat = _load_descriptors(resolve(tgt_path),
                                                 self.descriptor)
        p_image = _load_frame_image(resolve(src_path), self.image_hw)
        q_image = _load_frame_image(resolve(tgt_path), self.image_hw)

        # decide cache eligibility BEFORE subsampling: a randomly
        # subsampled fragment is pair-specific, so attaching a stable key
        # would let the registrar's device cache serve one pair's random
        # subset to every later pair of that fragment
        subsampled = False
        if self.num_node != "all" and len(src_keypts) > self.num_node:
            sel = np.random.choice(len(src_keypts), self.num_node)
            src_keypts, src_feat = src_keypts[sel], src_feat[sel]
            subsampled = True
        if self.num_node != "all" and len(tgt_keypts) > self.num_node:
            sel = np.random.choice(len(tgt_keypts), self.num_node)
            tgt_keypts, tgt_feat = tgt_keypts[sel], tgt_feat[sel]
            subsampled = True

        if getattr(self, "device_match", False):
            # np.asarray: a free view when the (cached, read-only)
            # arrays are already f32 — an .astype here would memcpy
            # ~1.5 MB x 4 per pair that a fragment-cache-hit dispatch
            # never reads
            sample = {
                "src_keypts": np.asarray(src_keypts, np.float32),
                "tgt_keypts": np.asarray(tgt_keypts, np.float32),
                "src_desc": np.asarray(src_feat, np.float32),
                "tgt_desc": np.asarray(tgt_feat, np.float32),
            }
            if not subsampled:
                sample["src_key"] = resolve(src_path)
                sample["tgt_key"] = resolve(tgt_path)
        else:
            sample = build_correspondences(
                src_keypts.astype(np.float32), tgt_keypts.astype(np.float32),
                src_feat, tgt_feat, gt_trans, self.inlier_threshold,
                self.use_mutual, self.in_dim)
        sample["gt_trans"] = gt_trans
        sample["p_image"] = p_image
        sample["q_image"] = q_image
        return sample
