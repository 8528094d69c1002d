"""Redwood / Augmented ICL-NUIM fragments for multiway registration.

Parity: GMF_PointDSC/datasets/Redwood.py (P9) — per-scene fragment lists
(ply files) feeding the multiway pose-graph app. The reference picks the
scene interactively when unspecified; here it's an argument.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np

from gmf_tpu.data.ply import read_ply

SCENES = ["livingroom1", "livingroom2", "office1", "office2"]


class RedwoodDataset:
    """Fragments of one Augmented ICL-NUIM scene.

    Layout: <root>/<scene>/fragments/*.ply (+ optional gt trajectory
    <root>/<scene>/gt.log for ATE evaluation).
    """

    def __init__(self, root: str, scene: Optional[str] = None):
        self.root = root
        if scene is None:
            available = [s for s in SCENES
                         if os.path.isdir(os.path.join(root, s))]
            assert available, f"no Redwood scenes under {root}"
            scene = available[0]
        self.scene = scene
        frag_dir = os.path.join(root, scene, "fragments")
        self.files: List[str] = sorted(glob.glob(
            os.path.join(frag_dir, "*.ply")))
        if not self.files:  # flat layout fallback
            self.files = sorted(glob.glob(os.path.join(root, scene, "*.ply")))

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        return {"xyz": read_ply(self.files[idx])["xyz"],
                "path": self.files[idx]}

    def gt_trajectory(self):
        from gmf_tpu.apps.multiway import read_trajectory

        path = os.path.join(self.root, self.scene, "gt.log")
        if os.path.exists(path):
            return [mat for _, mat in read_trajectory(path)]
        return None
