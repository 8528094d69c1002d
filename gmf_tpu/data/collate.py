"""Batch collation: min-clip (reference parity) and bucket padding (TPU).

Parity: GMF_PointDSC/datasets/dataloader.py:6-53 — the reference batches
variable-size correspondence sets by randomly subsampling every sample down
to the batch minimum, producing dense [B, N_min, *] tensors.

TPU addition: ``pad_to_bucket`` pads a sample UP to the next static bucket
size and emits a validity mask, so XLA compiles once per bucket instead of
once per N (SURVEY.md §7 step 3). Buckets cover the reference's operating
points: 1000 (train), 2500/5000 (3DMatch eval), 12000 (KITTI eval).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

BUCKETS = (256, 1000, 2500, 5000, 12000)

_PER_CORR_KEYS = ("corr_pos", "src_keypts", "tgt_keypts", "labels")


def min_clip_collate(samples: Sequence[Dict[str, np.ndarray]],
                     rng: np.random.RandomState | None = None
                     ) -> Dict[str, np.ndarray]:
    """Clip every sample to the batch-min correspondence count and stack.

    Each sample holds unbatched arrays (corr_pos [N,6], ... images [H,W,3]).
    """
    rng = rng or np.random
    n_min = min(s["corr_pos"].shape[0] for s in samples)
    out: Dict[str, List[np.ndarray]] = {k: [] for k in samples[0]}
    for s in samples:
        n = s["corr_pos"].shape[0]
        sel = rng.choice(n, n_min, replace=False) if n > n_min else np.arange(n)
        for k, v in s.items():
            out[k].append(v[sel] if k in _PER_CORR_KEYS else v)
    return {k: np.stack(v) for k, v in out.items()}


def next_bucket(n: int, buckets: Sequence[int] = BUCKETS) -> int:
    """Smallest bucket >= n (largest bucket if n exceeds all)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def pad_to_bucket(sample: Dict[str, np.ndarray],
                  buckets: Sequence[int] = BUCKETS) -> Dict[str, np.ndarray]:
    """Pad per-correspondence arrays to the next bucket + add corr_mask.

    If the sample exceeds the largest bucket it is randomly subsampled down
    to it (the reference's ``num_node`` subsampling plays the same role,
    ThreeDMatch.py:149-161).
    """
    n = sample["corr_pos"].shape[0]
    b = next_bucket(n, buckets)
    out = dict(sample)
    if n > b:
        sel = np.random.choice(n, b, replace=False)
        for k in _PER_CORR_KEYS:
            if k in out:
                out[k] = out[k][sel]
        n = b
    mask = np.zeros((b,), np.float32)
    mask[:n] = 1.0
    for k in _PER_CORR_KEYS:
        if k in out:
            pad_width = [(0, b - n)] + [(0, 0)] * (out[k].ndim - 1)
            out[k] = np.pad(out[k], pad_width)
    out["corr_mask"] = mask
    return out
