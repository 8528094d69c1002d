"""Data layer: dataset builders, correspondence generation, batching.

Reference parity targets (SURVEY.md §1/L2):
- GMF_PointDSC/datasets/ThreeDMatch.py -> threedmatch.py
- GMF_PointDSC/datasets/KITTI.py       -> kitti.py
- GMF_PointDSC/datasets/dataloader.py  -> collate.py (min-clip + buckets)
- GMF_PointDSC/utils/uio.py            -> imageio.py (process_image)
- synthetic.py: self-contained correspondence-problem generator used by
  tests, trainer smoke runs and benchmarks (no reference equivalent —
  the reference has no test data generator at all).
"""

from gmf_tpu.data.synthetic import SyntheticCorrespondenceLoader, make_correspondence_problem
from gmf_tpu.data.collate import min_clip_collate, pad_to_bucket, BUCKETS
