"""Typed configuration system with JSON snapshots.

Replaces the reference's argparse modules (config_3DMatch.py /
config_Kitti.py, SURVEY.md §2.2 P23 / §2.3 D13) with dataclass presets.
The same contract is kept: configs serialize to JSON at train time and are
embedded in checkpoints so evaluation can rebuild the network from the
checkpoint alone.
"""

from gmf_tpu.configs.presets import (
    GMFConfig,
    ModelConfig,
    DataConfig,
    pointdsc_3dmatch,
    pointdsc_kitti,
    dgr_3dmatch,
    dgr_kitti,
)
