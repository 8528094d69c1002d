"""Training layer: losses, trainer, optimization, checkpointing.

Reference parity targets (SURVEY.md §1/L4):
- GMF_PointDSC/libs/loss.py    -> losses.py
- GMF_PointDSC/libs/trainer.py -> trainer.py
- GMF_DGR core/loss.py         -> losses.py (balanced/unbalanced BCE,
                                  HighDimSmoothL1)
"""

from gmf_tpu.train.losses import (
    transformation_loss,
    classification_loss,
    spectral_matching_loss,
    balanced_bce_loss,
    unbalanced_bce_loss,
    high_dim_smooth_l1_loss,
)
