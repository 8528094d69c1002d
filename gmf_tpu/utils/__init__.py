"""Utilities: timers/meters, checkpoint IO, torch weight conversion.

Reference parity targets:
- GMF_PointDSC/utils/timer.py -> timer.py (Timer, AverageMeter)
- checkpoint payload contract (state + embedded config,
  GMF_DGR core/trainer.py:541-563) -> checkpoint.py
"""

from gmf_tpu.utils.timer import Timer, AverageMeter
from gmf_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
