"""Geometry/math primitives (parity layer for the reference's L0).

Reference parity targets (see SURVEY.md §1/L0):
- GMF_PointDSC/utils/SE3.py                 -> se3.py
- GMF_PointDSC/models/common.py:10-75       -> kabsch.py, knn.py
- GMF_PointDSC/models/PointDSC.py:429-454   -> spectral.py
- GMF_PointDSC/models/PointDSC.py:268-301   -> nms.py
- GMF_DGR core/metrics.py, core/registration.py -> metrics.py, procrustes in kabsch.py
"""

from gmf_tpu.geometry.se3 import (
    transform,
    integrate_trans,
    decompose_trans,
    concatenate,
    random_rotation_matrix,
    random_translation,
)
from gmf_tpu.geometry.kabsch import rigid_transform_3d, kabsch_svd, kabsch_quat
from gmf_tpu.geometry.spectral import leading_eigenvector
from gmf_tpu.geometry.knn import knn, pdist
from gmf_tpu.geometry.nms import pick_seeds_nms
from gmf_tpu.geometry.metrics import (
    rotation_error_deg,
    translation_error,
    registration_success,
)
