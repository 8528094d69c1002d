"""Applications built on the framework.

- multiway.py: multiway (pose-graph) registration — the reference's
  GMF_PointDSC/multiway/ app (SURVEY.md §2.2 P20): pairwise registration
  -> pose graph -> Levenberg-Marquardt/Gauss-Newton global optimization,
  trajectory IO and ATE evaluation.
"""

from gmf_tpu.apps.multiway import (
    PoseGraph,
    optimize_pose_graph,
    multiway_register,
    read_trajectory,
    write_trajectory,
    ate_rmse,
)
