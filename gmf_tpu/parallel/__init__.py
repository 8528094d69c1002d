"""Device-mesh construction and sharding rules.

The reference has no distributed code at all (SURVEY.md §2.6 — single GPU,
env-pinned). This package supplies the TPU-native scaling story:

- ``mesh.py``: ('data', 'model') mesh over the slice; DP is the primary
  axis (independent registration pairs per chip), the model axis is exposed
  for sharding attention/MLP weights if models ever outgrow one chip.
- Collectives ride ICI via XLA (psum for gradients, all_gather for eval
  stats); no NCCL/MPI equivalent code exists or is needed.
"""

from gmf_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_shardings,
)
