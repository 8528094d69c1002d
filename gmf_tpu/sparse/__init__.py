"""TPU-native sparse convolution engine (MinkowskiEngine replacement).

The reference depends on MinkowskiEngine (C++/CUDA) for all sparse convs
(SURVEY.md §2.5). This package re-designs that stack for XLA:

- ``voxelize.py``  : host-side quantization (== ME.sparse_quantize).
- ``kernel_map.py``: host-side kernel-map construction — for every kernel
  offset, a dense [K, M_out] neighbor-index table with a sentinel for
  missing inputs. Static shapes by design; 6-D maps prune empty offsets.
- ``device_maps.py``: the same kernel-map construction ON DEVICE (sorted
  int64 keys + vectorized binary search) — the coordinate manager for
  hosts too weak to probe 6-D maps, and the path that keeps maps in HBM.
- ``conv.py``      : device-side gather-GEMM-scatter convolution — a
  lax.scan over offset chunks of (gather -> MXU matmul -> accumulate),
  plus masked batch norm for padded voxel sets.
- ``resunet.py``   : the ResUNet2 family (FCGF descriptor net, 6-D inlier
  net) built on those ops.
"""

from gmf_tpu.sparse.voxelize import sparse_quantize
from gmf_tpu.sparse.kernel_map import (
    hypercube_offsets,
    hypercross_offsets,
    build_kernel_map,
    downsample_coords,
    SparsePyramid,
    build_pyramid,
)
from gmf_tpu.sparse.conv import sparse_conv, SparseConv, MaskedBatchNorm
from gmf_tpu.sparse.device_maps import (
    device_kernel_map,
    build_pyramid_arrays_device,
)
