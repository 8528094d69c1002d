"""Compute ops: descriptor kernels and Pallas TPU kernels for hot paths.

- fpfh.py: JAX FPFH descriptors (replaces Open3D compute_fpfh_feature used
  by the reference's fpfh variant, SURVEY.md §2.4/§2.5).
- pallas kernels (compat-modulated attention etc.) live in
  fused_attention.py.
"""

from gmf_tpu.ops.fpfh import estimate_normals, fpfh_features
