"""gmf_tpu — TPU-native General Multimodal Fusion (GMF) registration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
XiaoshuiHuang/GMF (RAL 2022): multimodal (image + geometry) fusion for
3D point-cloud correspondence outlier rejection, built TPU-first.

Subpackages
-----------
- ``geometry``  : SE(3) math, weighted Kabsch, spectral matching, kNN, NMS,
                  RANSAC, ICP — pure JAX, static shapes, no host round-trips.
- ``nn``        : fusion layers (cross-attention, LCPE), image encoder
                  (ResNet-34 /8), building blocks.
- ``models``    : PointDSC+GMF, DGR inlier net+GMF, FCGF/FPFH descriptors.
- ``sparse``    : voxel hashing + gather-GEMM-scatter sparse convolution.
- ``ops``       : Pallas TPU kernels for the hot paths.
- ``data``      : dataset builders and fixed-shape padded batching.
- ``train``     : losses, trainers, optimizers, checkpointing.
- ``eval``      : benchmark harnesses (3DMatch / 3DLoMatch / KITTI) and
                  classical baselines.
- ``parallel``  : device-mesh construction and sharding rules.
- ``utils``     : timers, config, torch-checkpoint conversion.
"""

__version__ = "0.1.0"
