"""MinkowskiEngine checkpoint -> gmf_tpu sparse-net conversion.

Maps the reference's FCGF / DGR-inlier state_dicts (MinkowskiConvolution
kernels are already kernel-volume-major [K, Cin, Cout], matching our
SparseConv layout) onto the SparseResUNet2 tree:

- ``convN.kernel``            -> convN/kernel (offset rows permuted)
- ``normN.bn.{weight,bias}``  -> normN/{scale,bias}
- ``normN.bn.running_*``      -> batch_stats
- ``blockN.convK.kernel`` + ``blockN.normK.bn.*`` -> blockN/convK, normK
- 1x1 convs (conv1_tr, final) -> Dense kernels [Cin, Cout]
- the GMF variant's img_encoder / image_fusion / perceiver_io map through
  convert_torch's ResNet + FusionLayer converters.

Offset ordering: MinkowskiEngine enumerates hypercube offsets with the
FIRST coordinate varying fastest; gmf_tpu's hypercube_offsets varies the
LAST fastest. ``me_offset_permutation`` converts between them (set
``me_fastest='last'`` if a checkpoint turns out to use the other
convention — calibrate once against a known activation).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from gmf_tpu.sparse.kernel_map import hypercube_offsets
from gmf_tpu.utils.convert_torch import (
    _bn, _np, convert_fusion_layer, convert_image_encoder,
)


def me_offset_permutation(kernel_size: int, dim: int,
                          me_fastest: str = "first") -> np.ndarray:
    """perm[k_gmf] = k_me: reorders ME kernel rows to gmf offset order."""
    ours = hypercube_offsets(kernel_size, dim)  # last dim fastest
    r = kernel_size // 2
    if me_fastest == "first":
        # ME index: sum_d (o_d + r) * k^d (dim 0 least significant)
        weights = kernel_size ** np.arange(dim)
    else:
        weights = kernel_size ** np.arange(dim)[::-1]
    return ((ours + r) @ weights).astype(np.int64)


def _conv_kernel(sd, name, kernel_size: int, dim: int,
                 me_fastest: str = "first"):
    w = _np(sd[f"{name}.kernel"])
    if w.ndim == 2:  # 1x1 conv stored as [Cin, Cout]
        return {"kernel": w}
    perm = me_offset_permutation(kernel_size, dim, me_fastest)
    return {"kernel": w[perm]}


def _me_bn(sd, name) -> Tuple[Dict, Dict]:
    # MinkowskiBatchNorm wraps a torch BatchNorm1d at "<name>.bn"
    return _bn(sd, f"{name}.bn")


def convert_sparse_resunet(sd: Dict[str, np.ndarray], dim: int = 3,
                           conv1_kernel_size: int = 7,
                           with_gmf_fusion: bool = False,
                           me_fastest: str = "first"):
    """Convert a ResUNetBN2C state_dict (resunet.py / resunet_new.py).

    Returns {"params": ..., "batch_stats": ...} for SparseResUNet2.
    """
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    def block(dst, src):
        bp: Dict[str, Any] = {
            "conv1": _conv_kernel(sd, f"{src}.conv1", 3, dim, me_fastest),
            "conv2": _conv_kernel(sd, f"{src}.conv2", 3, dim, me_fastest),
        }
        bbs: Dict[str, Any] = {}
        bp["norm1"], bbs["norm1"] = _me_bn(sd, f"{src}.norm1")
        bp["norm2"], bbs["norm2"] = _me_bn(sd, f"{src}.norm2")
        p[dst] = bp
        bs[dst] = bbs

    p["conv1"] = _conv_kernel(sd, "conv1", conv1_kernel_size, dim, me_fastest)
    p["norm1"], bs["norm1"] = _me_bn(sd, "norm1")
    block("block1", "block1")
    for i in (2, 3, 4):
        p[f"conv{i}"] = _conv_kernel(sd, f"conv{i}", 3, dim, me_fastest)
        p[f"norm{i}"], bs[f"norm{i}"] = _me_bn(sd, f"norm{i}")
        block(f"block{i}", f"block{i}")
    for i in (4, 3, 2):
        p[f"conv{i}_tr"] = _conv_kernel(sd, f"conv{i}_tr", 3, dim, me_fastest)
        p[f"norm{i}_tr"], bs[f"norm{i}_tr"] = _me_bn(sd, f"norm{i}_tr")
        block(f"block{i}_tr", f"block{i}_tr")
    # 1x1 convs -> Dense
    w = _np(sd["conv1_tr.kernel"]) if "conv1_tr.kernel" in sd else None
    if w is not None and w.ndim == 2:
        p["conv1_tr"] = {"kernel": w}
    final = {"kernel": _np(sd["final.kernel"])}
    if "final.bias" in sd:
        final["bias"] = _np(sd["final.bias"]).reshape(-1)
    p["final"] = final

    if with_gmf_fusion:
        ie_p, ie_s = convert_image_encoder(sd, "img_encoder.")
        p["img_encoder"] = ie_p
        bs["img_encoder"] = ie_s
        p["image_fusion"] = convert_fusion_layer(sd, "image_fusion.",
                                                 pe=False)
        p["perceiver_io"] = convert_fusion_layer(sd, "perceiver_io.",
                                                 pe=True)
    return {"params": p, "batch_stats": bs}
