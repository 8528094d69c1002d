"""Model registry: name -> constructor.

Parity: GMF_DGR_fcgf/model/__init__.py:25-41 ``load_model(name)`` — the
reference resolves checkpoint-recorded network names (``ResUNetBN2C``
etc.) to classes. Same contract here, covering the ResUNet zoo variants
plus the correspondence encoders.
"""

from __future__ import annotations

from typing import Callable, Dict

from gmf_tpu.models.oanet import OANet
from gmf_tpu.models.pointdsc import PointDSC
from gmf_tpu.sparse.pyramidnet import PYRAMID_MODELS
from gmf_tpu.sparse.resunet import SparseResUNet2
from gmf_tpu.sparse.simpleunet import SimpleSparseUNet


def _resunet(channels, tr_channels, region="hypercube"):
    def make(in_channels=1, out_channels=32, dim=3, conv1_kernel_size=3,
             normalize_feature=False, **kw):
        return SparseResUNet2(
            in_channels=in_channels, out_channels=out_channels, dim=dim,
            conv1_kernel_size=conv1_kernel_size,
            normalize_feature=normalize_feature, channels=channels,
            tr_channels=tr_channels, region=region, **kw)

    return make


MODELS: Dict[str, Callable] = {
    # ResUNet zoo (model/resunet.py + misc/fcgf.py class table)
    "ResUNetBN2": _resunet((32, 64, 128, 256), (32, 64, 64, 128)),
    "ResUNetBN2B": _resunet((32, 64, 128, 256), (64, 64, 64, 64)),
    "ResUNetBN2C": _resunet((32, 64, 128, 256), (64, 64, 64, 128)),
    "ResUNetBN2CX": _resunet((32, 64, 128, 256), (64, 64, 64, 128),
                             region="hypercross"),
    # SimpleNet zoo (model/simpleunet.py): 3-level UNet, no residuals
    "SimpleNetBN": lambda **kw: SimpleSparseUNet(
        channels=(32, 64, 128), tr_channels=(32, 64, 64), **kw),
    "SimpleNetBN2C": lambda **kw: SimpleSparseUNet(
        channels=(32, 64, 128), tr_channels=(64, 64, 64), **kw),
    # PyramidNet hourglass zoo (model/pyramidnet.py:88-193)
    **PYRAMID_MODELS,
    # correspondence encoders
    "PointDSC": PointDSC,
    "OANet": OANet,
}


def load_model(name: str) -> Callable:
    """Resolve a network name to its constructor (ref model/__init__.py)."""
    if name not in MODELS:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODELS)}")
    return MODELS[name]
