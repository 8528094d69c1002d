"""PyramidNet: recursive hourglass sparse conv net (FCGF backbone variant).

Parity: GMF_DGR_fcgf/model/pyramidnet.py:1-193 —
- stem ``conv_norm_non(in, CH[0], k=conv1_kernel_size, s=1)`` (BN + ELU);
- a nest of PyramidModules, one per level: stride-2 conv (CH[d-1]->CH[d])
  + norm + ELU, then DEPTHS[d] BasicBlocks (these use ReLU, like all
  reference residual blocks — residual_block.py:120-131), recurse, then a
  stride-2 transpose conv (TR[d]->TR[d]) + norm + ELU, ``ME.cat(x, y)``
  with the module input FIRST, and a 1x1 ``cat_conv`` (TR[d]+CH[d-1] ->
  TR[d-1]) + norm + ELU;
- final: conv_norm_non(TR[0], TR[0], k=3) then a bias-free 1x1 conv to
  ``out_channels`` (the reference's ``conv()`` helper never forwards its
  bias arg, and ME defaults to bias=False);
- optional feature L2 normalization (pyramidnet.py:156-161).

Norm types: 'BN' (MaskedBatchNorm) and 'INBN' (masked instance norm then
BN — model/common.py:16-19). Depth-0 variants skip the residual blocks.

TPU-first: implemented iteratively (descend, then ascend) over the same
static padded kernel maps as the ResUNet family — the recursion in the
reference is just an hourglass traversal.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import flax.linen as nn

from gmf_tpu.sparse.conv import (
    MaskedBatchNorm, MaskedInstanceNorm, SparseConv, append_sentinel,
)
from gmf_tpu.sparse.resunet import SparseBasicBlock


class SparsePyramidNet(nn.Module):
    """PyramidNet / PyramidNet6 / PyramidNet8 geometry (+ INBN variants).

    Consumes a ``len(channels)``-level pyramid from
    ``kernel_map.build_pyramid`` (via ``resunet.pyramid_to_arrays``).
    """

    in_channels: int = 3
    out_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 128)
    tr_channels: Sequence[int] = (64, 128, 128, 128)
    depths: Sequence[int] = (1, 1, 1, 1)
    dim: int = 3
    conv1_kernel_size: int = 3
    normalize_feature: bool = False
    norm: str = "bn"              # "bn" | "inbn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, pyramid: Dict[str, jnp.ndarray],
                 train: bool = False):
        """feats: [cap0, in_channels]; pyramid: pyramid_to_arrays output."""
        C, TR, D = self.channels, self.tr_channels, self.depths
        L = len(C)
        assert len(TR) == L and len(D) == L
        # The innermost convtr's in_channels come from the innermost conv
        # (pyramidnet.py:52-57 with inner_module=None).
        assert C[-1] == TR[-1], "innermost CHANNELS/TR_CHANNELS must match"
        KV = 3 ** self.dim
        KV1 = self.conv1_kernel_size ** self.dim
        m = [pyramid[f"mask_{l}"] for l in range(L)]

        def conv(x, name, cout, nbr, kept, kv):
            return SparseConv(cout, kv, use_bias=False, name=name,
                              dtype=self.dtype)(append_sentinel(x), nbr, kept)

        def norm_elu(x, name, mask):
            if self.norm == "inbn":
                x = MaskedInstanceNorm(dtype=self.dtype)(x, mask)
            x = MaskedBatchNorm(name=f"{name}_bn", dtype=self.dtype)(
                x, mask, train)
            return nn.elu(x)

        # ---- stem (conv_norm_non, level 0) ----
        x = conv(feats, "conv1", C[0], pyramid["conv1_map"],
                 pyramid["conv1_kept"], KV1)
        x = norm_elu(x, "norm1", m[0])

        # ---- descend: stride-2 conv + blocks per level ----
        skips = [x]
        for d in range(1, L):
            x = conv(x, f"down{d}", C[d], pyramid[f"down_map_{d - 1}"],
                     pyramid[f"down_kept_{d - 1}"], KV)
            x = norm_elu(x, f"down{d}_norm", m[d])
            for b in range(D[d]):
                x = SparseBasicBlock(
                    C[d], KV, name=f"block{d}_{b}", dtype=self.dtype,
                )(x, m[d], pyramid[f"self_map_{d}"],
                  pyramid[f"self_kept_{d}"], train)
            if d < L - 1:
                skips.append(x)

        # ---- ascend: convtr + cat(skip, y) + 1x1 cat_conv per level ----
        y = x
        for d in range(L - 1, 0, -1):
            y = conv(y, f"up{d}", TR[d], pyramid[f"up_map_{d - 1}"],
                     pyramid[f"up_kept_{d - 1}"], KV)
            y = norm_elu(y, f"up{d}_norm", m[d - 1])
            y = jnp.concatenate([skips[d - 1], y], axis=-1)  # ME.cat(x, y)
            y = nn.Dense(TR[d - 1], use_bias=False, name=f"cat_conv{d}",
                         dtype=self.dtype)(y)
            y = norm_elu(y, f"cat_conv{d}_norm", m[d - 1])

        # ---- final: conv_norm_non k=3 then bias-free 1x1 ----
        y = conv(y, "final_conv", TR[0], pyramid["self_map_0"],
                 pyramid["self_kept_0"], KV)
        y = norm_elu(y, "final_norm", m[0])
        y = nn.Dense(self.out_channels, use_bias=False, name="final",
                     dtype=self.dtype)(y)

        if self.normalize_feature:
            y = y / (jnp.sqrt(
                jnp.sum(y ** 2, axis=-1, keepdims=True) + 1e-16) + 1e-8)
        return y * m[0][:, None]


def _preset(channels, tr_channels, depths, norm="bn"):
    def make(in_channels=3, out_channels=32, dim=3, conv1_kernel_size=3,
             normalize_feature=False, **kw):
        return SparsePyramidNet(
            in_channels=in_channels, out_channels=out_channels, dim=dim,
            conv1_kernel_size=conv1_kernel_size,
            normalize_feature=normalize_feature, channels=channels,
            tr_channels=tr_channels, depths=depths, norm=norm, **kw)

    return make


# Class table from pyramidnet.py:88-193.
_CH4 = (32, 64, 128, 128)
_TR4 = (64, 128, 128, 128)
_CH6 = (32, 64, 128, 192, 256, 256)
_TR6 = (64, 128, 192, 192, 256, 256)
_CH8 = (32, 64, 128, 128, 192, 192, 256, 256)
_TR8 = (64, 128, 128, 192, 192, 192, 256, 256)

PYRAMID_MODELS = {
    "PyramidNet": _preset(_CH4, _TR4, (1,) * 4),
    "PyramidNet6": _preset(_CH6, _TR6, (1,) * 6),
    "PyramidNet6NoBlock": _preset(_CH6, _TR6, (0,) * 6),
    "PyramidNet6INBN": _preset(_CH6, _TR6, (1,) * 6, norm="inbn"),
    "PyramidNet6INBNNoBlock": _preset(_CH6, _TR6, (0,) * 6, norm="inbn"),
    "PyramidNet8": _preset(_CH8, _TR8, (1,) * 8),
    "PyramidNet8INBN": _preset(_CH8, _TR8, (1,) * 8, norm="inbn"),
}
