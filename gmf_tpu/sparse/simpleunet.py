"""SimpleNet: 3-level sparse UNet without residual blocks.

Parity: GMF_DGR_fcgf/model/simpleunet.py (SimpleNet/SimpleNetBN* zoo) —
conv1(s1) -> conv2(s2) -> conv3(s2) -> conv3_tr(up) -> cat -> conv2_tr(up)
-> cat -> conv1_tr(k3 s1) -> final(1x1), BN + ReLU between, optional
feature L2 normalization. Registered in models/registry.py as the
SimpleNetBN* alternative FCGF backbones.

Uses the same 4-level pyramid builder (levels 0-2 consumed).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import flax.linen as nn

from gmf_tpu.sparse.conv import (
    MaskedBatchNorm, SparseConv, append_sentinel,
)


class SimpleSparseUNet(nn.Module):
    in_channels: int = 1
    out_channels: int = 32
    channels: Sequence[int] = (32, 64, 128)
    tr_channels: Sequence[int] = (32, 64, 64)
    dim: int = 3
    conv1_kernel_size: int = 3
    normalize_feature: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, pyramid: Dict[str, jnp.ndarray],
                 train: bool = False):
        KV = 3 ** self.dim
        KV1 = self.conv1_kernel_size ** self.dim
        C, TR = self.channels, self.tr_channels
        m = [pyramid[f"mask_{l}"] for l in range(3)]

        def conv(x, name, cout, nbr, kept, kv, use_bias=False):
            return SparseConv(cout, kv, use_bias=use_bias, name=name,
                              dtype=self.dtype)(append_sentinel(x), nbr, kept)

        def bn(x, name, mask):
            return MaskedBatchNorm(name=name, dtype=self.dtype)(x, mask, train)

        out_s1 = nn.relu(bn(conv(feats, "conv1", C[0], pyramid["conv1_map"],
                                 pyramid["conv1_kept"], KV1), "norm1", m[0]))
        out_s2 = nn.relu(bn(conv(out_s1, "conv2", C[1],
                                 pyramid["down_map_0"],
                                 pyramid["down_kept_0"], KV), "norm2", m[1]))
        out = nn.relu(bn(conv(out_s2, "conv3", C[2], pyramid["down_map_1"],
                              pyramid["down_kept_1"], KV), "norm3", m[2]))

        out = nn.relu(bn(conv(out, "conv3_tr", TR[2], pyramid["up_map_1"],
                              pyramid["up_kept_1"], KV), "norm3_tr", m[1]))
        out = jnp.concatenate([out, out_s2], axis=-1)
        out = nn.relu(bn(conv(out, "conv2_tr", TR[1], pyramid["up_map_0"],
                              pyramid["up_kept_0"], KV), "norm2_tr", m[0]))
        out = jnp.concatenate([out, out_s1], axis=-1)
        out = nn.relu(bn(conv(out, "conv1_tr", TR[0], pyramid["self_map_0"],
                              pyramid["self_kept_0"], KV), "norm1_tr", m[0]))
        out = nn.Dense(self.out_channels, use_bias=True, name="final",
                       dtype=self.dtype)(out)
        if self.normalize_feature:
            out = out / jnp.sqrt(
                jnp.sum(out ** 2, axis=-1, keepdims=True) + 1e-16)
        return out * m[0][:, None]
