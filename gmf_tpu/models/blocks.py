"""Shared correspondence-network building blocks.

Parity: GMF_PointDSC/models/common.py:78-145 — EdgeConv (DGCNN-style),
ContextNormalization (per-sample token-axis whitening), PointCN stack.
Layout is [B, N, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from gmf_tpu.geometry.knn import knn

_xavier = nn.initializers.xavier_normal()


def instance_norm_tokens(x, eps: float = 1e-3):
    """torch InstanceNorm1d equivalent for [B, N, C]: normalize each
    (sample, channel) over the token axis."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class ContextNormalization(nn.Module):
    """Whiten over the token axis (common.py:112-121, var_eps=1e-3).

    NOTE: torch.var defaults to the UNBIASED estimator (ddof=1) — unlike
    torch InstanceNorm1d, which is biased. Verified numerically against
    the reference in tests/test_reference_parity_ops.py.
    """

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True, ddof=1)
        return (x - mean) / jnp.sqrt(var + 1e-3)


class EdgeConv(nn.Module):
    """DGCNN edge convolution (common.py:78-109): per-point kNN in feature
    space, conv over [x_j - x_i, x_i], max over neighbors."""

    out_dim: int
    k: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, N, C]
        B, N, C = x.shape
        idx = knn(x, k=min(self.k, N - 1), normalized=False)  # [B, N, k]
        nbrs = jax.vmap(lambda xb, ib: xb[ib])(x, idx)        # [B, N, k, C]
        center = jnp.broadcast_to(x[:, :, None, :], nbrs.shape)
        feats = jnp.concatenate([nbrs - center, center], axis=-1)
        out = nn.Dense(self.out_dim, use_bias=False, kernel_init=_xavier,
                       name="conv", dtype=self.dtype)(feats)
        return jnp.max(out, axis=2)


class PointCN(nn.Module):
    """Conv1d->CN->BN->ReLU stack (common.py:124-145, act_pos='post')."""

    num_layers: int = 6
    num_channels: int = 128
    act_pos: str = "post"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.act_pos in ("pre", "post")
        x = nn.Dense(self.num_channels, kernel_init=_xavier, name="layer0",
                     dtype=self.dtype)(x)
        for i in range(self.num_layers):
            if self.act_pos == "pre":
                x = ContextNormalization()(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"bn_{i}",
                                 dtype=self.dtype)(x)
                x = nn.relu(x)
                x = nn.Dense(self.num_channels, kernel_init=_xavier,
                             name=f"conv_{i}", dtype=self.dtype)(x)
            else:
                x = nn.Dense(self.num_channels, kernel_init=_xavier,
                             name=f"conv_{i}", dtype=self.dtype)(x)
                x = ContextNormalization()(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"bn_{i}",
                                 dtype=self.dtype)(x)
                x = nn.relu(x)
        return x
