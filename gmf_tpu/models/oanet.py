"""OANet: Order-Aware correspondence encoder (alternative baseline).

Parity: GMF_PointDSC/models/OANet.py:7-156 — diff_pool / diff_unpool
cluster bottleneck, OAFilter blocks with the Spatial Correlation Layer,
PointCN-style trunk with ContextNormalization. The reference's forward is
truncated to return features (:146-156); we keep that contract and also
expose the logits head.

Layout: [B, N, C] token-last (the reference is channel-first); torch
InstanceNorm1d(C) over the token axis == per-(sample, channel)
normalization over N.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from gmf_tpu.models.blocks import ContextNormalization, instance_norm_tokens

_xavier = nn.initializers.xavier_normal()


class DiffPool(nn.Module):
    """Soft cluster pooling (ref :7-21): S = softmax over tokens."""

    output_points: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, N, C] -> [B, K, C]
        h = instance_norm_tokens(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn", dtype=self.dtype)(h)
        h = nn.relu(h)
        embed = nn.Dense(self.output_points, kernel_init=_xavier,
                         name="proj", dtype=self.dtype)(h)  # [B, N, K]
        # softmax over tokens (ref dim=2 on channel-first == token axis)
        S = nn.softmax(embed, axis=1)
        return jnp.einsum("bnc,bnk->bkc", x, S)


class DiffUnpool(nn.Module):
    """Soft cluster unpooling (ref :23-39)."""

    output_points: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_up, x_down, train: bool = False):
        # x_up: [B, N, C], x_down: [B, K, C] -> [B, N, C]
        h = instance_norm_tokens(x_up)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn", dtype=self.dtype)(h)
        h = nn.relu(h)
        embed = nn.Dense(self.output_points, kernel_init=_xavier,
                         name="proj", dtype=self.dtype)(h)  # [B, N, K]
        S = nn.softmax(embed, axis=2)  # softmax over clusters (ref dim=1)
        return jnp.einsum("bkc,bnk->bnc", x_down, S)


class OAFilter(nn.Module):
    """Order-aware filter block over the cluster axis (ref :51-86)."""

    channels: int
    points: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, K, C]
        h = instance_norm_tokens(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1", dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dense(self.channels, kernel_init=_xavier, name="conv1",
                     dtype=self.dtype)(h)
        # Spatial Correlation Layer: mix across the K cluster positions.
        g = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2",
                         dtype=self.dtype)(jnp.swapaxes(h, 1, 2))
        g = nn.relu(g)
        g = nn.Dense(self.points, kernel_init=_xavier, name="conv2",
                     dtype=self.dtype)(g)
        h = h + jnp.swapaxes(g, 1, 2)
        o = instance_norm_tokens(h)
        o = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn3", dtype=self.dtype)(o)
        o = nn.relu(o)
        o = nn.Dense(self.channels, kernel_init=_xavier, name="conv3",
                     dtype=self.dtype)(o)
        return o + x


class OANet(nn.Module):
    """Order-aware encoder (ref :89-156)."""

    in_dim: int = 6
    num_layers: int = 6
    num_channels: int = 128
    num_clusters: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, corr_pos, train: bool = False,
                 return_logits: bool = False):
        C = self.num_channels

        def pointcn_stack(x, n_layers, name):
            for i in range(n_layers):
                x = nn.Dense(C, kernel_init=_xavier,
                             name=f"{name}_conv_{i}", dtype=self.dtype)(x)
                x = ContextNormalization()(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"{name}_bn_{i}",
                                 dtype=self.dtype)(x)
                x = nn.relu(x)
            return x

        x = nn.Dense(C, kernel_init=_xavier, name="layer0",
                     dtype=self.dtype)(corr_pos)
        x1_1 = pointcn_stack(x, self.num_layers // 2, "l1_1")
        x_down = DiffPool(self.num_clusters, name="down1",
                          dtype=self.dtype)(x1_1, train)
        x2 = x_down
        for i in range(self.num_layers // 2):
            x2 = OAFilter(C, self.num_clusters, name=f"oa_{i}",
                          dtype=self.dtype)(x2, train)
        x_up = DiffUnpool(self.num_clusters, name="up1",
                          dtype=self.dtype)(x1_1, x2, train)

        h = nn.Dense(C, kernel_init=_xavier, name="l1_2_in",
                     dtype=self.dtype)(
            jnp.concatenate([x1_1, x_up], axis=-1))
        out = pointcn_stack(h, self.num_layers // 2 - 1, "l1_2")
        # head is always constructed so params exist regardless of the flag
        logits = nn.Dense(1, kernel_init=_xavier, name="output",
                          dtype=self.dtype)(out)[..., 0]
        return logits if return_logits else out
