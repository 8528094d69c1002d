"""Device-side sparse convolution: gather -> MXU GEMM -> accumulate.

Replaces MinkowskiConvolution's C++/CUDA kernels (SURVEY.md §2.5). The
feature tensor is [cap + 1, C]: ``cap`` padded voxel rows plus ONE zero
sentinel row at index ``cap`` — gathers of missing neighbors read the
sentinel and contribute exactly zero to the GEMM, so no masking is needed
inside the conv itself.

For each offset k the kernel map gives in-indices [M]; the conv is
   out[j] = sum_k  W_k^T x[nbr[k, j]]
computed as a lax.scan over offset chunks so VMEM/HBM hold one
[chunk, M, Cin] gather at a time (essential for 6-D's hundreds of active
offsets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def append_sentinel(x):
    """Append the zero sentinel row: [cap, C] -> [cap + 1, C]."""
    return jnp.concatenate([x, jnp.zeros((1, x.shape[-1]), x.dtype)], axis=0)


def sparse_conv(x, weights, nbr, chunk: int = 32):
    """Sparse convolution via gather-GEMM-scan.

    Args:
      x: [cap_in + 1, Cin] features WITH sentinel row appended.
      weights: [K, Cin, Cout] kernel weights (offset-major).
      nbr: [K, M] int32 neighbor table (sentinel = cap_in).
      chunk: offsets per scan step.

    Returns:
      [M, Cout] output features (padded rows are garbage-free zeros as
      long as their nbr entries are sentinels, which build_pyramid
      guarantees).
    """
    K, M = nbr.shape
    Cin, Cout = weights.shape[1], weights.shape[2]
    pad = (-K) % chunk
    if pad:
        weights = jnp.concatenate(
            [weights, jnp.zeros((pad, Cin, Cout), weights.dtype)], axis=0)
        nbr = jnp.concatenate(
            [nbr, jnp.full((pad, M), x.shape[0] - 1, nbr.dtype)], axis=0)
    n_chunks = (K + pad) // chunk
    w_c = weights.reshape(n_chunks, chunk, Cin, Cout)
    n_c = nbr.reshape(n_chunks, chunk, M)

    def body(acc, args):
        w, idx = args                       # [chunk,Cin,Cout], [chunk,M]
        g = x[idx]                          # [chunk, M, Cin]  (gather)
        acc = acc + jnp.einsum(
            "kmc,kcd->md", g, w, preferred_element_type=jnp.float32
        )
        return acc, None

    init = jnp.zeros((M, Cout), jnp.float32)
    out, _ = jax.lax.scan(body, init, (w_c, n_c))
    return out.astype(x.dtype)


class SparseConv(nn.Module):
    """Flax wrapper holding the FULL [K_total, Cin, Cout] kernel.

    ``num_offsets`` is the full kernel volume (27 for k3/D3, 729 for
    k3/D6); the kernel map may cover only a pruned subset of offsets, so
    ``kept`` (int32 [K_used]) selects the weight rows to apply. Offsets
    padded into ``kept`` must come with all-sentinel nbr rows (they then
    contribute exactly zero regardless of the weight they alias). This
    keeps parameter shapes static while the active-offset set varies per
    input — the checkpoint layout stays ME-compatible (kernel-volume
    major).

    Bias only on the final 1x1 convs, matching the reference (bias=False
    elsewhere, residual_block.py:20/52).
    """

    out_channels: int
    num_offsets: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_with_sentinel, nbr, kept=None):
        cin = x_with_sentinel.shape[-1]
        # ME initializes kernels with kaiming-uniform over fan = K*Cin.
        init = nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform", in_axis=(0, 1), out_axis=2)
        w = self.param(
            "kernel", init, (self.num_offsets, cin, self.out_channels),
            self.dtype)
        if kept is not None:
            w = w[kept]
        out = sparse_conv(x_with_sentinel, w, nbr)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.out_channels,), self.dtype)
            out = out + b
        return out


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid voxels only (ME BN normalizes over all voxels;
    with padded capacities the statistics must ignore padding)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        """x: [cap, C]; mask: [cap] validity."""
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), self.dtype))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), self.dtype))
        scale = self.param("scale", nn.initializers.ones, (C,), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,), self.dtype)

        if train:
            m = mask[:, None].astype(x.dtype)
            n = jnp.sum(m) + 1e-6
            mean = jnp.sum(x * m, axis=0) / n
            var = jnp.sum(((x - mean) ** 2) * m, axis=0) / n
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y * mask[:, None].astype(x.dtype)


class MaskedInstanceNorm(nn.Module):
    """Per-channel normalization over the valid voxels of one instance.

    Parity: ME.MinkowskiInstanceNorm as used in the reference's 'INBN'
    norm (model/common.py:16-19) — always immediately followed by an
    affine BatchNorm there, so this is non-affine.
    """

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        """x: [cap, C]; mask: [cap] validity."""
        m = mask[:, None].astype(x.dtype)
        n = jnp.sum(m) + 1e-6
        mean = jnp.sum(x * m, axis=0) / n
        var = jnp.sum(((x - mean) ** 2) * m, axis=0) / n
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * m
