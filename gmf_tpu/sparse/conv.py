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


def sparse_conv_compact(x, weights, schedule, out_rows: int,
                        row_budget: int = 1 << 16,
                        scatter_mode: str = "flat"):
    """Two-tier compacted sparse convolution (see sparse/compact.py).

    Args:
      x: [cap_in + 1, Cin] features WITH sentinel row appended.
      weights: [K_total, Cin, Cout] FULL kernel (kept ids select rows).
      schedule: {"dense": (nbr [Kd, M], kept [Kd]) | None,
                 "groups": ((in_idx, out_idx, kept [Kg]), ...)}.
      out_rows: M (static) — output capacity; group out_idx pads point at
        the trash row ``out_rows`` which is sliced off at the end.
      row_budget: max gathered rows per scan step (VMEM bound).
      scatter_mode: 'flat' (chunked scan, one colliding scatter-add per
        step) or 'rowwise' (one offset per step, unique_indices scatter —
        padded slots all hit the trash row, whose value is discarded).

    Returns [M, Cout] float32-accumulated output, cast to x.dtype.
    """
    Cout = weights.shape[2]
    acc = jnp.zeros((out_rows + 1, Cout), jnp.float32)
    if schedule["dense"] is not None:
        nbr, kept = schedule["dense"]
        acc = acc.at[:out_rows].add(
            sparse_conv(x, weights[kept], nbr).astype(jnp.float32))
    for in_idx, out_idx, kept in schedule["groups"]:
        Kg, L = in_idx.shape
        w = weights[kept]
        if scatter_mode == "rowwise":
            chunk = 1
        else:
            chunk = max(1, min(Kg, row_budget // max(L, 1)))
        pad = (-Kg) % chunk
        if pad:
            in_idx = jnp.concatenate(
                [in_idx, jnp.full((pad, L), x.shape[0] - 1, jnp.int32)], 0)
            out_idx = jnp.concatenate(
                [out_idx, jnp.full((pad, L), out_rows, jnp.int32)], 0)
            w = jnp.concatenate(
                [w, jnp.zeros((pad,) + w.shape[1:], w.dtype)], 0)
        n_chunks = (Kg + pad) // chunk
        i_c = in_idx.reshape(n_chunks, chunk, L)
        o_c = out_idx.reshape(n_chunks, chunk * L)
        w_c = w.reshape((n_chunks, chunk) + w.shape[1:])

        def body(a, args):
            ii, oo, ww = args
            g = x[ii]                                  # [chunk, L, Cin]
            z = jnp.einsum("klc,kcd->kld", g, ww,
                           preferred_element_type=jnp.float32)
            if scatter_mode == "rowwise":
                # real indices are unique per offset row; only padded
                # slots collide (all at the trash row, value discarded)
                a = a.at[oo].add(z.reshape(-1, z.shape[-1]),
                                 unique_indices=True)
            else:
                a = a.at[oo].add(z.reshape(-1, z.shape[-1]))
            return a, None

        acc, _ = jax.lax.scan(body, acc, (i_c, o_c, w_c))
    return acc[:out_rows].astype(x.dtype)


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
    def __call__(self, x_with_sentinel, nbr, kept=None, out_rows=None):
        """nbr: dense [K', M] map (with ``kept`` weight ids), or a compact
        schedule dict (sparse/compact.py) — then ``out_rows`` must give
        the static output capacity M."""
        cin = x_with_sentinel.shape[-1]
        # ME initializes kernels with kaiming-uniform over fan = K*Cin.
        init = nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform", in_axis=(0, 1), out_axis=2)
        w = self.param(
            "kernel", init, (self.num_offsets, cin, self.out_channels),
            self.dtype)
        if isinstance(nbr, dict):
            out = sparse_conv_compact(x_with_sentinel, w, nbr, out_rows)
        else:
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
