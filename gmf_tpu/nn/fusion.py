"""GMF fusion layers: PerceiverIO-style cross-attention + LCPE.

Parity targets (SURVEY.md §2.1 F1/F2):
- GMF_PointDSC/models/fusion_layer.py:32-201 (FusionLayer, Attention,
  PreNorm, GEGLU/FeedForward, ConvPosEnc)
- GMF_DGR_fcgf/model/perceiver_io.py:71-221 (identical structure; only
  difference: Attention.to_out maps to query_dim instead of context_dim —
  see the ``out_to_context_dim`` switch, SURVEY.md §2.1 note).

Semantics reproduced exactly:
- PreNorm(LayerNorm eps=1e-5) on the query stream, and on the context
  stream only for cross-attention.
- single-head cross-attention with scale = dim_head**-0.5; K/V from one
  fused Linear (no bias); output Linear with bias.
- FeedForward: Linear(dim -> dim*mult*2) -> GEGLU (x * gelu_exact(gates))
  -> Linear(dim*mult -> dim).
- LCPE: depthwise Conv1d k=3 'SAME', residual, applied to BOTH query and
  content streams, only when ``pe=True`` (Fusion-2).
- FusionLayer.forward: optional LCPE -> cross-attn + residual -> FF +
  residual -> depth x (self-attn + residual, FF + residual). depth=0 in
  every reference config.

Layout is [B, N, C] (tokens-last-channel) throughout: TPU-friendly, lets
XLA fuse the LayerNorm/GEGLU elementwise chains into the matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def gelu_exact(x):
    """Exact (erf) GELU — torch.nn.functional.gelu default."""
    return jax.nn.gelu(x, approximate=False)


class Attention(nn.Module):
    """Multi-head (cross-)attention matching the reference's ``Attention``.

    Parity: fusion_layer.py:71-94 / perceiver_io.py:71-95.
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    out_to_context_dim: bool = True  # PointDSC variant; DGR uses False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        h, d = self.heads, self.dim_head
        inner = h * d
        ctx_dim = self.context_dim if self.context_dim is not None else self.query_dim
        out_dim = ctx_dim if self.out_to_context_dim else self.query_dim

        context = x if context is None else context
        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(x)
        kv = nn.Dense(2 * inner, use_bias=False, name="to_kv", dtype=self.dtype)(context)
        k, v = jnp.split(kv, 2, axis=-1)

        B, Nq, _ = q.shape
        Nk = k.shape[1]
        q = q.reshape(B, Nq, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, Nk, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, Nk, h, d).transpose(0, 2, 1, 3)

        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * (d ** -0.5)
        if mask is not None:
            # mask: [B, Nk] key-validity for padded batches (absent in the
            # reference, which never pads).
            sim = jnp.where(mask[:, None, None, :] > 0, sim, -1e9)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, inner)
        return nn.Dense(out_dim, name="to_out", dtype=self.dtype)(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward. Parity: fusion_layer.py:54-69."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim * self.mult * 2, name="proj_in", dtype=self.dtype)(x)
        x, gates = jnp.split(x, 2, axis=-1)
        x = x * gelu_exact(gates)
        return nn.Dense(self.dim, name="proj_out", dtype=self.dtype)(x)


class ConvPosEnc(nn.Module):
    """LCPE: depthwise Conv1d k=3 residual on query & content streams.

    Parity: fusion_layer.py:97-128 (F2). Inputs are [B, N, C].
    """

    dim_q: int
    dim_content: int
    k: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, content):
        conv_q = nn.Conv(
            self.dim_q, (self.k,), padding="SAME",
            feature_group_count=self.dim_q, name="proj_q", dtype=self.dtype,
        )
        conv_c = nn.Conv(
            self.dim_content, (self.k,), padding="SAME",
            feature_group_count=self.dim_content, name="proj_content",
            dtype=self.dtype,
        )
        return conv_q(q) + q, conv_c(content) + content


class FusionLayer(nn.Module):
    """Cross-attention fusion block (the GMF contribution).

    Query stream = point/correspondence features [B, Nq, latent_dim];
    context stream = image tokens [B, Nk, dim]. ``pe=True`` enables LCPE
    (Fusion-2 wiring); ``depth`` adds self-attention layers (0 in all
    reference configs).

    Parity: fusion_layer.py:131-201 / perceiver_io.py:139-221.
    """

    dim: int                      # image/context channels
    latent_dim: int = 512         # point-cloud/query channels
    depth: int = 0
    cross_heads: int = 1
    latent_heads: int = 8
    cross_dim_head: int = 64
    latent_dim_head: int = 64
    pe: bool = False
    out_to_context_dim: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, data, queries_encoder, mask=None):
        x = queries_encoder

        if self.pe:
            x, data = ConvPosEnc(
                dim_q=self.latent_dim, dim_content=self.dim, name="cpe",
                dtype=self.dtype,
            )(x, data)

        # Cross-attention with PreNorm on both streams + residual.
        xn = nn.LayerNorm(epsilon=1e-5, name="cross_norm_q", dtype=self.dtype)(x)
        dn = nn.LayerNorm(epsilon=1e-5, name="cross_norm_ctx", dtype=self.dtype)(data)
        x = Attention(
            query_dim=self.latent_dim, context_dim=self.dim,
            heads=self.cross_heads, dim_head=self.cross_dim_head,
            out_to_context_dim=self.out_to_context_dim, name="cross_attn",
            dtype=self.dtype,
        )(xn, context=dn, mask=mask) + x

        xn = nn.LayerNorm(epsilon=1e-5, name="cross_ff_norm", dtype=self.dtype)(x)
        x = FeedForward(self.latent_dim, name="cross_ff", dtype=self.dtype)(xn) + x

        for i in range(self.depth):
            xn = nn.LayerNorm(epsilon=1e-5, name=f"self_norm_{i}", dtype=self.dtype)(x)
            x = Attention(
                query_dim=self.latent_dim, heads=self.latent_heads,
                dim_head=self.latent_dim_head, out_to_context_dim=False,
                name=f"self_attn_{i}", dtype=self.dtype,
            )(xn) + x
            xn = nn.LayerNorm(epsilon=1e-5, name=f"self_ff_norm_{i}", dtype=self.dtype)(x)
            x = FeedForward(self.latent_dim, name=f"self_ff_{i}", dtype=self.dtype)(xn) + x

        return x
