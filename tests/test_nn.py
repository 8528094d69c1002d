"""Tests for fusion layers and image encoder vs NumPy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import erf

from gmf_tpu.nn import FusionLayer, ConvPosEnc, Attention, FeedForward, ImageEncoder


def np_layernorm(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def np_gelu(x):
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def np_softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def np_depthwise_conv1d(x, kernel, bias):
    """x [B,N,C], kernel [k,1,C] (flax layout), bias [C]. SAME padding."""
    k = kernel.shape[0]
    pad = k // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (0, 0)))
    out = np.zeros_like(x)
    for dk in range(k):
        out += xp[:, dk : dk + x.shape[1], :] * kernel[dk, 0, :]
    return out + bias


class TestFusionLayer:
    def setup_method(self):
        self.layer = FusionLayer(
            dim=32, latent_dim=32, depth=0, cross_heads=1,
            cross_dim_head=16, pe=True,
        )
        rng = np.random.RandomState(0)
        self.data = jnp.asarray(rng.randn(2, 12, 32), jnp.float32)  # image tokens
        self.queries = jnp.asarray(rng.randn(2, 20, 32), jnp.float32)
        self.params = self.layer.init(
            jax.random.PRNGKey(0), self.data, self.queries
        )["params"]

    def test_output_shape(self):
        out = self.layer.apply({"params": self.params}, self.data, self.queries)
        assert out.shape == (2, 20, 32)

    def test_matches_numpy_oracle(self):
        """Recompute the full fusion block in NumPy from the flax params."""
        p = jax.tree.map(np.asarray, self.params)
        x = np.asarray(self.queries, np.float64)
        data = np.asarray(self.data, np.float64)

        # LCPE on both streams
        x = np_depthwise_conv1d(x, p["cpe"]["proj_q"]["kernel"], p["cpe"]["proj_q"]["bias"]) + x
        data = np_depthwise_conv1d(
            data, p["cpe"]["proj_content"]["kernel"], p["cpe"]["proj_content"]["bias"]
        ) + data

        # PreNorm cross attention (1 head, dim_head 16)
        xn = np_layernorm(x, p["cross_norm_q"]["scale"], p["cross_norm_q"]["bias"])
        dn = np_layernorm(data, p["cross_norm_ctx"]["scale"], p["cross_norm_ctx"]["bias"])
        q = xn @ p["cross_attn"]["to_q"]["kernel"]
        kv = dn @ p["cross_attn"]["to_kv"]["kernel"]
        k, v = np.split(kv, 2, axis=-1)
        sim = np.einsum("bid,bjd->bij", q, k) * (16 ** -0.5)
        attn = np_softmax(sim)
        out = np.einsum("bij,bjd->bid", attn, v)
        out = out @ p["cross_attn"]["to_out"]["kernel"] + p["cross_attn"]["to_out"]["bias"]
        x = out + x

        # PreNorm GEGLU FF
        xn = np_layernorm(x, p["cross_ff_norm"]["scale"], p["cross_ff_norm"]["bias"])
        h = xn @ p["cross_ff"]["proj_in"]["kernel"] + p["cross_ff"]["proj_in"]["bias"]
        h1, gates = np.split(h, 2, axis=-1)
        h = h1 * np_gelu(gates)
        out = h @ p["cross_ff"]["proj_out"]["kernel"] + p["cross_ff"]["proj_out"]["bias"]
        x = out + x

        got = np.asarray(
            self.layer.apply({"params": self.params}, self.data, self.queries)
        )
        np.testing.assert_allclose(got, x, atol=2e-5)

    def test_mask_excludes_padded_keys(self):
        """Masked-out context tokens must not influence the output.

        Uses pe=False: with LCPE enabled the depthwise conv mixes adjacent
        tokens *before* attention, so masked-key independence only holds
        for the attention itself (padded-batch contract: zero the padded
        inputs, see test_zero_padding_matches_unpadded).
        """
        layer = FusionLayer(dim=32, latent_dim=32, depth=0, cross_heads=1,
                            cross_dim_head=16, pe=False)
        params = layer.init(jax.random.PRNGKey(2), self.data, self.queries)["params"]
        mask = jnp.ones((2, 12))
        mask = mask.at[:, 8:].set(0)
        out_masked = layer.apply({"params": params}, self.data, self.queries,
                                 mask=mask)
        # Perturb the masked tokens wildly — output must be unchanged.
        data2 = self.data.at[:, 8:].set(99.0)
        out_masked2 = layer.apply({"params": params}, data2, self.queries,
                                  mask=mask)
        np.testing.assert_allclose(
            np.asarray(out_masked), np.asarray(out_masked2), atol=1e-5
        )

    def test_zero_padding_matches_unpadded(self):
        """With pe=True, zero-padded queries reproduce the unpadded result
        on valid rows (torch conv1d zero-pads sequence ends identically)."""
        q_short = self.queries[:, :10, :]
        out_short = self.layer.apply({"params": self.params}, self.data, q_short)
        q_padded = jnp.concatenate(
            [q_short, jnp.zeros((2, 6, 32), jnp.float32)], axis=1
        )
        out_padded = self.layer.apply({"params": self.params}, self.data, q_padded)
        np.testing.assert_allclose(
            np.asarray(out_padded[:, :10]), np.asarray(out_short), atol=1e-5
        )

    def test_depth_layers(self):
        layer = FusionLayer(dim=32, latent_dim=32, depth=2, pe=False,
                            latent_heads=2, latent_dim_head=8)
        params = layer.init(jax.random.PRNGKey(1), self.data, self.queries)["params"]
        out = layer.apply({"params": params}, self.data, self.queries)
        assert out.shape == (2, 20, 32)
        assert "self_attn_1" in params


class TestAttentionVariants:
    def test_out_dim_variants(self):
        """PointDSC maps to context_dim; DGR maps to query_dim."""
        rng = jax.random.PRNGKey(0)
        x = jnp.ones((1, 5, 24))
        ctx = jnp.ones((1, 7, 16))
        a1 = Attention(query_dim=24, context_dim=16, heads=1, dim_head=8,
                       out_to_context_dim=True)
        p1 = a1.init(rng, x, ctx)
        assert a1.apply(p1, x, ctx).shape == (1, 5, 16)
        a2 = Attention(query_dim=24, context_dim=16, heads=1, dim_head=8,
                       out_to_context_dim=False)
        p2 = a2.init(rng, x, ctx)
        assert a2.apply(p2, x, ctx).shape == (1, 5, 24)


class TestImageEncoder:
    def test_output_geometry(self):
        """120x160 input -> 15x20x128 tokens (reference: 300 image tokens)."""
        enc = ImageEncoder()
        x = jnp.zeros((1, 120, 160, 3))
        variables = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(variables, x)
        assert out.shape == (1, 15, 20, 128)
        tok = enc.apply(variables, x, method=ImageEncoder.tokens)
        assert tok.shape == (1, 300, 128)

    def test_train_mode_updates_batch_stats(self):
        enc = ImageEncoder()
        x = jnp.ones((2, 32, 32, 3))
        variables = enc.init(jax.random.PRNGKey(0), x)
        out, mutated = enc.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert out.shape == (2, 4, 4, 128)
        assert "batch_stats" in mutated
