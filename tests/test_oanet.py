"""OANet / shared blocks tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gmf_tpu.models.oanet import OANet, DiffPool, DiffUnpool, OAFilter
from gmf_tpu.models.blocks import (
    ContextNormalization, EdgeConv, PointCN, instance_norm_tokens,
)


class TestBlocks:
    def test_context_normalization(self, rng):
        x = jnp.asarray(rng.randn(2, 50, 8), jnp.float32)
        out = ContextNormalization().apply({}, x)
        m = np.asarray(out).mean(1)
        np.testing.assert_allclose(m, 0.0, atol=1e-5)

    def test_instance_norm(self, rng):
        x = jnp.asarray(rng.randn(2, 30, 4) * 5 + 3, jnp.float32)
        out = np.asarray(instance_norm_tokens(x))
        np.testing.assert_allclose(out.mean(1), 0.0, atol=1e-4)
        np.testing.assert_allclose(out.var(1), 1.0, atol=0.05)

    def test_edgeconv(self, rng):
        x = jnp.asarray(rng.randn(2, 40, 8), jnp.float32)
        m = EdgeConv(out_dim=16, k=5)
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (2, 40, 16)

    def test_pointcn(self, rng):
        x = jnp.asarray(rng.randn(2, 40, 6), jnp.float32)
        m = PointCN(num_layers=2, num_channels=32)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (2, 40, 32)


class TestOANet:
    def test_forward_shapes(self, rng):
        x = jnp.asarray(rng.randn(2, 100, 6), jnp.float32)
        model = OANet(num_layers=4, num_channels=32, num_clusters=8)
        v = model.init(jax.random.PRNGKey(0), x)
        feats = model.apply(v, x)
        assert feats.shape == (2, 100, 32)
        logits = model.apply(v, x, return_logits=True)
        assert logits.shape == (2, 100)

    def test_pool_unpool_shapes(self, rng):
        x = jnp.asarray(rng.randn(2, 60, 16), jnp.float32)
        pool = DiffPool(output_points=5)
        pv = pool.init(jax.random.PRNGKey(0), x)
        down = pool.apply(pv, x)
        assert down.shape == (2, 5, 16)
        up = DiffUnpool(output_points=5)
        uv = up.init(jax.random.PRNGKey(1), x, down)
        back = up.apply(uv, x, down)
        assert back.shape == (2, 60, 16)

    def test_oafilter_residual(self, rng):
        x = jnp.asarray(rng.randn(2, 8, 16), jnp.float32)
        f = OAFilter(channels=16, points=8)
        v = f.init(jax.random.PRNGKey(0), x)
        out = f.apply(v, x)
        assert out.shape == x.shape
