"""Ring attention over the 8-device mesh vs single-device reference."""

import numpy as np
import jax
import jax.numpy as jnp

from gmf_tpu.ops.fused_attention import compat_attention_reference
from gmf_tpu.parallel.mesh import make_mesh
from gmf_tpu.parallel.ring_attention import ring_compat_attention


def test_ring_matches_reference(rng):
    N, D = 256, 64  # N divisible by 8 devices
    q = jnp.asarray(rng.randn(N, D) * 0.2, jnp.float32)
    k = jnp.asarray(rng.randn(N, D) * 0.2, jnp.float32)
    v = jnp.asarray(rng.randn(N, D), jnp.float32)
    s = jnp.asarray(rng.rand(N, 3) * 2, jnp.float32)
    t = jnp.asarray(rng.rand(N, 3) * 2, jnp.float32)
    mask = jnp.ones((N,), jnp.float32)

    mesh = make_mesh()  # 8 x 1
    got = ring_compat_attention(q, k, v, s, t, mask, mesh, sigma_d=0.3)
    ref = compat_attention_reference(q, k, v, s, t, sigma_d=0.3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


def test_ring_masked(rng):
    N, D = 128, 32
    q = jnp.asarray(rng.randn(N, D) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(N, D) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(N, D), jnp.float32)
    s = jnp.asarray(rng.rand(N, 3), jnp.float32)
    t = jnp.asarray(rng.rand(N, 3), jnp.float32)
    mask = jnp.asarray((np.arange(N) < 100).astype(np.float32))

    mesh = make_mesh()
    got = ring_compat_attention(q, k, v, s, t, mask, mesh, sigma_d=0.2)
    ref = compat_attention_reference(q, k, v, s, t, mask=mask, sigma_d=0.2)
    np.testing.assert_allclose(np.asarray(got)[:100],
                               np.asarray(ref)[:100], atol=5e-4)
