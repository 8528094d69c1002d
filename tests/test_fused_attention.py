"""Pallas compat-flash-attention vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gmf_tpu.ops.fused_attention import (
    compat_flash_attention, compat_attention_reference,
)


def make_inputs(rng, N=300, D=128):
    q = rng.randn(N, D).astype(np.float32) * 0.2
    k = rng.randn(N, D).astype(np.float32) * 0.2
    v = rng.randn(N, D).astype(np.float32)
    s = rng.rand(N, 3).astype(np.float32) * 2
    t = rng.rand(N, 3).astype(np.float32) * 2
    return map(jnp.asarray, (q, k, v, s, t))


class TestCompatFlashAttention:
    def test_matches_reference(self, rng):
        q, k, v, s, t = make_inputs(rng)
        ref = compat_attention_reference(q, k, v, s, t, sigma_d=0.3)
        got = compat_flash_attention(q, k, v, s, t, sigma_d=0.3,
                                     block_q=128, block_k=128,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    def test_non_divisible_n(self, rng):
        q, k, v, s, t = make_inputs(rng, N=275)
        ref = compat_attention_reference(q, k, v, s, t, sigma_d=0.2)
        got = compat_flash_attention(q, k, v, s, t, sigma_d=0.2,
                                     block_q=128, block_k=128,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    def test_masked(self, rng):
        q, k, v, s, t = make_inputs(rng, N=256)
        mask = jnp.asarray((np.arange(256) < 200).astype(np.float32))
        ref = compat_attention_reference(q, k, v, s, t, mask=mask,
                                         sigma_d=0.2)
        got = compat_flash_attention(q, k, v, s, t, mask=mask, sigma_d=0.2,
                                     block_q=128, block_k=128,
                                     interpret=True)
        # only valid queries matter
        np.testing.assert_allclose(np.asarray(got)[:200],
                                   np.asarray(ref)[:200], atol=2e-4)
