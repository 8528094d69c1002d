"""Pallas compat-flash-attention vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gmf_tpu.ops.fused_attention import (
    build_compat_cache, compat_flash_attention, compat_attention_reference,
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

    def test_block_between_bq_and_bk(self, rng):
        """Regression: with bq < N < bk the blocks used to be clamped to
        N, stop dividing the padded size, and the grid silently dropped
        query rows past bq (NaN output at N=300 with 256/512 blocks)."""
        for N, bq, bk in [(300, 256, 512), (700, 512, 1024)]:
            q, k, v, s, t = make_inputs(rng, N=N)
            ref = compat_attention_reference(q, k, v, s, t, sigma_d=0.2)
            got = compat_flash_attention(q, k, v, s, t, sigma_d=0.2,
                                         block_q=bq, block_k=bk,
                                         interpret=True)
            assert np.all(np.isfinite(np.asarray(got))), (N, bq, bk)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-4, err_msg=f"N={N}")

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


class TestCompatCache:
    """Cached-compat mode: build_compat_cache + compat= flash path."""

    def test_cache_values_match_dense(self, rng):
        _, _, _, s, t = make_inputs(rng, N=300)
        cache = build_compat_cache(s, t, sigma_d=0.2, dtype=jnp.float32,
                                   block_q=128, block_k=128, interpret=True)
        ds = jnp.linalg.norm(s[:, None] - s[None], axis=-1)
        dt = jnp.linalg.norm(t[:, None] - t[None], axis=-1)
        dense = jnp.maximum(1.0 - (ds - dt) ** 2 / 0.2 ** 2, 0.0)
        np.testing.assert_allclose(np.asarray(cache)[:300, :300],
                                   np.asarray(dense), atol=1e-5)

    def test_cached_forward_matches_reference(self, rng):
        for N in (256, 300):
            q, k, v, s, t = make_inputs(rng, N=N)
            cache = build_compat_cache(s, t, sigma_d=0.3, dtype=jnp.float32,
                                       block_q=128, block_k=128,
                                       interpret=True)
            ref = compat_attention_reference(q, k, v, s, t, sigma_d=0.3)
            got = compat_flash_attention(q, k, v, None, None, compat=cache,
                                         block_q=128, block_k=128,
                                         interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-4, err_msg=f"N={N}")

    def test_cached_forward_masked(self, rng):
        N = 300
        q, k, v, s, t = make_inputs(rng, N=N)
        mask = jnp.asarray((np.arange(N) < 240).astype(np.float32))
        cache = build_compat_cache(s, t, sigma_d=0.2, dtype=jnp.float32,
                                   block_q=128, block_k=128, interpret=True)
        ref = compat_attention_reference(q, k, v, s, t, mask=mask,
                                         sigma_d=0.2)
        got = compat_flash_attention(q, k, v, None, None, mask=mask,
                                     compat=cache, block_q=128, block_k=128,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got)[:240],
                                   np.asarray(ref)[:240], atol=2e-4)

    def test_bf16_cache_close(self, rng):
        """bf16 cache (the TPU default) stays within ~bf16 rounding of the
        dense reference output."""
        q, k, v, s, t = make_inputs(rng, N=256)
        cache = build_compat_cache(s, t, sigma_d=0.3, dtype=jnp.bfloat16,
                                   block_q=128, block_k=128, interpret=True)
        ref = compat_attention_reference(q, k, v, s, t, sigma_d=0.3)
        got = compat_flash_attention(q, k, v, None, None, compat=cache,
                                     block_q=128, block_k=128,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-2)

    def test_int8_cache_close(self, rng):
        """int8 cache (offset-quantized, dequantized in-kernel) stays
        within the bf16 tolerance of the dense reference — max abs
        dequant error 1/508 matches bf16's ulp/2 near 1.0."""
        q, k, v, s, t = make_inputs(rng, N=256)
        cache = build_compat_cache(s, t, sigma_d=0.3, dtype=jnp.int8,
                                   block_q=128, block_k=128, interpret=True)
        assert cache.dtype == jnp.int8
        ref = compat_attention_reference(q, k, v, s, t, sigma_d=0.3)
        got = compat_flash_attention(q, k, v, None, None, compat=cache,
                                     block_q=128, block_k=128,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-2)

    def test_int8_cache_quantization_exact(self, rng):
        """int8 cache dequantizes to within half a quantization step of
        the dense compat matrix."""
        _, _, _, s, t = make_inputs(rng, N=300)
        cache = build_compat_cache(s, t, sigma_d=0.2, dtype=jnp.int8,
                                   block_q=128, block_k=128, interpret=True)
        deq = (np.asarray(cache, np.float32)[:300, :300] + 127.0) / 254.0
        ds = jnp.linalg.norm(s[:, None] - s[None], axis=-1)
        dt = jnp.linalg.norm(t[:, None] - t[None], axis=-1)
        dense = np.asarray(jnp.maximum(1.0 - (ds - dt) ** 2 / 0.2 ** 2, 0.0))
        assert np.abs(deq - dense).max() <= 0.5 / 254.0 + 1e-5

    def test_int8_cache_grads_flow(self, rng):
        """q/k/v grads through an int8 cache match the reference (the
        cache itself is stop-gradient by contract)."""
        N = 300
        q, k, v, s, t = make_inputs(rng, N=N)
        mask = jnp.asarray((np.arange(N) < 250).astype(np.float32))
        cache = build_compat_cache(s, t, sigma_d=0.25, dtype=jnp.int8,
                                   block_q=128, block_k=128, interpret=True)

        def loss(fn):
            def inner(q, k, v):
                out = fn(q, k, v)
                return jnp.sum(out ** 2 * mask[:, None])
            return inner

        got = jax.grad(loss(lambda q, k, v: compat_flash_attention(
            q, k, v, None, None, mask=mask, compat=cache, block_q=128,
            block_k=128, interpret=True)), argnums=(0, 1, 2))(q, k, v)
        ref = jax.grad(loss(lambda q, k, v: compat_attention_reference(
            q, k, v, s, t, mask=mask, sigma_d=0.25)),
            argnums=(0, 1, 2))(q, k, v)
        for g, r, name in zip(got, ref, "qkv"):
            assert np.isfinite(np.asarray(g)).all(), f"d{name} not finite"
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=5e-3, err_msg=f"d{name}")

    def test_shape_mismatch_rejected(self, rng):
        q, k, v, s, t = make_inputs(rng, N=300)
        cache = build_compat_cache(s, t, block_q=64, block_k=64,
                                   interpret=True)  # Np=320, not 384
        with pytest.raises(ValueError, match="compat cache shape"):
            compat_flash_attention(q, k, v, None, None, compat=cache,
                                   block_q=128, block_k=128, interpret=True)

    def test_cached_grads_match_reference(self, rng):
        N = 300
        q, k, v, s, t = make_inputs(rng, N=N)
        mask = jnp.asarray((np.arange(N) < 250).astype(np.float32))
        cache = build_compat_cache(s, t, sigma_d=0.25, dtype=jnp.float32,
                                   block_q=128, block_k=128, interpret=True)

        def loss(fn):
            def inner(q, k, v):
                out = fn(q, k, v)
                w = jnp.arange(out.shape[0])[:, None] * 0.01 + 1.0
                return jnp.sum(out * w * mask[:, None])
            return inner

        got = jax.grad(loss(lambda q, k, v: compat_flash_attention(
            q, k, v, None, None, mask=mask, compat=cache, block_q=128,
            block_k=128, interpret=True)), argnums=(0, 1, 2))(q, k, v)
        ref = jax.grad(loss(lambda q, k, v: compat_attention_reference(
            q, k, v, s, t, mask=mask, sigma_d=0.25)),
            argnums=(0, 1, 2))(q, k, v)
        for g, r, name in zip(got, ref, "qkv"):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=3e-4, err_msg=f"d{name}")


class TestFlashBackward:
    """custom_vjp flash backward vs XLA-reference gradients (interpret)."""

    def _grads(self, fn, q, k, v, s, t, mask):
        def loss(q, k, v):
            out = fn(q, k, v, s, t, mask)
            # valid-row weighted sum (padded/masked rows excluded)
            w = jnp.arange(out.shape[0])[:, None] * 0.01 + 1.0
            sel = mask[:, None] if mask is not None else 1.0
            return jnp.sum(out * w * sel)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def _check(self, rng, N, mask=None, sigma_d=0.25):
        q, k, v, s, t = make_inputs(rng, N=N)
        fused = lambda q, k, v, s, t, m: compat_flash_attention(
            q, k, v, s, t, mask=m, sigma_d=sigma_d, block_q=128,
            block_k=128, interpret=True)
        dense = lambda q, k, v, s, t, m: compat_attention_reference(
            q, k, v, s, t, mask=m, sigma_d=sigma_d)
        got = self._grads(fused, q, k, v, s, t, mask)
        ref = self._grads(dense, q, k, v, s, t, mask)
        for g, r, name in zip(got, ref, "qkv"):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=3e-4, err_msg=f"d{name}")

    def test_grads_match_reference(self, rng):
        self._check(rng, N=256)

    def test_grads_non_divisible_n(self, rng):
        self._check(rng, N=300)

    def test_grads_masked(self, rng):
        N = 256
        mask = jnp.asarray((np.arange(N) < 190).astype(np.float32))
        self._check(rng, N=N, mask=mask)

    def test_grads_finite_low_inlier(self, rng):
        """compat mostly zero (hard pair): grads must stay finite."""
        q, k, v, s, t = make_inputs(rng, N=256)
        g = self._grads(
            lambda q, k, v, s, t, m: compat_flash_attention(
                q, k, v, s, t, mask=m, sigma_d=0.01, block_q=128,
                block_k=128, interpret=True),
            q, k, v, s, t, None)
        for x in g:
            assert np.all(np.isfinite(np.asarray(x)))


def test_build_kernel_matches_build_then_cached(rng):
    """compat_flash_attention_build (fused layer-1 build+attend) must
    emit the cache build_compat_cache would and the output the cached
    kernel would — bitwise, same tiling, same formulas."""
    from gmf_tpu.ops.fused_attention import compat_flash_attention_build

    N, D = 300, 128
    q = jnp.asarray(rng.randn(N, D).astype(np.float32))
    k = jnp.asarray(rng.randn(N, D).astype(np.float32))
    v = jnp.asarray(rng.randn(N, D).astype(np.float32))
    src = jnp.asarray(rng.rand(N, 3).astype(np.float32) * 3)
    tgt = jnp.asarray(rng.rand(N, 3).astype(np.float32) * 3)
    mask = jnp.asarray((np.arange(N) < N - 40).astype(np.float32))

    cache_ref = build_compat_cache(src, tgt, sigma_d=0.1, dtype=jnp.int8,
                                   interpret=True)
    out_ref = compat_flash_attention(q, k, v, None, None, mask=mask,
                                     compat=cache_ref, interpret=True)
    out, cache = compat_flash_attention_build(q, k, v, src, tgt, mask=mask,
                                              sigma_d=0.1, interpret=True)
    np.testing.assert_array_equal(np.asarray(cache), np.asarray(cache_ref))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))
