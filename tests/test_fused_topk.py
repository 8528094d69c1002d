"""Parity of the fused seed-kNN kernel vs the XLA exact path.

The fused kernel (ops/fused_topk.py) must select exactly the
lax.top_k(-dist) neighbor set — same indices, same order, same
tie-break — for f32 features (where both paths rank the same values
up to matmul ulps; the fixed seeds here have no sub-ulp score gaps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmf_tpu.ops.fused_topk import seed_knn_topk


def _reference(seed_feats, feats, k, mask=None):
    dist = 2.0 - 2.0 * jnp.einsum(
        "sc,nc->sn", seed_feats, feats,
        precision=jax.lax.Precision.HIGHEST)
    if mask is not None:
        dist = jnp.where(mask[None, :] > 0, dist, jnp.inf)
    return jax.lax.top_k(-dist, k)


def _problem(rng, S, N, C=32):
    f = rng.randn(N, C).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    seeds = rng.choice(N, size=S, replace=False)
    return jnp.asarray(f[seeds]), jnp.asarray(f)


@pytest.mark.parametrize("S,N,k", [(16, 100, 9), (37, 333, 12),
                                   (64, 1500, 41)])
def test_matches_lax_top_k(S, N, k):
    rng = np.random.RandomState(0)
    sf, f = _problem(rng, S, N)
    idx, val = seed_knn_topk(sf, f, k, interpret=True)
    ref_v, ref_i = _reference(sf, f, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
    # kernel scores are inner products; ref values are -dist = 2s - 2
    np.testing.assert_allclose(2.0 * np.asarray(val) - 2.0,
                               np.asarray(ref_v), atol=1e-5)


def test_masked_keys_excluded():
    rng = np.random.RandomState(1)
    sf, f = _problem(rng, 24, 200)
    mask = (rng.rand(200) > 0.3).astype(np.float32)
    idx, _ = seed_knn_topk(sf, f, 11, mask=jnp.asarray(mask),
                           interpret=True)
    _, ref_i = _reference(sf, f, 11, mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))
    valid = int(mask.sum())
    assert valid >= 11
    assert mask[np.asarray(idx).ravel()].all()


def test_exhausted_rows_stay_in_range():
    """Rows with fewer unmasked keys than k fill ascending, in-range —
    the lax.top_k behavior on -inf tails."""
    rng = np.random.RandomState(2)
    sf, f = _problem(rng, 8, 64)
    mask = np.zeros(64, np.float32)
    mask[:5] = 1.0
    idx, _ = seed_knn_topk(sf, f, 9, mask=jnp.asarray(mask),
                           interpret=True)
    idx = np.asarray(idx)
    assert (idx >= 0).all() and (idx < 64).all()
    # the 5 valid keys come first in every row
    assert all(set(row[:5]) == set(range(5)) for row in idx)


def test_self_is_first_neighbor():
    """Unit-norm features: each seed's nearest key is itself (the model
    drops column 0 for ignore_self, pointdsc.py:470)."""
    rng = np.random.RandomState(3)
    f = rng.randn(120, 16).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    seeds = np.arange(0, 120, 7)
    idx, _ = seed_knn_topk(jnp.asarray(f[seeds]), jnp.asarray(f), 5,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], seeds)


def test_bf16_features_rank_in_f32():
    """bf16 inputs accumulate in f32: the selected set must match the
    f32 reference ranking of the SAME bf16 values."""
    rng = np.random.RandomState(4)
    sf, f = _problem(rng, 16, 256)
    sfb, fb = sf.astype(jnp.bfloat16), f.astype(jnp.bfloat16)
    idx, _ = seed_knn_topk(sfb, fb, 7, interpret=True)
    ref_v, ref_i = _reference(sfb.astype(jnp.float32),
                              fb.astype(jnp.float32), 7)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_i))


def test_no_gradient_path():
    """The kernel is stop_gradiented: grads through a gather of its
    indices flow to the gathered tensor only, and never error."""
    rng = np.random.RandomState(5)
    sf, f = _problem(rng, 8, 64)

    def loss(f):
        idx, _ = seed_knn_topk(f[:8], f, 4, interpret=True)
        return jnp.sum(f[idx] ** 2)

    g = jax.grad(loss)(f)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0
