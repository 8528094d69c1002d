"""Fused NMS kernel vs the dense reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from gmf_tpu.geometry.nms import pick_seeds_nms
from gmf_tpu.ops.fused_nms import nms_local_max, pick_seeds_nms_fused


def test_local_max_matches_dense(rng):
    N = 300
    pts = jnp.asarray(rng.rand(N, 3) * 2, jnp.float32)
    scores = jnp.asarray(rng.rand(N), jnp.float32)
    got = np.asarray(nms_local_max(pts, scores, radius=0.2,
                                   block_q=128, block_k=128, interpret=True))
    d = np.linalg.norm(np.asarray(pts)[:, None] - np.asarray(pts)[None],
                       axis=-1)
    s = np.asarray(scores)
    relation = (s[:, None] >= s[None, :]) | (d >= 0.2)
    expect = relation.min(-1).astype(np.float32)
    np.testing.assert_array_equal(got, expect)


def test_pick_seeds_fused_matches_dense(rng):
    B, N = 2, 256
    pts = jnp.asarray(rng.rand(B, N, 3) * 2, jnp.float32)
    scores = jnp.asarray(rng.rand(B, N), jnp.float32)
    d = jnp.linalg.norm(pts[:, :, None] - pts[:, None], axis=-1)
    dense = np.asarray(pick_seeds_nms(d, scores, 0.15, 25))
    fused = np.asarray(pick_seeds_nms_fused(pts, scores, 0.15, 25,
                                            interpret=True))
    np.testing.assert_array_equal(fused, dense)


def test_masked(rng):
    B, N = 1, 128
    pts = jnp.asarray(rng.rand(B, N, 3), jnp.float32)
    scores = jnp.asarray(rng.rand(B, N), jnp.float32)
    mask = jnp.asarray((np.arange(N) < 100).astype(np.float32))[None]
    fused = np.asarray(pick_seeds_nms_fused(pts, scores, 0.1, 10, mask=mask,
                                            interpret=True))
    assert np.all(fused < 100)
