"""Contrastive FCGF descriptor training (train/descriptor.py).

The reference consumes PRETRAINED FCGF weights (GMF_DGR_fcgf
config_3DMatch.py --weights); this trainer supplies the missing
hardest-contrastive training capability. Tests pin the loss semantics
(margins, hardest-negative selection, spatial exclusion, masking) and
that a short jitted training run actually descends.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_dgr_trainer import tiny_nets  # noqa: E402

from gmf_tpu.data.dgr_loader import make_dgr_pair
from gmf_tpu.train.descriptor import (ContrastiveDescriptorTrainer,
                                      hardest_contrastive_loss)


def test_loss_semantics():
    """Hand-built 3-positive case: perfect positives inside the margin
    cost nothing; the hardest negative is the closest non-excluded
    candidate; spatially-near candidates are excluded."""
    C = 4
    f0 = jnp.eye(3, C)                      # anchors = partners: d_pos=0
    f1 = jnp.eye(3, C)
    pos0 = jnp.arange(3, dtype=jnp.int32)
    pos1 = jnp.arange(3, dtype=jnp.int32)
    mask = jnp.ones(3)
    # partner positions: 1 and 2 far from 0; 2 NEAR 1 (within exclusion)
    xyz1 = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [1.05, 0, 0]])

    loss, m = hardest_contrastive_loss(f0, f1, pos0, pos1, mask, xyz1,
                                       pos_margin=0.1, neg_margin=1.4,
                                       exclude_radius=0.1)
    assert float(m["loss_pos"]) == 0.0
    # unit basis vectors: every cross distance is sqrt(2); anchor 1's
    # candidate 2 is spatially excluded but 0 remains -> all d_neg=√2
    np.testing.assert_allclose(float(m["d_neg"]), np.sqrt(2), rtol=1e-5)
    expect = (1.4 - np.sqrt(2)) ** 2 if 1.4 > np.sqrt(2) else 0.0
    np.testing.assert_allclose(float(m["loss_neg"]), expect, atol=1e-6)

    # out-of-margin positive pays quadratically
    f1_far = jnp.asarray(np.roll(np.eye(3, C), 1, axis=1), jnp.float32)
    loss2, m2 = hardest_contrastive_loss(f0, f1_far, pos0, pos1, mask,
                                         xyz1, pos_margin=0.1,
                                         neg_margin=1.4,
                                         exclude_radius=0.1)
    np.testing.assert_allclose(float(m2["loss_pos"]),
                               (np.sqrt(2) - 0.1) ** 2, rtol=1e-5)

    # masked positives contribute nothing
    mask0 = jnp.asarray([1.0, 0.0, 0.0])
    _, m3 = hardest_contrastive_loss(f0, f1_far, pos0, pos1, mask0, xyz1,
                                     pos_margin=0.1, neg_margin=1.4,
                                     exclude_radius=0.1)
    np.testing.assert_allclose(float(m3["loss_pos"]),
                               (np.sqrt(2) - 0.1) ** 2, rtol=1e-5)


def test_training_descends(rng):
    fcgf, fv, _, _ = tiny_nets()
    tr = ContrastiveDescriptorTrainer(fcgf, fv, voxel_size=0.05,
                                      device_maps=False, n_pos=64)
    pairs = [make_dgr_pair(rng, n_points=400, voxel_size=0.05,
                           surface=True, overlap=0.5) for _ in range(3)]
    first = [tr.train_pair(p, rng)["loss"] for p in pairs]
    for _ in range(3):
        last = [tr.train_pair(p, rng)["loss"] for p in pairs]
    assert np.mean(last) < np.mean(first)
    assert np.isfinite(np.mean(last))
