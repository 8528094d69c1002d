"""Golden-value regression tests.

Fixed-seed outputs of the key modules are frozen into tests/golden/*.npz;
any unintended numeric change in future rounds fails here. Regenerate
deliberately with: GMF_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REGEN = os.environ.get("GMF_REGEN_GOLDEN") == "1"


def check_or_save(name, value, atol=2e-4):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    value = np.asarray(value)
    if REGEN or not os.path.exists(path):
        np.savez(path, value=value)
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
    ref = np.load(path)["value"]
    np.testing.assert_allclose(value, ref, atol=atol,
                               err_msg=f"golden mismatch: {name}")


def test_fusion_layer_golden(rng):
    from gmf_tpu.nn import FusionLayer

    layer = FusionLayer(dim=32, latent_dim=32, depth=0, cross_heads=1,
                        cross_dim_head=16, pe=True)
    data = jnp.asarray(rng.randn(1, 12, 32), jnp.float32)
    queries = jnp.asarray(rng.randn(1, 20, 32), jnp.float32)
    params = layer.init(jax.random.PRNGKey(42), data, queries)["params"]
    out = layer.apply({"params": params}, data, queries)
    check_or_save("fusion_layer", out)


def test_pointdsc_golden(rng):
    from gmf_tpu.models import PointDSC

    model = PointDSC(num_layers=1, num_channels=16, k=10)
    corr = jnp.asarray(rng.randn(1, 64, 6), jnp.float32)
    src = jnp.asarray(rng.rand(1, 64, 3) * 2, jnp.float32)
    tgt = jnp.asarray(rng.rand(1, 64, 3) * 2, jnp.float32)
    img = jnp.asarray(rng.rand(1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(7), corr, src, tgt, img, img)
    out = model.apply(variables, corr, src, tgt, img, img, testing=True)
    check_or_save("pointdsc_trans", out["final_trans"], atol=1e-3)
    check_or_save("pointdsc_labels", out["final_labels"], atol=1e-5)


def test_sparse_resunet_golden(rng):
    from gmf_tpu.sparse.kernel_map import build_pyramid
    from gmf_tpu.sparse.resunet import SparseResUNet2, pyramid_to_arrays

    coords = np.unique(rng.randint(0, 8, (60, 3)).astype(np.int32), axis=0)
    pyr = build_pyramid(coords, 4, conv1_kernel_size=3, granule=64)
    arrays = pyramid_to_arrays(pyr)
    model = SparseResUNet2(in_channels=1, out_channels=8,
                           channels=(4, 8, 16, 32), tr_channels=(8, 8, 8, 16),
                           normalize_feature=True)
    feats = jnp.ones((pyr.levels[0].cap, 1))
    variables = model.init(jax.random.PRNGKey(3), feats, arrays)
    out = model.apply(variables, feats, arrays)
    check_or_save("sparse_resunet", out[: len(coords)])


def test_fpfh_golden(rng):
    from gmf_tpu.ops.fpfh import compute_fpfh

    pts = jnp.asarray(rng.rand(80, 3), jnp.float32)
    feat = compute_fpfh(pts, normal_radius=0.3, feature_radius=0.6)
    check_or_save("fpfh", feat, atol=1e-3)
