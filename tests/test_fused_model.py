"""Fused-attention PointDSC must match the XLA-path model numerically."""

import numpy as np
import jax
import jax.numpy as jnp

from gmf_tpu.models import PointDSC


def test_fused_model_matches_dense(rng):
    kw = dict(num_layers=2, num_channels=32, ratio=0.1, k=10, sigma_d=0.10)
    dense = PointDSC(**kw)
    fused = PointDSC(fused_attention=True, **kw)

    N = 128
    src = rng.rand(1, N, 3).astype(np.float32) * 2
    ang = 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    tgt = src @ R.T + np.array([0.2, 0.1, 0.0], np.float32)
    out_idx = rng.choice(N, N // 3, replace=False)
    tgt[0, out_idx] = rng.rand(N // 3, 3) * 2
    corr = np.concatenate([src - src.mean(1, keepdims=True),
                           tgt - tgt.mean(1, keepdims=True)], -1)
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    args = (jnp.asarray(corr), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(img), jnp.asarray(img))

    variables = dense.init(jax.random.PRNGKey(0), *args)
    out_d = dense.apply(variables, *args, testing=True)
    out_f = fused.apply(variables, *args, testing=True)

    np.testing.assert_allclose(np.asarray(out_f["final_trans"]),
                               np.asarray(out_d["final_trans"]), atol=1e-3)
    agree = (np.asarray(out_f["final_labels"])
             == np.asarray(out_d["final_labels"])).mean()
    assert agree > 0.99, agree


def test_fused_training_grads_match_dense(rng):
    """With the flash custom_vjp, param grads through the fused encoder
    must match the dense path (train mode, BN batch stats)."""
    kw = dict(num_layers=2, num_channels=32, ratio=0.1, k=10, sigma_d=0.10)
    dense = PointDSC(**kw)
    fused = PointDSC(fused_attention=True, **kw)

    N = 128
    src = rng.rand(1, N, 3).astype(np.float32) * 2
    tgt = src + 0.01 * rng.randn(1, N, 3).astype(np.float32)
    corr = np.concatenate([src - src.mean(1, keepdims=True),
                           tgt - tgt.mean(1, keepdims=True)], -1)
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    args = (jnp.asarray(corr), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(img), jnp.asarray(img))

    variables = dense.init(jax.random.PRNGKey(0), *args)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def loss(p, model):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, *args,
            train=True, mutable=["batch_stats"])
        return (jnp.sum(out["M"] ** 2) + jnp.sum(out["confidence"] ** 2)
                + jnp.sum(out["final_trans"][:, :3, 3] ** 2))

    g_d = jax.grad(loss)(params, dense)
    g_f = jax.grad(loss)(params, fused)
    flat_d = jax.tree.leaves(jax.tree.map(np.asarray, g_d))
    flat_f = jax.tree.leaves(jax.tree.map(np.asarray, g_f))
    scale = max(np.abs(x).max() for x in flat_d)
    for a, b in zip(flat_f, flat_d):
        np.testing.assert_allclose(a, b, atol=2e-3 * scale + 1e-6)
