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


def test_compat_cache_model_matches_streaming(rng):
    """compat_cache="f32" (forced on CPU) must match the streaming fused
    path: same kernels downstream, compat precomputed once and shared."""
    kw = dict(num_layers=2, num_channels=32, ratio=0.1, k=10, sigma_d=0.10)
    fused = PointDSC(fused_attention=True, compat_cache="off", **kw)
    cached = PointDSC(fused_attention=True, compat_cache="f32", **kw)

    N = 150  # non-divisible N exercises the padded cache alignment
    src = rng.rand(1, N, 3).astype(np.float32) * 2
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    tgt = src @ R.T + np.array([0.1, 0.2, 0.0], np.float32)
    corr = np.concatenate([src - src.mean(1, keepdims=True),
                           tgt - tgt.mean(1, keepdims=True)], -1)
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    mask = np.ones((1, N), np.float32)
    mask[0, -20:] = 0.0
    corr[0, -20:] = 0.0
    args = (jnp.asarray(corr), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(img), jnp.asarray(img))

    variables = fused.init(jax.random.PRNGKey(0), *args)
    out_s = fused.apply(variables, *args, testing=True,
                        corr_mask=jnp.asarray(mask))
    out_c = cached.apply(variables, *args, testing=True,
                         corr_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out_c["final_trans"]),
                               np.asarray(out_s["final_trans"]), atol=1e-3)
    lbl_s = np.asarray(out_s["final_labels"])[mask > 0]
    lbl_c = np.asarray(out_c["final_labels"])[mask > 0]
    assert (lbl_s == lbl_c).mean() > 0.99


def test_compat_cache_int8_model_matches_streaming(rng):
    """compat_cache="int8" (offset-quantized cache, dequantized in the
    kernels) registers the same pair the streaming fused path does —
    max abs dequant error 1/508 is below bf16's near-1.0 ulp/2."""
    kw = dict(num_layers=2, num_channels=32, ratio=0.1, k=10, sigma_d=0.10)
    fused = PointDSC(fused_attention=True, compat_cache="off", **kw)
    cached = PointDSC(fused_attention=True, compat_cache="int8", **kw)

    N = 150
    src = rng.rand(1, N, 3).astype(np.float32) * 2
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    tgt = src @ R.T + np.array([0.1, 0.2, 0.0], np.float32)
    corr = np.concatenate([src - src.mean(1, keepdims=True),
                           tgt - tgt.mean(1, keepdims=True)], -1)
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    mask = np.ones((1, N), np.float32)
    mask[0, -20:] = 0.0
    corr[0, -20:] = 0.0
    args = (jnp.asarray(corr), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(img), jnp.asarray(img))

    variables = fused.init(jax.random.PRNGKey(0), *args)
    out_s = fused.apply(variables, *args, testing=True,
                        corr_mask=jnp.asarray(mask))
    out_c = cached.apply(variables, *args, testing=True,
                         corr_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out_c["final_trans"]),
                               np.asarray(out_s["final_trans"]), atol=2e-3)
    lbl_s = np.asarray(out_s["final_labels"])[mask > 0]
    lbl_c = np.asarray(out_c["final_labels"])[mask > 0]
    assert (lbl_s == lbl_c).mean() > 0.99


def test_compat_cache_training_grads(rng):
    """Param grads through the cached kernels match the streaming fused
    path (cache under stop_gradient, custom_vjp backward)."""
    kw = dict(num_layers=2, num_channels=32, ratio=0.1, k=10, sigma_d=0.10)
    fused = PointDSC(fused_attention=True, compat_cache="off", **kw)
    cached = PointDSC(fused_attention=True, compat_cache="f32", **kw)

    N = 128
    src = rng.rand(1, N, 3).astype(np.float32) * 2
    tgt = src + 0.01 * rng.randn(1, N, 3).astype(np.float32)
    corr = np.concatenate([src - src.mean(1, keepdims=True),
                           tgt - tgt.mean(1, keepdims=True)], -1)
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    args = (jnp.asarray(corr), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(img), jnp.asarray(img))

    variables = fused.init(jax.random.PRNGKey(0), *args)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def loss(p, model):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, *args,
            train=True, mutable=["batch_stats"])
        return (jnp.sum(out["M"] ** 2) + jnp.sum(out["confidence"] ** 2)
                + jnp.sum(out["final_trans"][:, :3, 3] ** 2))

    g_s = jax.grad(loss)(params, fused)
    g_c = jax.grad(loss)(params, cached)
    flat_s = jax.tree.leaves(jax.tree.map(np.asarray, g_s))
    flat_c = jax.tree.leaves(jax.tree.map(np.asarray, g_c))
    scale = max(np.abs(x).max() for x in flat_s)
    for a, b in zip(flat_c, flat_s):
        np.testing.assert_allclose(a, b, atol=2e-3 * scale + 1e-6)


def test_knn_topk_values_mode_matches_exact(rng):
    """knn_topk="values" (approx_max_k rt=1.0) returns the exact top-k
    values; the final transform must match the exact backend."""
    kw = dict(num_layers=2, num_channels=32, ratio=0.1, k=10, sigma_d=0.10)
    exact = PointDSC(knn_topk="exact", **kw)
    values = PointDSC(knn_topk="values", **kw)

    N = 128
    src = rng.rand(1, N, 3).astype(np.float32) * 2
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    tgt = src @ R.T + np.array([0.1, 0.2, 0.0], np.float32)
    corr = np.concatenate([src - src.mean(1, keepdims=True),
                           tgt - tgt.mean(1, keepdims=True)], -1)
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    args = (jnp.asarray(corr), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(img), jnp.asarray(img))

    variables = exact.init(jax.random.PRNGKey(0), *args)
    out_e = exact.apply(variables, *args, testing=True)
    out_v = values.apply(variables, *args, testing=True)
    np.testing.assert_allclose(np.asarray(out_v["final_trans"]),
                               np.asarray(out_e["final_trans"]), atol=1e-4)
    assert (np.asarray(out_v["final_labels"])
            == np.asarray(out_e["final_labels"])).mean() > 0.99


def test_knn_topk_fused_mode_matches_exact(rng):
    """knn_topk="fused" (Pallas matmul+streaming-top-k) selects the same
    neighbor sets as the exact backend; the full test-mode forward must
    match, including under a padded batch mask."""
    kw = dict(num_layers=2, num_channels=32, ratio=0.1, k=10, sigma_d=0.10)
    exact = PointDSC(knn_topk="exact", **kw)
    fusedk = PointDSC(knn_topk="fused", **kw)

    N = 120
    src = rng.rand(1, N, 3).astype(np.float32) * 2
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    tgt = src @ R.T + np.array([0.1, 0.2, 0.0], np.float32)
    corr = np.concatenate([src - src.mean(1, keepdims=True),
                           tgt - tgt.mean(1, keepdims=True)], -1)
    img = rng.rand(1, 16, 16, 3).astype(np.float32)

    # padded batch: zero the masked tail (the LCPE zero-padding contract)
    mask = np.ones((1, N), np.float32)
    mask[:, 100:] = 0.0
    corr[:, 100:] = 0.0
    src[:, 100:] = 0.0
    tgt[:, 100:] = 0.0
    args = (jnp.asarray(corr), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(img), jnp.asarray(img))

    variables = exact.init(jax.random.PRNGKey(0), *args)
    for m in (None, jnp.asarray(mask)):
        out_e = exact.apply(variables, *args, testing=True, corr_mask=m)
        out_f = fusedk.apply(variables, *args, testing=True, corr_mask=m)
        np.testing.assert_allclose(
            np.asarray(out_f["final_trans"]),
            np.asarray(out_e["final_trans"]), atol=1e-4)
        assert (np.asarray(out_f["final_labels"])
                == np.asarray(out_e["final_labels"])).mean() > 0.99


def test_auto_compat_cache_gate():
    """The auto gate's tiers match the measured HBM envelope: f32 for
    small shapes, int8 up to the empirical 1.75 GB ceiling, streaming
    (None) past it — the lomatch b=2 Np=30720 cache (1.89 GB) OOMed on
    a 16 GB v5e next to the [B,S,N] scoring tensors."""
    from gmf_tpu.models.pointdsc import _auto_compat_cache_dtype

    assert _auto_compat_cache_dtype(16, 1024) is jnp.float32   # 67 MB f32
    assert _auto_compat_cache_dtype(64, 5120) is jnp.int8      # bench default
    assert _auto_compat_cache_dtype(8, 12288) is jnp.int8      # --kitti
    assert _auto_compat_cache_dtype(2, 30720) is None          # --lomatch
