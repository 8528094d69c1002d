"""Component-wise timing of the PointDSC eval forward on TPU.

Times the full test-mode apply, then the isolated hot components at the
same shapes, to locate where the per-batch milliseconds live:
  - 12x compat flash attention   (encoder hot loop)
  - seed kNN (dist einsum + top_k)
  - seed-local spectral + Kabsch
  - hypothesis scoring (warp + L2 over [B,S,N])
  - NMS seed selection
  - post-refinement while_loop

All timings host-fetch-synced (this box's block_until_ready is
unreliable through the tunnel). Components are jitted standalone at the
exact shapes the full model uses, so each is an upper bound on its
in-model cost (the full model may fuse across boundaries).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, fetch, iters=5, warmup=2):
    """fetch() is only the sync point (host-fetch a small slice — iters
    dispatches, ONE sync, so the ~50 ms relay amortizes); the DEVICE
    output is returned so callers can chain components."""
    for _ in range(warmup):
        fetch(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    return dt, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-corr", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gmf_tpu.data import make_correspondence_problem
    from gmf_tpu.models import PointDSC

    B, N = args.batch, args.num_corr
    dtype = jnp.bfloat16
    model = PointDSC(fused_attention=True, dtype=dtype)

    rng = np.random.RandomState(0)
    batch = make_correspondence_problem(
        rng, num_corr=N, batch=B, image_hw=(120, 160), inlier_ratio=0.4)
    arrs = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(
        jax.random.PRNGKey(0), arrs["corr_pos"], arrs["src_keypts"],
        arrs["tgt_keypts"], arrs["p_image"], arrs["q_image"])

    fullfn = jax.jit(lambda v, a: model.apply(
        v, a["corr_pos"], a["src_keypts"], a["tgt_keypts"], a["p_image"],
        a["q_image"], testing=True)["final_trans"])
    dt, _ = timeit(lambda: fullfn(variables, arrs), np.asarray,
                   iters=args.iters)
    print(f"full test-mode apply      : {dt*1e3:8.1f} ms/batch "
          f"({B/dt:.1f} pairs/s)")

    # --- components ------------------------------------------------------
    from gmf_tpu.ops.fused_attention import compat_flash_attention

    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, N, 128), dtype)
    src = arrs["src_keypts"].astype(jnp.float32)
    tgt = arrs["tgt_keypts"].astype(jnp.float32)
    mask = jnp.ones((B, N), jnp.float32)

    @jax.jit
    def flash12(q, src, tgt, mask):
        x = q
        for _ in range(12):
            x = jax.vmap(lambda qq, ss, tt, mm: compat_flash_attention(
                qq, qq, qq, ss, tt, mask=mm, sigma_d=0.10))(x, src, tgt,
                                                            mask)
        return x

    dt, _ = timeit(lambda: flash12(q, src, tgt, mask),
                   lambda o: np.asarray(o[0, 0]), iters=args.iters)
    print(f"12x flash attn (streamed) : {dt*1e3:8.1f} ms/batch")

    # the LIVE default path: compat cache built once, tiles streamed into
    # all 12 layers (models/pointdsc.py compat_cache="auto" — int8 at
    # these shapes; bf16 shown for comparison)
    from gmf_tpu.ops.fused_attention import build_compat_cache

    def make_flash12_cached(cdt):
        @jax.jit
        def flash12_cached(q, src, tgt, mask):
            cache = jax.vmap(lambda s, t: build_compat_cache(
                s, t, sigma_d=0.10, dtype=cdt))(src, tgt)
            x = q
            for _ in range(12):
                x = jax.vmap(lambda qq, cc, mm: compat_flash_attention(
                    qq, qq, qq, None, None, mask=mm, compat=cc))(
                        x, cache, mask)
            return x
        return flash12_cached

    for name, cdt in (("int8", jnp.int8), ("bf16", jnp.bfloat16)):
        fn = make_flash12_cached(cdt)
        dt, _ = timeit(lambda: fn(q, src, tgt, mask),
                       lambda o: np.asarray(o[0, 0]), iters=args.iters)
        print(f"12x flash attn ({name} $)  : {dt*1e3:8.1f} ms/batch")

    @jax.jit
    def cache_only(src, tgt):
        return jax.vmap(lambda s, t: build_compat_cache(
            s, t, sigma_d=0.10, dtype=jnp.int8))(src, tgt)

    dt, _ = timeit(lambda: cache_only(src, tgt),
                   lambda o: np.asarray(o[0, 0, 0]), iters=args.iters)
    print(f"compat cache build (int8) : {dt*1e3:8.1f} ms/batch")

    S = int(N * 0.1)
    feats = q / jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, -1,
                                 keepdims=True) + 1e-12).astype(dtype)
    seeds = jnp.tile(jnp.arange(S, dtype=jnp.int32)[None], (B, 1))

    @jax.jit
    def seed_knn(feats, seeds):
        seed_feats = jax.vmap(lambda xb, ib: xb[ib])(feats, seeds)
        dist = 2.0 - 2.0 * jnp.einsum(
            "bsc,bnc->bsn", seed_feats, feats,
            precision=jax.lax.Precision.HIGHEST)
        _, knn_idx = jax.lax.top_k(-dist, 41)
        return knn_idx[..., 1:]

    dt, knn_idx = timeit(lambda: seed_knn(feats, seeds),
                         lambda o: np.asarray(o[0, 0]), iters=args.iters)
    print(f"seed kNN (dist + top_k)   : {dt*1e3:8.1f} ms/batch")

    from gmf_tpu.geometry.kabsch import rigid_transform_3d
    from gmf_tpu.geometry.spectral import leading_eigenvector

    @jax.jit
    def spectral_kabsch(feats, src, tgt, knn_idx):
        gather = jax.vmap(lambda xb, ib: xb[ib])
        knn_features = gather(feats, knn_idx)
        src_knn = gather(src, knn_idx)
        tgt_knn = gather(tgt, knn_idx)
        feat_M = jnp.einsum("bskc,bsjc->bskj", knn_features, knn_features,
                            precision=jax.lax.Precision.HIGHEST)
        feat_M = jnp.clip(1.0 - (1.0 - feat_M) / 1.0, 0.0, None)
        src_d = jnp.linalg.norm(
            src_knn[:, :, :, None, :] - src_knn[:, :, None, :, :], axis=-1)
        tgt_d = jnp.linalg.norm(
            tgt_knn[:, :, :, None, :] - tgt_knn[:, :, None, :, :], axis=-1)
        spatial_M = jnp.clip(1.0 - (src_d - tgt_d) ** 2 / 0.01, 0.0, None)
        total_M = feat_M * spatial_M
        k = total_M.shape[-1]
        total_M = total_M * (1.0 - jnp.eye(k, dtype=total_M.dtype))
        w = leading_eigenvector(total_M.reshape(B * S, k, k), num_iters=10)
        w = w.reshape(B, S, k)
        w = w / (jnp.sum(w, -1, keepdims=True) + 1e-6)
        T = rigid_transform_3d(src_knn.reshape(B * S, k, 3),
                               tgt_knn.reshape(B * S, k, 3),
                               w.reshape(B * S, k))
        return T.reshape(B, S, 4, 4)

    dt, seed_T = timeit(lambda: spectral_kabsch(feats, src, tgt, knn_idx),
                        lambda o: np.asarray(o[0, 0]), iters=args.iters)
    print(f"spectral + Kabsch         : {dt*1e3:8.1f} ms/batch")

    seed_T = jnp.asarray(seed_T) if not isinstance(seed_T, jnp.ndarray) \
        else seed_T

    @jax.jit
    def scoring(seed_T, src, tgt):
        pred = jnp.einsum("bsij,bnj->bsni", seed_T[:, :, :3, :3], src,
                          precision=jax.lax.Precision.HIGHEST) \
            + seed_T[:, :, None, :3, 3]
        L2 = jnp.linalg.norm(pred - tgt[:, None, :, :], axis=-1)
        inlier = (L2 < 0.10).astype(jnp.float32)
        fit = jnp.mean(inlier, axis=-1)
        best = jnp.argmax(fit, axis=-1)
        final_trans = jnp.take_along_axis(
            seed_T, best[:, None, None, None], axis=1).squeeze(1)
        final_L2 = jnp.take_along_axis(L2, best[:, None, None],
                                       axis=1).squeeze(1)
        labels = (final_L2 < 0.10).astype(jnp.float32)
        return final_trans, labels

    st = spectral_kabsch(feats, src, tgt, knn_idx)
    dt, _ = timeit(lambda: scoring(st, src, tgt),
                   lambda o: np.asarray(o[0]), iters=args.iters)
    print(f"hypothesis scoring        : {dt*1e3:8.1f} ms/batch")

    from gmf_tpu.ops.fused_nms import pick_seeds_nms_fused

    conf = jax.random.normal(key, (B, N), jnp.float32)

    @jax.jit
    def nms(src, conf):
        return pick_seeds_nms_fused(src, conf, 0.10, S)

    dt, _ = timeit(lambda: nms(src, conf), lambda o: np.asarray(o[0, 0]),
                   iters=args.iters)
    print(f"NMS seeds                 : {dt*1e3:8.1f} ms/batch")

    ft, _ = scoring(st, src, tgt)

    refine = jax.jit(lambda T, s, t: model._post_refinement(T, s, t, None))
    dt, _ = timeit(lambda: refine(ft, src, tgt),
                   lambda o: np.asarray(o[0]), iters=args.iters)
    print(f"post-refinement (20 it)   : {dt*1e3:8.1f} ms/batch")

    # device matching (the eval dispatch's extra stage over the bench
    # forward: [N,N] descriptor distances + mutual argmins + labels)
    from gmf_tpu.data.correspondence import match_descriptors_device

    d32 = jax.random.normal(key, (B, N, 32), jnp.float32)
    d32 = d32 / jnp.linalg.norm(d32, axis=-1, keepdims=True)
    gt = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (B, 1, 1))

    @jax.jit
    def devmatch(src, tgt, d0, d1, gt, mask):
        return jax.vmap(
            lambda s, t, a, b, g, m: match_descriptors_device(
                s, t, a, b, g, 0.10, m, m, use_mutual=True, in_dim=6)
        )(src, tgt, d0, d1, gt, mask)["corr_pos"]

    dt, _ = timeit(lambda: devmatch(src, tgt, d32, d32, gt, mask),
                   lambda o: np.asarray(o[0, 0]), iters=args.iters)
    print(f"device match (mutual 1NN) : {dt*1e3:8.1f} ms/batch")

    # image encoder + fusion-1 (two 120x160 ResNet-34/8 trunks)
    from gmf_tpu.nn.resnet import ImageEncoder

    enc = ImageEncoder(base_width=64, dtype=dtype)
    ev = enc.init(jax.random.PRNGKey(2), arrs["p_image"])
    img = jax.jit(lambda v, x, y: (enc.apply(v, x), enc.apply(v, y)))
    dt, _ = timeit(lambda: img(ev, arrs["p_image"], arrs["q_image"]),
                   lambda o: np.asarray(o[0][0, 0]), iters=args.iters)
    print(f"image encoder x2          : {dt*1e3:8.1f} ms/batch")


if __name__ == "__main__":
    main()
