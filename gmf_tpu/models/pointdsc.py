"""PointDSC + GMF: correspondence outlier rejection with image fusion.

TPU-native re-design of the reference's flagship model
(GMF_PointDSC/models/PointDSC.py:10-528). Architecture parity:

- NonLocalBlock (ref :10-74): 1-head self-attention whose logits are
  modulated (elementwise product) by the spatial-consistency matrix, a
  Conv1d-BN-ReLU message MLP, plus Fusion-2 image injection
  (``FusionLayer(pe=True)``) ADDED to the message.
- NonLocalNet (ref :77-143): input Dense(6->128), ImageEncoder on both
  RGB frames, Fusion-1 (image-to-image cross attention), then num_layers x
  [PointCN layer -> NonLocalBlock].
- PointDSC head (ref :146-528): spatial-consistency matrix, confidence
  MLP, seed selection (top-k train / NMS test), per-seed feature-space kNN,
  seed-local spectral matching (power iteration), weighted Kabsch per seed,
  hypothesis selection by inlier count, and test-time iterative
  post-refinement.

TPU-first deviations (behavior-preserving):
- [B, N, C] token-last layout everywhere (Conv1d k=1 == Dense).
- Weighted Kabsch runs on-device via Horn quaternions — no CPU SVD hop
  (ref common.py:40-41).
- Post-refinement's data-dependent early exit is a ``lax.while_loop`` with
  the reference's exact stopping rule (ref :493-528).
- Optional ``corr_mask`` supports padded fixed-shape batches (the
  reference never pads; with an all-ones mask the computation is
  identical).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from gmf_tpu.geometry.kabsch import rigid_transform_3d
from gmf_tpu.geometry.nms import pick_seeds_nms
from gmf_tpu.geometry.se3 import transform
from gmf_tpu.geometry.spectral import (leading_eigenvector,
                                        leading_eigenvector_fixed)
from gmf_tpu.nn.fusion import FusionLayer
from gmf_tpu.nn.resnet import ImageEncoder

_PREC = jax.lax.Precision.HIGHEST
_xavier = nn.initializers.xavier_normal()


class NonLocalBlock(nn.Module):
    """Self-attention modulated by spatial consistency + Fusion-2 injection.

    Parity: GMF_PointDSC/models/PointDSC.py:10-74.
    """

    num_channels: int = 128
    num_heads: int = 1
    sigma_d: float = 0.10
    dtype: jnp.dtype = jnp.float32
    # SP/CP megapair path: when set (a jax.sharding.Mesh), correspondence
    # tokens are sharded over the mesh's 'data' axis and K/V/keypoint
    # shards rotate around the ring with ppermute
    # (parallel/ring_attention.py) — for num_node='all' pairs whose
    # [N, N] attention exceeds one chip's HBM (SURVEY §2.6 SP/CP row).
    ring_mesh: object = None

    @nn.compact
    def __call__(self, feat, attention, image_feat, train: bool = False,
                 corr_mask=None, src_keypts=None, tgt_keypts=None,
                 fused: bool = False, compat_cache=None,
                 build_cache: bool = False):
        """feat [B,N,C], attention [B,N,N] (or None when fused),
        image_feat [B,T,C] -> [B,N,C]. compat_cache: optional [B,Np,Np]
        precomputed spatial-consistency tiles shared by all layers.
        build_cache (eval-only, fused): run the fused build+attend
        kernel — this layer's attention ALSO emits the int8 compat
        cache, and the block returns ``(out, cache [B,Np,Np] int8)``
        instead of ``out`` (ops/fused_attention.py
        compat_flash_attention_build)."""
        B, N, C = feat.shape
        h = self.num_heads
        dh = C // h

        q = nn.Dense(C, kernel_init=_xavier, name="projection_q",
                     dtype=self.dtype)(feat)
        k = nn.Dense(C, kernel_init=_xavier, name="projection_k",
                     dtype=self.dtype)(feat)
        v = nn.Dense(C, kernel_init=_xavier, name="projection_v",
                     dtype=self.dtype)(feat)

        assert not build_cache or (fused and self.ring_mesh is None), (
            "build_cache requires the fused path")
        if self.ring_mesh is not None:
            assert h == 1, "ring path supports the reference's 1-head case"
            from gmf_tpu.parallel.ring_attention import ring_compat_attention

            mask_b = (jnp.ones((B, N), jnp.float32) if corr_mask is None
                      else corr_mask.astype(jnp.float32))
            outs = [
                ring_compat_attention(
                    q[b].astype(jnp.float32), k[b].astype(jnp.float32),
                    v[b].astype(jnp.float32),
                    src_keypts[b].astype(jnp.float32),
                    tgt_keypts[b].astype(jnp.float32), mask_b[b],
                    self.ring_mesh, sigma_d=self.sigma_d)
                for b in range(B)
            ]
            message = jnp.stack(outs, axis=0).astype(self.dtype)
        elif fused:
            # Pallas flash kernel: streams K/V blocks and rebuilds the
            # spatial-consistency matrix on the fly — never materializes
            # the [N, N] tensors (ops/fused_attention.py). With a
            # compat_cache, tiles of the precomputed matrix stream from
            # HBM instead (~1.9x: the rebuild is VPU-bound).
            assert h == 1, "fused path supports the reference's 1-head case"
            from gmf_tpu.ops.fused_attention import compat_flash_attention

            interpret = jax.default_backend() != "tpu"
            mask_b = (jnp.ones((B, N), q.dtype) if corr_mask is None
                      else corr_mask)
            built_cache = None
            if build_cache:
                from gmf_tpu.ops.fused_attention import (
                    compat_flash_attention_build)

                message, built_cache = jax.vmap(
                    lambda qq, kk, vv, ss, tt, mm:
                    compat_flash_attention_build(
                        qq, kk, vv, ss, tt, mask=mm, sigma_d=self.sigma_d,
                        interpret=interpret)
                )(q, k, v, src_keypts, tgt_keypts, mask_b)
            elif compat_cache is not None:
                message = jax.vmap(
                    lambda qq, kk, vv, cc, mm: compat_flash_attention(
                        qq, kk, vv, None, None, mask=mm, compat=cc,
                        interpret=interpret)
                )(q, k, v, compat_cache, mask_b)
            else:
                message = jax.vmap(
                    lambda qq, kk, vv, ss, tt, mm: compat_flash_attention(
                        qq, kk, vv, ss, tt, mask=mm, sigma_d=self.sigma_d,
                        interpret=interpret)
                )(q, k, v, src_keypts, tgt_keypts, mask_b)
        else:
            q = q.reshape(B, N, h, dh).transpose(0, 2, 1, 3)
            k = k.reshape(B, N, h, dh).transpose(0, 2, 1, 3)
            v = v.reshape(B, N, h, dh).transpose(0, 2, 1, 3)

            # Logits scaled by sqrt(dh) then multiplied elementwise by the
            # spatial-consistency matrix BEFORE softmax (ref :60-62) — this
            # is the defining trick of PointDSC's NonLocal block.
            logits = jnp.einsum("bhic,bhjc->bhij", q, k) / (dh ** 0.5)
            logits = attention[:, None, :, :] * logits
            if corr_mask is not None:
                logits = jnp.where(corr_mask[:, None, None, :] > 0, logits,
                                   -1e9)
            weight = jax.nn.softmax(logits, axis=-1)
            message = jnp.einsum("bhij,bhjc->bhic", weight, v)
            message = message.transpose(0, 2, 1, 3).reshape(B, N, C)

        # fc_message MLP: C -> C/2 -> C/2 -> C with BN+ReLU (ref :13-21).
        m = nn.Dense(C // 2, kernel_init=_xavier, name="fc_message_0",
                     dtype=self.dtype)(message)
        m = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="fc_message_bn0",
                         dtype=self.dtype)(m)
        m = nn.relu(m)
        m = nn.Dense(C // 2, kernel_init=_xavier, name="fc_message_1",
                     dtype=self.dtype)(m)
        m = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="fc_message_bn1",
                         dtype=self.dtype)(m)
        m = nn.relu(m)
        message = nn.Dense(C, kernel_init=_xavier, name="fc_message_2",
                           dtype=self.dtype)(m)

        # Fusion-2: cross-attend correspondence features (queries) into the
        # fused image feature, with LCPE; ADDED to the message (ref :67-73).
        fused = FusionLayer(
            dim=C, latent_dim=C, depth=0, cross_heads=1, latent_heads=8,
            cross_dim_head=C // 2, latent_dim_head=C // 2, pe=True,
            name="fusion_layer_2", dtype=self.dtype,
        )(image_feat, queries_encoder=feat)

        out = message + fused
        if build_cache:
            return out, built_cache
        return out


class NonLocalNet(nn.Module):
    """Feature encoder: image fusion + num_layers x [PointCN, NonLocal].

    Parity: GMF_PointDSC/models/PointDSC.py:77-143.
    """

    in_dim: int = 6
    num_layers: int = 12
    num_channels: int = 128
    sigma_d: float = 0.10
    dtype: jnp.dtype = jnp.float32
    ring_mesh: object = None  # see NonLocalBlock.ring_mesh

    @nn.compact
    def __call__(self, corr_feat, corr_compatibility, p_image, q_image,
                 train: bool = False, corr_mask=None, src_keypts=None,
                 tgt_keypts=None, fused: bool = False, compat_cache=None):
        """corr_feat [B,N,6], compat [B,N,N], images [B,H,W,3] -> [B,N,C]."""
        C = self.num_channels

        # Image tokens must have num_channels features (the reference
        # hardwires both to 128); base_width = C/2 keeps that contract for
        # any width.
        encoder = ImageEncoder(name="image_encoder", base_width=C // 2,
                               dtype=self.dtype)
        p_tok = encoder.tokens(p_image, train=train)
        q_tok = encoder.tokens(q_image, train=train)

        # Fusion-1: source-image tokens are the content (K/V), target-image
        # tokens the queries; output = one fused texture feature (ref :137).
        image_feat = FusionLayer(
            dim=C, latent_dim=C, depth=0, cross_heads=1, latent_heads=8,
            cross_dim_head=C // 2, latent_dim_head=C // 2, pe=False,
            name="fusion_layer_1", dtype=self.dtype,
        )(p_tok, queries_encoder=q_tok)

        feat = nn.Dense(C, kernel_init=_xavier, name="layer0",
                        dtype=self.dtype)(corr_feat)
        # compat_cache == "fuse_int8": layer 0 runs the fused build+attend
        # kernel and EMITS the int8 cache layers 1.. then stream — the
        # standalone [Np, Np] build pass disappears (eval-only marker,
        # PointDSC._build_compat_cache)
        fuse_build = compat_cache == "fuse_int8"
        cache = None if fuse_build else compat_cache
        for i in range(self.num_layers):
            # PointCN layer: Dense + BN + ReLU (ref :104-109).
            feat = nn.Dense(C, kernel_init=_xavier, name=f"PointCN_layer_{i}",
                            dtype=self.dtype)(feat)
            feat = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=f"PointCN_bn_{i}",
                                dtype=self.dtype)(feat)
            feat = nn.relu(feat)
            block = NonLocalBlock(
                num_channels=C, sigma_d=self.sigma_d,
                name=f"NonLocal_layer_{i}", dtype=self.dtype,
                ring_mesh=self.ring_mesh,
            )
            if fuse_build and i == 0:
                feat, cache = block(
                    feat, corr_compatibility, image_feat, train=train,
                    corr_mask=corr_mask, src_keypts=src_keypts,
                    tgt_keypts=tgt_keypts, fused=fused, build_cache=True)
            else:
                feat = block(
                    feat, corr_compatibility, image_feat, train=train,
                    corr_mask=corr_mask, src_keypts=src_keypts,
                    tgt_keypts=tgt_keypts, fused=fused, compat_cache=cache)
        return feat


def _auto_compat_cache_dtype(B, Np):
    """Pick the compat-cache dtype for "auto" mode by HBM footprint.

    Small shapes keep the f32 cache (exact); past 1.5 GB the offset-
    quantized int8 cache takes over — equal streamed-tile time to bf16
    (108.5 vs 107.7 ms over the 12-layer stack at b=64 N=5120,
    serialized A/B) at HALF the HBM footprint, with the SAME worst-case
    dequant error as bf16 near compat=1.0 (1/508); the halved footprint
    is what buys headroom next to the [B,S,N] hypothesis-scoring
    tensors. The 1.75 GB int8 ceiling is empirical: the b=64 N=5120
    default cache (1.68 GB) fits and wins, but the lomatch b=2 N=30720
    one (1.89 GB) OOMed at 20.25/15.75 GB — a resident cache blocks
    buffer reuse across the [B,S,N] hypothesis-scoring live set, so the
    blow-up is ~2.4x the cache bytes. Past the ceiling, None: fall back
    to the streaming kernel (exact, O(N) memory); "int8"/"bf16"/"f32"
    stay available by name for deployments with more headroom.
    """
    if B * Np * Np * 4 <= 1.5e9:
        return jnp.float32
    if B * Np * Np <= 1.75e9:
        return jnp.int8
    return None


class PointDSC(nn.Module):
    """Full PointDSC+GMF model.

    Parity: GMF_PointDSC/models/PointDSC.py:146-528 (defaults from
    config_3DMatch.py: num_layers=12, num_channels=128, ratio=0.1,
    inlier_threshold=0.10, sigma_d=0.10, k=40, nms_radius=0.10).
    """

    in_dim: int = 6
    num_layers: int = 12
    num_channels: int = 128
    num_iterations: int = 10       # power-iteration cap
    ratio: float = 0.1             # seed ratio
    inlier_threshold: float = 0.10
    sigma_d: float = 0.10
    k: int = 40                    # seed-neighborhood size
    nms_radius: float = 0.10
    kabsch_method: str = "quat"
    fused_attention: bool = False  # Pallas flash path (eval, large N)
    # Precompute the spatial-consistency matrix ONCE per forward and
    # share it across the 12 attention layers ("auto" | "off" | "bf16" |
    # "f32" | "int8"). "auto" picks f32 when the [B, Np, Np] cache fits
    # in ~1.5 GB, else the offset-quantized int8 cache up to ~1.75 GB
    # (equal speed to bf16 at half the HBM footprint, same worst-case
    # dequant error; build_compat_cache docstring), else
    # falls back to per-layer streaming recompute; always off on CPU/
    # interpret (keeps small-N tests on the exact path). Only meaningful
    # with fused_attention. ~1.9x on the encoder stack
    # (ops/fused_attention.py module docstring).
    compat_cache: str = "auto"
    # Number of data-parallel shards the batch axis is split over at
    # dispatch time. The "auto" gate above compares the PER-CHIP cache
    # footprint against the HBM ceilings; under a mesh-sharded apply the
    # trace sees the GLOBAL batch, so the registrar/trainer clone the
    # model with compat_cache_shards=mesh.shape['data'] to keep the gate
    # per-chip-honest (a global-batch estimate would falsely disable the
    # cache on multi-chip runs).
    compat_cache_shards: int = 1
    # Seed-kNN top-k backend. "auto": fused on TPU (k+1 <= 128 guard),
    # exact elsewhere. "exact": lax.top_k over the einsum dist. "fused":
    # Pallas matmul+streaming-top-k (ops/fused_topk.py) — exact neighbor
    # sets ranked with f32 accumulation, no [B, S, N] dist in HBM;
    # 6.6x the einsum+top_k pair it replaces (scripts/bench_topk.py).
    # "values":
    # approx_max_k recall_target=1.0 — exact top-k VALUES via the native
    # PartialReduce; faster standalone (110 vs 162 ms) but identical
    # in-model (XLA fuses the bf16 ranking equally well); only tie ORDER
    # can differ, which the reference's CUDA topk leaves undefined anyway.
    # "approx": opt-in recall_target=0.95 — measured neighbor recall 0.99
    # and 370 -> 292.6 ms/batch (+27% pairs/s) on the b=64 eval forward
    # (scripts/bench_topk.py).
    knn_topk: str = "auto"
    # Hypothesis-scoring backend. "auto": fused on TPU, dense elsewhere.
    # "fused": Pallas bilinear-form kernel (ops/fused_scoring.py) — the
    # [B, S, N] warp/L2 tensors (6.4 GB f32 at the b=64 eval shape)
    # never exist in HBM; exact f32 integer counts (strictly closer to
    # the reference's f32 scoring than the bf16 dense path). "dense":
    # the XLA path. Selection ties at the d==threshold float knife-edge
    # may differ between backends (docstring in ops/fused_scoring.py).
    hypo_scoring: str = "auto"
    # Seed spectral-solver backend. "xla" (default, and what "auto"
    # resolves to): the batched XLA chain. "fused": Pallas rows-compact
    # kernel (ops/fused_seed_solver.py) computing the per-seed feat_M/
    # spatial_M/power-iteration weights with no [B*S, k, k] HBM tensors —
    # bit-accurate (~1e-7 vs XLA) but MEASURED SLOWER in-model (117-155
    # vs 222 pairs/s at the b=64 default bench, r4): at k=40 the per-seed
    # work is too small to amortize the kernel's per-tile segment matmuls
    # and grid overhead against XLA's fused batched ops. Kept as a
    # validated opt-in for future tuning; eval-only (stop_gradient
    # inside — training always takes the XLA path).
    seed_solver: str = "auto"
    # Sequence-parallel (SP/CP) megapair path: a jax.sharding.Mesh with a
    # 'data' axis. When set, every NonLocal layer runs ring attention —
    # correspondence tokens sharded over the mesh, K/V/keypoint shards
    # rotated with ppermute (parallel/ring_attention.py) — so a
    # num_node='all' pair whose [N, N] attention exceeds one chip's HBM
    # spreads across the slice. N must be divisible by the mesh size.
    # Numerically equal to the single-device paths
    # (tests/test_ring_model.py); overrides fused_attention for the
    # encoder while keeping the fused NMS kernel for seed selection.
    ring_mesh: object = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, corr_pos, src_keypts, tgt_keypts, p_image, q_image,
                 testing: bool = False, train: bool = False,
                 corr_mask=None):
        """Forward pass.

        Args:
          corr_pos:   [B, N, 6] centered 6D correspondence coordinates.
          src_keypts: [B, N, 3]; tgt_keypts: [B, N, 3].
          p_image, q_image: [B, H, W, 3] RGB frames (NHWC).
          testing: static flag — enables NMS seeds + post-refinement and
            skips the SM similarity matrix (ref :211,231-246).
          train: static flag — batch-norm in batch-stats mode.
          corr_mask: optional [B, N] validity mask for padded batches.

        Returns dict with final_trans [B,4,4], final_labels [B,N],
        M [B,N,N] (None when testing), seed_trans, seed_fitness, confidence.
        """
        B, N, _ = corr_pos.shape
        sigma = self.param("sigma", lambda _: jnp.ones((1,), self.dtype))
        sigma_spat = jnp.asarray(self.sigma_d, self.dtype)

        # Fused applies in training too: the Pallas kernel carries a flash
        # custom_vjp (ops/fused_attention.py), so large-N training never
        # materializes compat either. (The SM similarity matrix M is still
        # dense in train mode — it IS the SM-loss target, ref :231-234.)
        ring = self.ring_mesh is not None
        fused = self.fused_attention and not ring
        # Step 1: spatial-consistency matrix (no_grad in ref :216-221).
        # The fused Pallas path rebuilds it blockwise inside the attention
        # kernel (and the NMS kernel) instead of materializing any [N, N]
        # tensor here; the ring path rebuilds it per K/V shard block.
        if ring:
            src_dist = None
            corr_compatibility = None
            cache_arr = None
        elif fused:
            src_dist = None
            corr_compatibility = None
            cache_arr = self._build_compat_cache(src_keypts, tgt_keypts,
                                                 B, N, testing=testing)
        else:
            cache_arr = None
            src_dist = jax.lax.stop_gradient(jnp.linalg.norm(
                src_keypts[:, :, None, :] - src_keypts[:, None, :, :],
                axis=-1
            ))
            tgt_dist = jnp.linalg.norm(
                tgt_keypts[:, :, None, :] - tgt_keypts[:, None, :, :],
                axis=-1
            )
            corr_compatibility = src_dist - tgt_dist
            corr_compatibility = jnp.clip(
                1.0 - corr_compatibility ** 2 / sigma_spat ** 2, 0.0, None
            )
            corr_compatibility = jax.lax.stop_gradient(corr_compatibility)

        corr_features = NonLocalNet(
            in_dim=self.in_dim, num_layers=self.num_layers,
            num_channels=self.num_channels, sigma_d=self.sigma_d,
            name="encoder", dtype=self.dtype, ring_mesh=self.ring_mesh,
        )(corr_pos, corr_compatibility, p_image, q_image, train=train,
          corr_mask=corr_mask, src_keypts=src_keypts, tgt_keypts=tgt_keypts,
          fused=fused, compat_cache=cache_arr)
        # sqrt(sum+eps) keeps the normalization gradient finite even for
        # all-zero feature rows (NaN-free training; see spectral._safe_norm).
        normed_corr_features = corr_features / jnp.sqrt(
            jnp.sum(corr_features ** 2, axis=-1, keepdims=True) + 1e-12
        )

        if not testing:
            # Feature-similarity matrix for the SM loss (ref :231-234).
            M = jnp.matmul(
                normed_corr_features,
                jnp.swapaxes(normed_corr_features, -1, -2),
                precision=_PREC,
            )
            M = jnp.clip(1.0 - (1.0 - M) / sigma ** 2, 0.0, 1.0)
            M = M * (1.0 - jnp.eye(N, dtype=M.dtype))  # zero diagonal
        else:
            M = None

        # Step 2: confidence MLP (ref :175-181, :241).
        c = nn.Dense(32, kernel_init=_xavier, name="classification_0",
                     dtype=self.dtype)(corr_features)
        c = nn.relu(c)
        c = nn.Dense(32, kernel_init=_xavier, name="classification_1",
                     dtype=self.dtype)(c)
        c = nn.relu(c)
        confidence = nn.Dense(1, kernel_init=_xavier, name="classification_2",
                              dtype=self.dtype)(c)[..., 0]

        num_seeds = max(int(N * self.ratio), 1)
        if testing:
            conf_sg = jax.lax.stop_gradient(confidence)
            if fused or ring:
                # ring has no dense src_dist either; the fused NMS kernel
                # (keypoints + confidence only) serves both paths
                from gmf_tpu.ops.fused_nms import pick_seeds_nms_fused

                seeds = pick_seeds_nms_fused(
                    src_keypts, conf_sg, self.nms_radius, num_seeds,
                    mask=corr_mask,
                    interpret=jax.default_backend() != "tpu")
            else:
                seeds = pick_seeds_nms(src_dist, conf_sg, self.nms_radius,
                                       num_seeds, mask=corr_mask)
        else:
            ranked = confidence if corr_mask is None else jnp.where(
                corr_mask > 0, confidence, -jnp.inf
            )
            seeds = jnp.argsort(-ranked, axis=-1)[:, :num_seeds]
            seeds = jax.lax.stop_gradient(seeds).astype(jnp.int32)

        # Steps 3-4: per-seed spectral matching + Kabsch + selection.
        seed_trans, seed_fitness, final_trans, final_labels = (
            self._cal_seed_trans(
                seeds, sigma, normed_corr_features, src_keypts, tgt_keypts,
                corr_mask, testing=testing,
            )
        )

        if testing:
            final_trans = self._post_refinement(
                final_trans, src_keypts, tgt_keypts, corr_mask
            )
        else:
            final_labels = confidence

        return {
            "final_trans": final_trans,
            "final_labels": final_labels,
            "M": M,
            "seed_trans": seed_trans,
            "seed_fitness": seed_fitness,
            "confidence": confidence,
        }

    def _build_compat_cache(self, src_keypts, tgt_keypts, B, N,
                            testing: bool = False):
        """Resolve the compat_cache mode and build the [B, Np, Np] cache
        (or None). "auto" gates on the cache's HBM footprint; interpret
        (CPU) mode stays on the streaming kernel unless forced.

        In eval (testing) with an int8 cache, returns the marker string
        "fuse_int8" instead of building: NonLocalNet's first layer then
        runs the fused build+attend kernel, folding the standalone
        [Np, Np] build pass into layer-1 work (bitwise-identical cache
        and outputs; ops/fused_attention.py compat_flash_attention_build
        — eval-only because the build kernel has no custom_vjp)."""
        mode = self.compat_cache
        if mode in ("off", False, None):
            return None
        if mode not in ("auto", "bf16", "f32", "int8", True):
            raise ValueError(f"unknown compat_cache mode {mode!r}")
        from gmf_tpu.ops.fused_attention import (build_compat_cache,
                                                 padded_len)

        interpret = jax.default_backend() != "tpu"
        Np = padded_len(N, interpret=interpret)
        if mode in ("auto", True):
            if interpret:
                return None
            cdt = _auto_compat_cache_dtype(
                -(-B // max(1, self.compat_cache_shards)), Np)
            if cdt is None:
                return None
        else:
            cdt = {"f32": jnp.float32, "int8": jnp.int8}.get(mode,
                                                             jnp.bfloat16)
        if cdt == jnp.int8 and testing:
            return "fuse_int8"
        cache = jax.vmap(
            lambda s, t: build_compat_cache(
                s.astype(jnp.float32), t.astype(jnp.float32),
                sigma_d=self.sigma_d, dtype=cdt, interpret=interpret)
        )(src_keypts, tgt_keypts)
        # compat is no-grad in the reference (PointDSC.py:216-221)
        return jax.lax.stop_gradient(cache)

    # -- seed-local spectral matching + hypothesis selection --------------

    def _cal_seed_trans(self, seeds, sigma, corr_features, src_keypts,
                        tgt_keypts, corr_mask, testing: bool = False):
        """Parity: GMF_PointDSC/models/PointDSC.py:303-427."""
        B, N, C = corr_features.shape
        k = min(self.k, N - 1)
        sigma_spat = jnp.asarray(self.sigma_d, self.dtype)

        # Seed-row kNN. The reference computes kNN for ALL N rows and then
        # gathers the seed rows (PointDSC.py:327-335); since rows are
        # independent, restricting the search to the S = N*ratio seed rows
        # is bit-identical and cuts the top_k cost 10x (TPU top_k over
        # [B, N, N] dominated the whole forward).
        seed_feats = jax.vmap(lambda xb, ib: xb[ib])(corr_features, seeds)
        # ignore_self via k+1 then dropping the closest (the seed itself),
        # exactly as the reference's knn(ignore_self=True).
        mode = self.knn_topk
        if mode == "auto":
            # Fused Pallas backend on TPU when k+1 fits the kernel's lane
            # width (6.6x the einsum+top_k pair at the b=64 eval shape);
            # plain XLA exact elsewhere (the interpreter is test-only).
            mode = ("fused" if jax.default_backend() == "tpu"
                    and k + 1 <= 128 else "exact")
        if mode == "fused":
            # Pallas fused matmul+top-k: exact neighbor sets (f32-accum
            # ranking), no [B, S, N] dist materialization — ~10x the
            # XLA einsum+top_k pair at the b=64 eval shape.
            from gmf_tpu.ops.fused_topk import seed_knn_topk

            interp = jax.default_backend() != "tpu"
            if corr_mask is None:
                knn_idx, _ = jax.vmap(
                    lambda sf, fb: seed_knn_topk(
                        sf, fb, k + 1, interpret=interp)
                )(seed_feats, corr_features)
            else:
                knn_idx, _ = jax.vmap(
                    lambda sf, fb, mb: seed_knn_topk(
                        sf, fb, k + 1, mask=mb, interpret=interp)
                )(seed_feats, corr_features, corr_mask)
            knn_idx = knn_idx[..., 1:]
            return self._seed_trans_from_knn(
                seeds, sigma, corr_features, src_keypts, tgt_keypts,
                corr_mask, knn_idx, testing=testing)
        dist = 2.0 - 2.0 * jnp.einsum(
            "bsc,bnc->bsn", seed_feats, corr_features, precision=_PREC)
        if corr_mask is not None:
            dist = jnp.where(corr_mask[:, None, :] > 0, dist, jnp.inf)
        if mode == "exact":
            _, knn_idx = jax.lax.top_k(-dist, k + 1)
        elif mode in ("values", "approx"):
            # TPU-native PartialReduce top-k; rt=1.0 returns the exact
            # top-k values (only tie order may differ from lax.top_k).
            # f32 operand: the ApproxTopK custom call rejects bf16, and
            # ranking in f32 is what the exact path effectively does.
            _, knn_idx = jax.lax.approx_max_k(
                (-dist).astype(jnp.float32), k + 1,
                recall_target=1.0 if mode == "values" else 0.95,
                aggregate_to_topk=True)
        else:
            raise ValueError(f"unknown knn_topk mode {self.knn_topk!r}")
        knn_idx = knn_idx[..., 1:]
        return self._seed_trans_from_knn(
            seeds, sigma, corr_features, src_keypts, tgt_keypts, corr_mask,
            knn_idx, testing=testing)

    def _seed_trans_from_knn(self, seeds, sigma, corr_features, src_keypts,
                             tgt_keypts, corr_mask, knn_idx,
                             testing: bool = False):
        """Steps 3-4 of _cal_seed_trans given the seed neighbor indices
        (shared by every knn_topk backend).
        Parity: GMF_PointDSC/models/PointDSC.py:337-427."""
        B, N, C = corr_features.shape
        k = knn_idx.shape[-1]
        sigma_spat = jnp.asarray(self.sigma_d, self.dtype)

        # Flat 2D gathers with global row ids instead of a vmapped
        # per-batch gather, and BOTH coordinate sets through one packed
        # [B*N, 8] f32 plane. Bit-identical outputs, ~1.8x faster on TPU:
        # the [B,S,k,3] coord gathers lane-pad 3->128 (16-43x wasted HBM
        # traffic) and the vmapped form lowers worse than one flat gather
        # (35.5 -> ~20 ms of the 55 ms spectral+Kabsch block at the b=64
        # eval shape — scripts/bench_gather_variants.py).
        S_ = knn_idx.shape[1]
        rows = (knn_idx.astype(jnp.int32)
                + (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
                ).reshape(-1)
        knn_features = corr_features.reshape(B * N, C)[rows].reshape(
            B, S_, k, C)
        packed = jnp.concatenate(
            [src_keypts, tgt_keypts,
             jnp.zeros((B, N, 2), src_keypts.dtype)], -1
        ).reshape(B * N, 8)
        g = packed[rows].reshape(B, S_, k, 8)
        src_knn, tgt_knn = g[..., :3], g[..., 3:6]

        S = seeds.shape[1]
        ssmode = self.seed_solver
        if ssmode == "auto":
            # measured: the fused kernel loses to XLA at reference shapes
            # (see the seed_solver attribute docstring) — auto stays XLA
            ssmode = "xla"
        if ssmode == "fused" and not testing:
            # the fused kernel is eval-only (stop_gradient inside would
            # silently zero the seed spectral weights' gradient) — train
            # mode always takes the differentiable XLA graph below
            ssmode = "xla"
        if ssmode == "fused":
            # Pallas rows-compact kernel (ops/fused_seed_solver.py):
            # feat_M / spatial_M / power iteration fused in VMEM, no
            # [B*S, k, k] HBM tensors. Eval-only (stop_gradient inside);
            # the train path always uses the XLA graph below.
            from gmf_tpu.ops.fused_seed_solver import fused_seed_weights

            interp = jax.default_backend() != "tpu"
            sig_sc = jnp.asarray(sigma, jnp.float32).reshape(())
            total_weight = jax.vmap(
                lambda f, s, t: fused_seed_weights(
                    f, s, t, sig_sc, self.sigma_d,
                    num_iters=self.num_iterations, interpret=interp)
            )(knn_features, src_knn.astype(jnp.float32),
              tgt_knn.astype(jnp.float32))
        elif ssmode == "xla":
            # Feature-similarity block (ref :337-341).
            feat_M = jnp.einsum("bskc,bsjc->bskj", knn_features,
                                knn_features, precision=_PREC)
            feat_M = jnp.clip(1.0 - (1.0 - feat_M) / sigma ** 2, 0.0, None)

            # Spatial-consistency block (ref :347-354).
            src_d = jnp.linalg.norm(
                src_knn[:, :, :, None, :] - src_knn[:, :, None, :, :],
                axis=-1
            )
            tgt_d = jnp.linalg.norm(
                tgt_knn[:, :, :, None, :] - tgt_knn[:, :, None, :, :],
                axis=-1
            )
            spatial_M = jnp.clip(
                1.0 - (src_d - tgt_d) ** 2 / sigma_spat ** 2, 0.0, None
            )

            total_M = feat_M * spatial_M
            total_M = total_M * (1.0 - jnp.eye(k, dtype=total_M.dtype))

            # Power iteration on each seed block (ref :363, :429-448).
            # Test mode uses the reference's early-exit power iteration;
            # the train path needs reverse-mode autodiff, so it unrolls
            # the fixed 10-step variant (identical at convergence,
            # lax.while_loop is not reverse-differentiable).
            eig = (leading_eigenvector if testing
                   else leading_eigenvector_fixed)
            total_weight = eig(
                total_M.reshape(B * S, k, k), num_iters=self.num_iterations
            ).reshape(B, S, k)
            total_weight = total_weight / (
                jnp.sum(total_weight, axis=-1, keepdims=True) + 1e-6
            )
        else:
            raise ValueError(
                f"unknown seed_solver mode {self.seed_solver!r}")

        # Weighted Kabsch per seed (ref :405) — batched on-device.
        seedwise_trans = rigid_transform_3d(
            src_knn.reshape(B * S, k, 3),
            tgt_knn.reshape(B * S, k, 3),
            total_weight.reshape(B * S, k),
            method=self.kabsch_method,
        ).reshape(B, S, 4, 4)

        # Hypothesis scoring: inlier count under each seed transform
        # (ref :413-419).
        smode = self.hypo_scoring
        if smode == "auto":
            smode = "fused" if jax.default_backend() == "tpu" else "dense"
        if smode == "fused":
            # Pallas bilinear-form kernel (ops/fused_scoring.py): exact
            # f32 counts, no [B, S, N] HBM tensors. The best seed's L2
            # row is recomputed below from final_trans alone ([B, N] —
            # same einsum/precision as the dense path).
            from gmf_tpu.ops.fused_scoring import seed_hypothesis_counts

            interp = jax.default_backend() != "tpu"
            if corr_mask is None:
                counts = jax.vmap(
                    lambda tr, s, t: seed_hypothesis_counts(
                        tr, s, t, self.inlier_threshold, interpret=interp)
                )(seedwise_trans, src_keypts, tgt_keypts)
                seedwise_fitness = (counts / N).astype(self.dtype)
            else:
                counts = jax.vmap(
                    lambda tr, s, t, m: seed_hypothesis_counts(
                        tr, s, t, self.inlier_threshold, mask=m,
                        interpret=interp)
                )(seedwise_trans, src_keypts, tgt_keypts, corr_mask)
                seedwise_fitness = (counts / (
                    jnp.sum(corr_mask, axis=-1)[:, None] + 1e-6
                )).astype(self.dtype)
            best = jnp.argmax(seedwise_fitness, axis=-1)
            final_trans = jnp.take_along_axis(
                seedwise_trans, best[:, None, None, None], axis=1
            ).squeeze(1)
            pred_best = jnp.einsum(
                "bij,bnj->bni", final_trans[:, :3, :3], src_keypts,
                precision=_PREC,
            ) + final_trans[:, None, :3, 3]
            final_L2 = jnp.linalg.norm(pred_best - tgt_keypts, axis=-1)
        elif smode == "dense":
            pred = jnp.einsum(
                "bsij,bnj->bsni", seedwise_trans[:, :, :3, :3], src_keypts,
                precision=_PREC,
            ) + seedwise_trans[:, :, None, :3, 3]
            L2_dis = jnp.linalg.norm(pred - tgt_keypts[:, None, :, :],
                                     axis=-1)
            inlier = (L2_dis < self.inlier_threshold).astype(self.dtype)
            if corr_mask is not None:
                inlier = inlier * corr_mask[:, None, :]
                seedwise_fitness = jnp.sum(inlier, axis=-1) / (
                    jnp.sum(corr_mask, axis=-1)[:, None] + 1e-6
                )
            else:
                seedwise_fitness = jnp.mean(inlier, axis=-1)

            best = jnp.argmax(seedwise_fitness, axis=-1)
            final_trans = jnp.take_along_axis(
                seedwise_trans, best[:, None, None, None], axis=1
            ).squeeze(1)
            final_L2 = jnp.take_along_axis(
                L2_dis, best[:, None, None], axis=1
            ).squeeze(1)
        else:
            raise ValueError(
                f"unknown hypo_scoring mode {self.hypo_scoring!r}")
        final_labels = (final_L2 < self.inlier_threshold).astype(self.dtype)
        if corr_mask is not None:
            final_labels = final_labels * corr_mask

        return seedwise_trans, seedwise_fitness, final_trans, final_labels

    # -- test-time iterative refinement -----------------------------------

    def _post_refinement(self, initial_trans, src_keypts, tgt_keypts,
                         corr_mask):
        """Iterative weighted re-fitting with the reference's stopping rule.

        Parity: GMF_PointDSC/models/PointDSC.py:493-528 — 20 rounds max,
        threshold 0.10 (3DMatch) / 1.2 (KITTI), break when the inlier count
        stops changing; weights = inlier * 1/(1+(d/tau)^2).
        """
        tau = 0.10 if self.inlier_threshold == 0.10 else 1.2
        max_rounds = 20

        def body(carry):
            trans, prev_num, it, _ = carry
            warped = transform(src_keypts, trans)
            L2 = jnp.linalg.norm(warped - tgt_keypts, axis=-1)
            pred_inlier = (L2 < tau).astype(self.dtype)
            if corr_mask is not None:
                pred_inlier = pred_inlier * corr_mask
            num = jnp.sum(pred_inlier, axis=-1).astype(jnp.int32)
            go_on = jnp.any(jnp.abs(num - prev_num) >= 1)
            w = pred_inlier * (1.0 / (1.0 + (L2 / tau) ** 2))
            new_trans = rigid_transform_3d(
                src_keypts, tgt_keypts, w, method=self.kabsch_method
            )
            trans = jnp.where(go_on, new_trans, trans)
            return trans, num, it + 1, go_on

        def cond(carry):
            _, _, it, go_on = carry
            return jnp.logical_and(it < max_rounds, go_on)

        B = initial_trans.shape[0]
        init = (
            initial_trans,
            jnp.zeros((B,), jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(True),
        )
        final_trans, _, _, _ = jax.lax.while_loop(cond, body, init)
        return final_trans
