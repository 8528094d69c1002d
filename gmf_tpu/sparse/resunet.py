"""Sparse ResUNet family: FCGF descriptor net + GMF-fused 6D inlier net.

Parity targets:
- GMF_DGR_fcgf/model/resunet.py + misc/fcgf.py ``ResUNetBN2C`` (D=3,
  1->32 features, conv1_kernel_size 5/7): 4-level encoder
  CHANNELS=[32,64,128,256], 3-level decoder TR=[64,64,64,128], residual
  BasicBlocks, skip ME.cat, final 1x1 conv, optional feature L2-norm.
- GMF_DGR_fcgf/model/resunet_new.py ``ResUNetBN2C`` (D=6, 1->1): same
  trunk + GMF fusion — ImageEncoder on both frames, Fusion-1 across image
  tokens (resunet_new.py:616-626,630-638), PerceiverIO Fusion-2 REPLACING
  the bottleneck features (:515-525,660,694-705).

TPU-first: all convolutions are gather-GEMM-scan over host-built static
kernel maps (see kernel_map.py/conv.py); batch norm is masked over padded
voxel capacities. The forward keeps the reference's exact block ordering,
including the pre-ReLU skip concatenations (resunet_new.py:664-686).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import flax.linen as nn

from gmf_tpu.sparse.conv import (
    SparseConv, MaskedBatchNorm, append_sentinel,
)
from gmf_tpu.nn.fusion import FusionLayer
from gmf_tpu.nn.resnet import ImageEncoder


def pyramid_to_arrays(pyr) -> Dict[str, jnp.ndarray]:
    """Convert a host SparsePyramid into the jittable dict of arrays."""
    import numpy as np

    arrays: Dict[str, jnp.ndarray] = {
        "conv1_map": jnp.asarray(pyr.conv1_map),
        "conv1_kept": jnp.asarray(pyr.conv1_kept),
    }
    for l, lv in enumerate(pyr.levels):
        mask = (np.arange(lv.cap) < lv.num_valid).astype(np.float32)
        arrays[f"mask_{l}"] = jnp.asarray(mask)
        arrays[f"self_map_{l}"] = jnp.asarray(lv.self_map)
        arrays[f"self_kept_{l}"] = jnp.asarray(lv.self_kept)
        if lv.down_map is not None:
            arrays[f"down_map_{l}"] = jnp.asarray(lv.down_map)
            arrays[f"down_kept_{l}"] = jnp.asarray(lv.down_kept)
            arrays[f"up_map_{l}"] = jnp.asarray(lv.up_map)
            arrays[f"up_kept_{l}"] = jnp.asarray(lv.up_kept)
    return arrays


class SparseBasicBlock(nn.Module):
    """Residual block: conv-BN-ReLU-conv-BN + skip, ReLU at the end.

    Parity: GMF_DGR model/residual_block.py BasicBlockBN.
    """

    channels: int
    kernel_volume: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, self_map, kept, train: bool = False):
        residual = x
        rows = x.shape[0]  # self maps: cap_out == cap_in (compact path)
        out = SparseConv(self.channels, self.kernel_volume, name="conv1",
                         dtype=self.dtype)(append_sentinel(x), self_map,
                                           kept, out_rows=rows)
        out = MaskedBatchNorm(name="norm1", dtype=self.dtype)(out, mask, train)
        out = nn.relu(out)
        out = SparseConv(self.channels, self.kernel_volume, name="conv2",
                         dtype=self.dtype)(append_sentinel(out), self_map,
                                           kept, out_rows=rows)
        out = MaskedBatchNorm(name="norm2", dtype=self.dtype)(out, mask, train)
        return nn.relu(out + residual)


class SparseResUNet2(nn.Module):
    """4-level sparse ResUNet (``ResUNetBN2C`` geometry).

    When ``with_gmf_fusion`` is set the module adds the GMF image path:
    ImageEncoder + Fusion-1 over image tokens + PerceiverIO Fusion-2
    replacing the bottleneck features (the DGR inlier net).
    """

    in_channels: int = 1
    out_channels: int = 32
    channels: Sequence[int] = (32, 64, 128, 256)
    tr_channels: Sequence[int] = (64, 64, 64, 128)
    dim: int = 3
    conv1_kernel_size: int = 3
    normalize_feature: bool = False
    with_gmf_fusion: bool = False
    image_dim: int = 128
    region: str = "hypercube"   # "hypercross" for the *X model variants
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, pyramid: Dict[str, jnp.ndarray],
                 p_image=None, q_image=None, train: bool = False):
        """feats: [cap0, in_channels]; pyramid: pyramid_to_arrays output."""
        if self.region == "hypercube":
            KV = 3 ** self.dim            # full kernel volume for k=3
            KV1 = self.conv1_kernel_size ** self.dim
        else:  # hypercross: center + 2r per axis
            KV = 1 + 2 * self.dim
            KV1 = 1 + (self.conv1_kernel_size // 2) * 2 * self.dim
        C = self.channels
        TR = self.tr_channels
        m = [pyramid[f"mask_{l}"] for l in range(4)]

        image_feat = None
        if self.with_gmf_fusion:
            assert p_image is not None and q_image is not None
            encoder = ImageEncoder(name="img_encoder",
                                   base_width=self.image_dim // 2,
                                   dtype=self.dtype)
            p_tok = encoder.tokens(p_image, train=train)
            q_tok = encoder.tokens(q_image, train=train)
            # Fusion-1 (resunet_new.py:616-626): DGR variant maps attention
            # output to query_dim.
            image_feat = FusionLayer(
                dim=self.image_dim, latent_dim=self.image_dim, depth=0,
                cross_heads=1, latent_heads=8, cross_dim_head=64,
                latent_dim_head=64, pe=False, out_to_context_dim=False,
                name="image_fusion", dtype=self.dtype,
            )(p_tok, queries_encoder=q_tok)

        def kmap(prefix):
            """(map-or-schedule, kept) for "conv1" / "self_map_l" /
            "down_map_l" / "up_map_l" — compact schedules (``*_cmp``
            keys, device_maps compact_conv=True) take priority."""
            cmp_key = ("conv1_cmp" if prefix == "conv1"
                       else prefix.replace("_map_", "_cmp_"))
            if cmp_key in pyramid:
                return pyramid[cmp_key], None
            if prefix == "conv1":
                return pyramid["conv1_map"], pyramid["conv1_kept"]
            return pyramid[prefix], pyramid[prefix.replace("_map_",
                                                           "_kept_")]

        def conv(x, name, cout, map_prefix, kv, out_rows, use_bias=False):
            nbr, kept = kmap(map_prefix)
            return SparseConv(cout, kv, use_bias=use_bias, name=name,
                              dtype=self.dtype)(append_sentinel(x), nbr,
                                                kept, out_rows=out_rows)

        def bn(x, name, mask):
            return MaskedBatchNorm(name=name, dtype=self.dtype)(x, mask, train)

        caps = [mm.shape[0] for mm in m]
        self_maps = [kmap(f"self_map_{l}") for l in range(4)]

        # ---- encoder ----
        out_s1 = conv(feats, "conv1", C[0], "conv1", KV1, caps[0])
        out_s1 = bn(out_s1, "norm1", m[0])
        out_s1 = SparseBasicBlock(C[0], KV, name="block1", dtype=self.dtype)(
            out_s1, m[0], *self_maps[0], train)
        out = nn.relu(out_s1)

        out_s2 = conv(out, "conv2", C[1], "down_map_0", KV, caps[1])
        out_s2 = bn(out_s2, "norm2", m[1])
        out_s2 = SparseBasicBlock(C[1], KV, name="block2", dtype=self.dtype)(
            out_s2, m[1], *self_maps[1], train)
        out = nn.relu(out_s2)

        out_s4 = conv(out, "conv3", C[2], "down_map_1", KV, caps[2])
        out_s4 = bn(out_s4, "norm3", m[2])
        out_s4 = SparseBasicBlock(C[2], KV, name="block3", dtype=self.dtype)(
            out_s4, m[2], *self_maps[2], train)
        out = nn.relu(out_s4)

        out_s8 = conv(out, "conv4", C[3], "down_map_2", KV, caps[3])
        out_s8 = bn(out_s8, "norm4", m[3])
        out_s8 = SparseBasicBlock(C[3], KV, name="block4", dtype=self.dtype)(
            out_s8, m[3], *self_maps[3], train)
        out = nn.relu(out_s8)

        # ---- GMF Fusion-2 at the bottleneck (resunet_new.py:660,694-705):
        # PerceiverIO output REPLACES the bottleneck features.
        if self.with_gmf_fusion:
            fused = FusionLayer(
                dim=self.image_dim, latent_dim=C[3], depth=0, cross_heads=1,
                latent_heads=8, cross_dim_head=C[3] // 2,
                latent_dim_head=C[3] // 2, pe=True, out_to_context_dim=False,
                name="perceiver_io", dtype=self.dtype,
            )(image_feat, queries_encoder=out[None])[0]
            out = fused * m[3][:, None]

        # ---- decoder ----
        out = conv(out, "conv4_tr", TR[3], "up_map_2", KV, caps[2])
        out = bn(out, "norm4_tr", m[2])
        out = SparseBasicBlock(TR[3], KV, name="block4_tr", dtype=self.dtype)(
            out, m[2], *self_maps[2], train)
        out_s4_tr = nn.relu(out)

        out = jnp.concatenate([out_s4_tr, out_s4], axis=-1)  # ME.cat

        out = conv(out, "conv3_tr", TR[2], "up_map_1", KV, caps[1])
        out = bn(out, "norm3_tr", m[1])
        out = SparseBasicBlock(TR[2], KV, name="block3_tr", dtype=self.dtype)(
            out, m[1], *self_maps[1], train)
        out_s2_tr = nn.relu(out)

        out = jnp.concatenate([out_s2_tr, out_s2], axis=-1)

        out = conv(out, "conv2_tr", TR[1], "up_map_0", KV, caps[0])
        out = bn(out, "norm2_tr", m[0])
        out = SparseBasicBlock(TR[1], KV, name="block2_tr", dtype=self.dtype)(
            out, m[0], *self_maps[0], train)
        out_s1_tr = nn.relu(out)

        out = jnp.concatenate([out_s1_tr, out_s1], axis=-1)
        # conv1_tr / final are 1x1 convs == Dense (kernel volume 1).
        out = nn.Dense(TR[0], use_bias=False, name="conv1_tr",
                       dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Dense(self.out_channels, use_bias=True, name="final",
                       dtype=self.dtype)(out)

        if self.normalize_feature:
            out = out / (jnp.sqrt(
                jnp.sum(out ** 2, axis=-1, keepdims=True) + 1e-16) + 1e-8)
        return out * m[0][:, None]


def FCGFNet(out_channels: int = 32, conv1_kernel_size: int = 7,
            normalize_feature: bool = True, dtype=jnp.float32):
    """FCGF descriptor backbone (misc/fcgf.py ResUNetBN2C, 1->32, conv1=7,
    voxel 0.05 — demo wiring demo_registration.py:14-25)."""
    return SparseResUNet2(
        in_channels=1, out_channels=out_channels, dim=3,
        conv1_kernel_size=conv1_kernel_size,
        normalize_feature=normalize_feature, dtype=dtype,
    )


def GMFInlierNet(dim: int = 6, conv1_kernel_size: int = 3,
                 in_channels: int = 1, dtype=jnp.float32):
    """GMF-fused 6D inlier classifier (resunet_new.py ResUNetBN2C, C->1).

    in_channels follows the engine's inlier_feature_type: 1 ('ones'),
    6 ('coords' = cos(xyz) pairs), 2*fcgf_dim ('feats') — the reference
    sizes the net the same way (core/trainer.py:81,90).
    """
    return SparseResUNet2(
        in_channels=in_channels, out_channels=1, dim=dim,
        conv1_kernel_size=conv1_kernel_size, normalize_feature=False,
        with_gmf_fusion=True, dtype=dtype,
    )
