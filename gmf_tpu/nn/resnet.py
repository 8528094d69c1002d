"""ResNet-34 image encoder truncated at layer2 (stride /8, 128 channels).

Parity targets (SURVEY.md §2.1 F3):
- GMF_PointDSC/models/resnet.py:118-248 (torchvision ResNet-34 with the
  forward cut after layer2: conv1/bn/relu -> maxpool -> layer1 -> layer2)
- GMF_PointDSC/models/Img_Encoder.py:9-18 (ImageEncoder wrapper)

Input [B, H, W, 3] NHWC (TPU-native layout; the reference uses NCHW),
output [B, H/8, W/8, 128]. For the reference's 120x160 images this yields
15x20 = 300 image tokens.

The reference loads ImageNet-pretrained torchvision weights; with zero
egress we initialize with He-normal (the torch init, resnet.py:155-160) and
provide a torchvision state_dict converter in utils/convert_torch.py.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


class BasicBlock(nn.Module):
    """Two 3x3 convs + BN + ReLU with identity/downsample skip."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, name="conv1",
            dtype=self.dtype,
        )(x)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn1", dtype=self.dtype,
        )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            name="conv2", dtype=self.dtype,
        )(out)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn2", dtype=self.dtype,
        )(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv", dtype=self.dtype,
            )(x)
            identity = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="downsample_bn", dtype=self.dtype,
            )(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet trunk truncated after layer2 (matches the reference forward).

    ``layers`` counts BasicBlocks per stage; ResNet-34 uses (3, 4) for the
    two retained stages. ``base_width`` scales channel counts (64 -> the
    reference geometry: 64ch stage1, 128ch stage2); smaller values are for
    tests only.
    """

    layers: Sequence[int] = (3, 4)
    base_width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.base_width
        x = nn.Conv(
            w, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, name="conv1", dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn1", dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i in range(self.layers[0]):  # layer1: w ch, stride 1
            x = BasicBlock(w, name=f"layer1_{i}", dtype=self.dtype)(x, train)
        for i in range(self.layers[1]):  # layer2: 2w ch, first block strides
            x = BasicBlock(
                2 * w, stride=2 if i == 0 else 1, downsample=(i == 0),
                name=f"layer2_{i}", dtype=self.dtype,
            )(x, train)
        return x


class ImageEncoder(nn.Module):
    """ResNet-34/8 encoder producing image tokens.

    ``__call__`` returns the [B, H/8, W/8, 128] feature map;
    ``tokens`` flattens it to [B, H*W/64, 128] (the reference's
    view+permute at PointDSC.py:129-135).
    """

    base_width: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = ResNet(layers=(3, 4), base_width=self.base_width,
                               dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        return self.backbone(x, train)

    def tokens(self, x, train: bool = False):
        feat = self.backbone(x, train)
        B, H, W, C = feat.shape
        return feat.reshape(B, H * W, C)
