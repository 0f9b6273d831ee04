"""Backbone feature pyramids (NHWC, flax).

Re-designed equivalents of the reference's truncated torchvision classifiers
(reference: model_feature.py:49-128). Each backbone returns a 5-stage pyramid
(c1..c5) at strides (2, 4, 8, 16, 32); SRF-Net consumes c3/c4/c5.

Stage channel widths (reference: model.py:25-33):
    mobilenet_v2: c2..c5 = 24, 32, 96, 320
    resnet18/34 : 64, 128, 256, 512
    resnet50+   : 256, 512, 1024, 2048
    vgg16       : 128, 256, 512, 512

MobileNetV2 reproduces the torchvision layer table exactly (including the
stage cut points features[0:2]/[2:4]/[4:7]/[7:14]/[14:18] at
reference model_feature.py:63-68) so that converted ImageNet weights drop in.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.layers import ConvBNAct, DWBlock, S2DStem

FEATURE_INPLANES = {
    "vgg16": [128, 256, 512, 512],
    "resnet18": [64, 128, 256, 512],
    "resnet34": [64, 128, 256, 512],
    "resnet50": [256, 512, 1024, 2048],
    "resnet101": [256, 512, 1024, 2048],
    "resnet152": [256, 512, 1024, 2048],
    "mobilenet_v2": [24, 32, 96, 320],
}

# MobileNetV2 inverted-residual table: (expand_ratio, out_ch, num_blocks, stride)
_MBV2_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class MobileNetV2Pyramid(nn.Module):
    """MobileNetV2 feature trunk, cut into the reference's 5 stages.

    Layer indices follow torchvision's `features` numbering so a converted
    checkpoint maps 1:1: block modules are named `features_{i}`.
    Stage boundaries: c1=[0:2], c2=[2:4], c3=[4:7], c4=[7:14], c5=[14:18].

    `s2d_stem=True` runs features[0] as the exact 2x2 space-to-depth
    reparametrization (ops.layers.S2DStem — identical math and variable
    tree, better MXU occupancy on the 3-channel input; needs even H, W).
    """

    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # features[0]: stem ConvBNReLU6 3->32 s2
        stem = S2DStem(32, name="features_0") if self.s2d_stem else \
            ConvBNAct(32, kernel_size=3, stride=2, name="features_0")
        x = stem(x, train)
        outs = []
        idx = 1
        stage_ends = {1: None, 3: None, 6: None, 13: None, 17: None}
        for expand, ch, n, stride in _MBV2_CFG:
            for b in range(n):
                s = stride if b == 0 else 1
                x = DWBlock(
                    ch,
                    kernel_size=3,
                    stride=s,
                    expand_ratio=expand,
                    name=f"features_{idx}",
                )(x, train)
                if idx in stage_ends:
                    outs.append(x)
                idx += 1
        return tuple(outs)  # c1(16,s2), c2(24,s4), c3(32,s8), c4(96,s16), c5(320,s32)


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBNAct(self.features, 3, stride=self.stride, act=nn.relu, name="conv1")(x, train)
        y = ConvBNAct(self.features, 3, act=None, name="conv2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = ConvBNAct(self.features, 1, stride=self.stride, act=None, name="downsample")(
                x, train
            )
        return nn.relu(y + identity)


class _Bottleneck(nn.Module):
    features: int  # output channels (4x the bottleneck width)
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.features // 4
        identity = x
        y = ConvBNAct(width, 1, act=nn.relu, name="conv1")(x, train)
        y = ConvBNAct(width, 3, stride=self.stride, act=nn.relu, name="conv2")(y, train)
        y = ConvBNAct(self.features, 1, act=None, name="conv3")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = ConvBNAct(self.features, 1, stride=self.stride, act=None, name="downsample")(
                x, train
            )
        return nn.relu(y + identity)


_RESNET_LAYERS = {
    "resnet18": ("basic", [2, 2, 2, 2]),
    "resnet34": ("basic", [3, 4, 6, 3]),
    "resnet50": ("bottleneck", [3, 4, 6, 3]),
    "resnet101": ("bottleneck", [3, 4, 23, 3]),
    "resnet152": ("bottleneck", [3, 8, 36, 3]),
}


class ResNetPyramid(nn.Module):
    """ResNet trunk returning (x0..x4) like the reference's ReResNet
    (reference: model_feature.py:72-103)."""

    name_id: str = "resnet50"

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, layers = _RESNET_LAYERS[self.name_id]
        block = _BasicBlock if block_kind == "basic" else _Bottleneck
        expansion = 1 if block_kind == "basic" else 4

        x = ConvBNAct(64, kernel_size=7, stride=2, act=nn.relu, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = [x]
        for i, n in enumerate(layers):
            stride = 1 if i == 0 else 2
            planes = 64 * (2 ** i)  # 64/128/256/512 per stage (x expansion)
            for b in range(n):
                x = block(
                    planes * expansion,
                    stride=stride if b == 0 else 1,
                    name=f"layer{i + 1}_{b}",
                )(x, train)
            outs.append(x)
        return tuple(outs)


_VGG16_CFG = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


class VGGPyramid(nn.Module):
    """VGG16 trunk; each stage includes its trailing 2x2 maxpool, matching the
    reference's maxpool-boundary slicing (reference: model_feature.py:118-128)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for s, (ch, n) in enumerate(_VGG16_CFG):
            for b in range(n):
                x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], name=f"conv{s + 1}_{b + 1}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            outs.append(x)
        return tuple(outs)


def build_backbone(cnn_type: str, s2d_stem: bool = False) -> nn.Module:
    cnn_type = cnn_type.lower()
    if cnn_type == "mobilenet_v2":
        return MobileNetV2Pyramid(s2d_stem=s2d_stem, name="features")
    if s2d_stem:
        raise NotImplementedError(
            f"s2d_stem is only implemented for mobilenet_v2 (got {cnn_type})")
    if cnn_type.startswith("resnet"):
        return ResNetPyramid(name_id=cnn_type, name="features")
    if cnn_type == "vgg16":
        return VGGPyramid(name="features")
    raise NotImplementedError(cnn_type)
