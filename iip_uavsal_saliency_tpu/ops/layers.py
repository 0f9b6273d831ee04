"""Core conv building blocks (NHWC, flax.linen).

TPU-native equivalents of the reference's conv primitives:

- `ConvBNAct`  == BasicConv2d: Conv -> BatchNorm -> ReLU6
  (reference: model.py:65-72).
- `DWBlock`    == dwBlock: MobileNetV2 inverted residual — 1x1 expand (ratio 6)
  -> depthwise kxk -> 1x1 linear + BN, with optional identity residual
  (reference: model.py:74-103).
- `ConvBNAct3D` == BasicConv3d for the 3D-conv ablations
  (reference: model.py:383-390).

Design notes (TPU):
- NHWC activations / HWIO kernels — XLA's native conv layout on TPU; the
  pointwise 1x1 convs lower to plain MXU matmuls over the channel axis.
- Depthwise convs use `feature_group_count == channels`; XLA fuses the
  BN scale/shift and ReLU6 into the conv epilogue.
- BatchNorm matches torch semantics: eps=1e-5, running-stat update factor 0.1
  (flax momentum 0.9), biased variance for normalization.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .initializers import make_conv_init

BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # flax convention: new = m*old + (1-m)*batch  (== torch 0.1)


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class ConvBNAct(nn.Module):
    """Conv2d(bias=False) + BatchNorm + ReLU6, 'same'-style symmetric padding.

    padding = dilation * (kernel_size - 1) // 2, as in the reference.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    act: Optional[Callable] = relu6
    kernel_init_name: str = "kaiming_normal"
    kernel_init_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel_size - 1) // 2
        kw = dict(self.kernel_init_kwargs or {})
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=make_conv_init(self.kernel_init_name, **kw),
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DWBlock(nn.Module):
    """Inverted-residual depthwise-separable block (expand_ratio default 6).

    Structure: [1x1 ConvBNAct expand] -> depthwise kxk ConvBNAct ->
    1x1 Conv (linear) + BN; identity residual iff stride==1 and inp==oup
    (optionally forced off via `res_connect=False`).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1
    res_connect: Optional[bool] = None
    kernel_init_name: str = "kaiming_normal"
    kernel_init_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        use_res = self.stride == 1 and inp == self.features
        if self.res_connect is not None:
            use_res = use_res and self.res_connect

        init_args = dict(
            kernel_init_name=self.kernel_init_name,
            kernel_init_kwargs=self.kernel_init_kwargs,
        )

        y = x
        if self.expand_ratio != 1:
            y = ConvBNAct(hidden, kernel_size=1, name="expand", **init_args)(y, train)
        y = ConvBNAct(
            hidden,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            groups=hidden,
            name="dw",
            **init_args,
        )(y, train)
        kw = dict(self.kernel_init_kwargs or {})
        y = nn.Conv(
            features=self.features,
            kernel_size=(1, 1),
            use_bias=False,
            kernel_init=make_conv_init(self.kernel_init_name, **kw),
            name="project",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="project_bn",
        )(y)
        return x + y if use_res else y


class ConvBNAct3D(nn.Module):
    """Conv3d(bias=False) + BatchNorm + ReLU6 over NDHWC (for STC3D ablations)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    kernel_init_name: str = "kaiming_normal"
    kernel_init_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel_size - 1) // 2
        kw = dict(self.kernel_init_kwargs or {})
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,) * 3,
            strides=(self.stride,) * 3,
            padding=[(pad, pad)] * 3,
            kernel_dilation=(self.dilation,) * 3,
            use_bias=False,
            kernel_init=make_conv_init(self.kernel_init_name, **kw),
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="bn",
        )(x)
        return relu6(x)
