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

    `use_pallas=True` (eval mode, TPU, bf16, 3x3 stride-1 undilated shapes
    that tile): the whole block runs as ONE fused Pallas kernel with
    eval-BN folded into the conv weights (ops/pallas_dwblock.py). Default
    None/False = the flax path — measured FASTER: XLA already runs this
    block at ~61% of MXU peak (49 vs the kernel's 90 us/frame at
    45x80x256 E=1536; docs/PERF.md), because it software-pipelines the
    three convs while the kernel serializes its MXU matmuls against the
    VPU depthwise taps. Kept as an opt-in tuning base with honest numbers.
    The variable tree is identical on both paths (the fused path binds the
    submodule params with negligible dummy calls).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1
    res_connect: Optional[bool] = None
    kernel_init_name: str = "kaiming_normal"
    kernel_init_kwargs: Optional[dict] = None
    use_pallas: Optional[bool] = None

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

        expand_mod = (
            ConvBNAct(hidden, kernel_size=1, name="expand", **init_args)
            if self.expand_ratio != 1
            else None
        )
        dw_mod = ConvBNAct(
            hidden,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            groups=hidden,
            name="dw",
            **init_args,
        )
        kw = dict(self.kernel_init_kwargs or {})
        proj_mod = nn.Conv(
            features=self.features,
            kernel_size=(1, 1),
            use_bias=False,
            kernel_init=make_conv_init(self.kernel_init_name, **kw),
            name="project",
        )
        pbn_mod = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="project_bn",
        )

        if self._fused_path(x, train, expand_mod is not None, use_res):
            import jax.numpy as _jnp

            from .pallas_dwblock import fold_conv_bn, fused_dwblock

            # bind the submodule params without running their convs on the
            # real input (dummy 1x1 spatial calls; identical variable tree)
            _ = expand_mod(x[:1, :1, :1, :], False)
            dummy = _jnp.zeros((1, 1, 1, hidden), x.dtype)
            _ = dw_mod(dummy, False)
            _ = pbn_mod(proj_mod(dummy))

            ev, dv, pv, bv = (
                expand_mod.variables, dw_mod.variables,
                proj_mod.variables, pbn_mod.variables,
            )
            w1, b1 = fold_conv_bn(
                ev["params"]["conv"]["kernel"][0, 0], ev["params"]["bn"]["scale"],
                ev["params"]["bn"]["bias"], ev["batch_stats"]["bn"]["mean"],
                ev["batch_stats"]["bn"]["var"], BN_EPS,
            )
            wd, bd = fold_conv_bn(
                dv["params"]["conv"]["kernel"][:, :, 0, :], dv["params"]["bn"]["scale"],
                dv["params"]["bn"]["bias"], dv["batch_stats"]["bn"]["mean"],
                dv["batch_stats"]["bn"]["var"], BN_EPS,
            )
            w2, b2 = fold_conv_bn(
                pv["params"]["kernel"][0, 0], bv["params"]["scale"],
                bv["params"]["bias"], bv["batch_stats"]["mean"],
                bv["batch_stats"]["var"], BN_EPS,
            )
            cast = lambda a: a.astype(x.dtype)  # noqa: E731
            return fused_dwblock(
                x, cast(w1), cast(b1), cast(wd), cast(bd), cast(w2), cast(b2),
                bool(use_res),
            )

        y = x
        if expand_mod is not None:
            y = expand_mod(y, train)
        y = dw_mod(y, train)
        y = pbn_mod(proj_mod(y))
        return x + y if use_res else y

    def _fused_path(self, x, train: bool, has_expand: bool, use_res: bool) -> bool:
        if train or not has_expand or x.ndim != 4:
            return False
        # default OFF: XLA's pipelined convs beat the fused kernel here
        # (49 vs 90 us/frame isolated; docs/PERF.md)
        if not self.use_pallas:
            return False
        import jax as _jax

        from .pallas_dwblock import INTERPRET, supports_fused_dwblock

        if _jax.default_backend() != "tpu" and not INTERPRET:
            return False
        return supports_fused_dwblock(
            x.shape, x.dtype, self.kernel_size, self.stride, self.dilation,
            self.expand_ratio, self.features, use_res,
        )


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
