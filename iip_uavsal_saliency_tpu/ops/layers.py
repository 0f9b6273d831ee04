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
- BatchNorm matches torch semantics EXACTLY (TorchBatchNorm): eps=1e-5,
  running-stat update factor 0.1 (flax momentum 0.9), biased variance for
  normalization, UNBIASED variance in the running-stat EMA.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from .initializers import make_conv_init

BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # flax convention: new = m*old + (1-m)*batch  (== torch 0.1)


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch.nn.BatchNorm2d training semantics.

    Differences from flax's nn.BatchNorm (which this otherwise mirrors —
    same param/batch_stats variable layout: scale/bias + mean/var):
    - the running-variance EMA accumulates the UNBIASED (ddof=1) batch
      variance, as torch does, while normalization itself uses the biased
      variance. flax feeds the biased variance to both, a small systematic
      drift that the train-step parity test vs the reference's own torch
      code (tests/test_reference_parity.py) would fail on.

    Stats are reduced over all axes but the last (channel) axis, computed
    single-pass (E[x^2] - E[x]^2) so XLA fuses them into one pass over the
    input. Channel reductions are f32-accumulated by XLA on TPU even for
    bf16 inputs.
    """

    use_running_average: bool = False
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (feat,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (feat,)
        )
        out_dtype = jnp.promote_types(x.dtype, scale.dtype)
        # stats in at-least-f32 (as flax promotes); f64 under enable_x64
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        if self.use_running_average:
            # Eval: precompute the per-channel affine s/b in f32 (C-vector
            # math, free) and apply in the COMPUTE dtype — torch's own eval
            # kernel does exactly this (alpha/beta in batch_norm_cpu), and
            # it avoids upcasting the whole activation tensor to f32 in the
            # bf16 serving path, which measured 8.9% of step time at
            # 360x640 S=80 (docs/PERF.md "eval-BN affine").
            s = scale.astype(stat_dtype) * lax.rsqrt(
                ra_var.value.astype(stat_dtype) + self.epsilon
            )
            b = bias.astype(stat_dtype) - ra_mean.value.astype(stat_dtype) * s
            y = x * s.astype(x.dtype) + b.astype(x.dtype)
            return y.astype(out_dtype)
        else:
            red = tuple(range(x.ndim - 1))
            xf = x.astype(stat_dtype)
            mean = jnp.mean(xf, red)
            # two-pass variance, NOT E[x^2]-E[x]^2: after ReLU6 the
            # activations have mean >> std, and the fast form's cancellation
            # error compounds across ~30 BN layers to ~1e-4 in the loss —
            # measured against the reference's torch (two-pass) BN
            var = jnp.mean(jnp.square(xf - mean), red)
            if not self.is_initializing():
                n = 1
                for a in red:
                    n *= x.shape[a]
                m = self.momentum
                bessel = n / max(n - 1, 1)  # torch: unbiased var in the EMA
                ra_mean.value = (
                    m * ra_mean.value.astype(stat_dtype) + (1 - m) * mean
                ).astype(ra_mean.value.dtype)
                ra_var.value = (
                    m * ra_var.value.astype(stat_dtype) + (1 - m) * var * bessel
                ).astype(ra_var.value.dtype)
        y = (x.astype(stat_dtype) - mean) * lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(stat_dtype) + bias.astype(stat_dtype)
        return y.astype(out_dtype)


def dw_dilated_3x3_pad_add(x, k, d):
    """Exact pad-add form of a stride-1 depthwise 3x3 conv at dilation d
    with symmetric SAME-style padding (d each side, output size == input).

    At large dilation on a small grid (ASPP rate 18 over the 23x40 or
    18x32 c5 map) most taps of the dilated conv land in zero padding — the
    conv machinery pays for a (H+2d, W+2d) window sweep to touch a few
    thin slabs. This computes the identical result as 9 elementwise
    multiply-pad terms XLA fuses into one add tree: center tap scales the
    full tensor; each neighbor tap contributes only the (H-d)x(W-d)-or-
    smaller region where the shifted input overlaps (nothing at all when
    d >= H or W — e.g. the row taps of rate 18 on an 18-row grid).

    Measured chip-bound at the real ASPP shapes (tools/probe_dilated_dw.py,
    TPU v5e, bf16): 73.7 vs the conv's 136.4 us/frame at 23x40x1920 d=18;
    5.0 vs 11.2 at 18x32x1920 d=18. Loses at d=6/12 on both grids, hence
    the ConvBNAct gate `4*d >= 3*min(H, W)`.

    x: (N, H, W, C); k: (3, 3, 1, C) flax depthwise HWIO kernel.
    """
    n, h, w, c = x.shape
    kk = k.reshape(3, 3, c)
    out = x * kk[1, 1]
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            sh, sw = di * d, dj * d
            # out[i, j] += w_tap * x[i + sh, j + sw] where in bounds
            oi0, ii0 = max(0, -sh), max(0, sh)
            oj0, ij0 = max(0, -sw), max(0, sw)
            hh, ww = h - abs(sh), w - abs(sw)
            if hh <= 0 or ww <= 0:
                continue  # tap never overlaps the input: contributes 0,
                # exactly as in the conv (and gets zero gradient in both)
            patch = x[:, ii0:ii0 + hh, ij0:ij0 + ww, :] * kk[di + 1, dj + 1]
            out = out + jnp.pad(
                patch,
                ((0, 0), (oi0, h - oi0 - hh), (oj0, w - oj0 - ww), (0, 0)))
    return out


class ConvBNAct(nn.Module):
    """Conv2d(bias=False) + BatchNorm + ReLU6, 'same'-style symmetric padding.

    padding = dilation * (kernel_size - 1) // 2, as in the reference.

    Depthwise 3x3 stride-1 convs whose dilation is large relative to the
    grid (`4*dilation >= 3*min(H, W)` — the ASPP rate-18 branch) run as
    the exact `dw_dilated_3x3_pad_add` form instead of the conv op; same
    math, same variable tree, measured ~2x faster at those shapes.
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
        conv_mod = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=make_conv_init(self.kernel_init_name, **kw),
            name="conv",
        )
        if (
            self.kernel_size == 3
            and self.stride == 1
            and self.groups == self.features == x.shape[-1]
            and x.ndim == 4
            and 4 * self.dilation >= 3 * min(x.shape[-3], x.shape[-2])
        ):
            # bind the params without running the conv (dummy 1x1 spatial
            # call, same pattern as S2DStem); variable tree is unchanged
            _ = conv_mod(jnp.zeros((1, 1, 1, x.shape[-1]), x.dtype))
            k = conv_mod.variables["params"]["kernel"]  # (3, 3, 1, C)
            # match nn.Conv's dtype promotion (f32 params + bf16 input
            # compute in f32) so both paths are numerically identical
            ct = jnp.promote_types(x.dtype, k.dtype)
            x = dw_dilated_3x3_pad_add(
                x.astype(ct), k.astype(ct), self.dilation)
        else:
            x = conv_mod(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


def space_to_depth(x, block: int = 2):
    """(N, H, W, C) -> (N, H/b, W/b, b*b*C); channel index (a*b + bcol)*C + c
    where (a, bcol) is the pixel's phase inside its b x b block. Pure
    reshape/transpose — XLA lowers it to a relayout, no FLOPs."""
    n, h, w, c = x.shape
    if h % block or w % block:
        raise ValueError(f"space_to_depth needs H,W divisible by {block}, got {h}x{w}")
    x = x.reshape(n, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // block, w // block,
                                                 block * block * c)


class S2DStem(nn.Module):
    """EXACT reparametrization of the 3x3 stride-2 stem conv as a 2x2
    stride-1 conv over the 2x2 space-to-depth input — the standard
    MLPerf-TPU stem trick.

    Why: the plain stem convolves (H, W, 3) with 3 input channels — a tiny
    fraction of the MXU's 128-lane input tile, so the hardware runs nearly
    empty for the most bandwidth-heavy layer of the network. Space-to-depth
    moves the stride into the layout: the conv sees (H/2, W/2, 12) — same
    FLOPs, 4x the input-channel occupancy, quarter the positions.

    Exactness (not an approximation): the stride-2 3x3 conv's output
    y[i,j] reads input rows 2i-1..2i+1. Pad the 3x3 kernel with one zero
    row/col BEFORE (so taps cover rows 2i-2..2i+1 = s2d blocks i-1 and i),
    regroup the padded 4x4 into 2x2 blocks of 2x2 phases, and the result
    is a 2x2 stride-1 conv over the s2d image with left/top padding of 1.
    Weight layout is IDENTICAL to ConvBNAct(features, 3, stride=2) —
    kernel (3, 3, C, F) + bn — so checkpoints drop in unchanged and the
    regrouping happens at apply time (a compile-time constant fold under
    baked-constant serving). Requires even H, W.

    Reference stem being reparametrized: model_feature.py:63 (torchvision
    MobileNetV2 features[0]).
    """

    features: int
    act: Optional[Callable] = relu6
    kernel_init_name: str = "kaiming_normal"
    kernel_init_kwargs: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        kw = dict(self.kernel_init_kwargs or {})
        conv_mod = nn.Conv(
            features=self.features,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            kernel_init=make_conv_init(self.kernel_init_name, **kw),
            name="conv",
        )
        # bind the params without running the 3x3 conv (same pattern as
        # DWBlock's fused path); variable tree == the plain stem's
        _ = conv_mod(jnp.zeros((1, 2, 2, c), x.dtype))
        k = conv_mod.variables["params"]["kernel"]  # (3, 3, C, F)
        kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))  # zero row/col BEFORE
        # (4,4,C,F) -> [ki, a, kj, b, c, f] -> 2x2 kernel over 4C channels,
        # channel order (a*2+b)*C + c matching space_to_depth
        k2 = kp.reshape(2, 2, 2, 2, c, self.features)
        k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * c, self.features)
        y = lax.conv_general_dilated(
            space_to_depth(x, 2),
            k2.astype(x.dtype),
            window_strides=(1, 1),
            padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = TorchBatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="bn",
        )(y)
        if self.act is not None:
            y = self.act(y)
        return y


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
        pbn_mod = TorchBatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="project_bn",
        )

        if self._fused_path(x, train, expand_mod is not None, use_res):
            from .pallas_dwblock import fold_conv_bn, fused_dwblock

            # bind the submodule params without running their convs on the
            # real input (dummy 1x1 spatial calls; identical variable tree)
            _ = expand_mod(x[:1, :1, :1, :], False)
            dummy = jnp.zeros((1, 1, 1, hidden), x.dtype)
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
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="bn",
        )(x)
        return relu6(x)
