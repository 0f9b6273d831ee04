"""Spatial-temporal feature blocks.

TPU-native equivalents of the reference's STBlock family
(reference: model.py:163-249 and ablations :392-556).

The temporal branch (`TeConvSub`) replaces the reference's per-frame Python
concat loop (reference: model.py:194-198) with vectorized shifts over the
sequence axis. The reference computes, for the flattened frame sequence
x_0..x_{S-1}:

    i == 0   : [x_1 - x_0,      x_0 - x_1]
    0<i<S-1  : [x_i - x_{i-1},  x_i - x_{i+1}]
    i == S-1 : [x_{S-1}-x_{S-2}, x_{S-2}-x_{S-1}]

With d_i = x_{i+1} - x_i this is
    chanA = [d_0, d_0, d_1, ..., d_{S-2}]          (edge-padded forward diff)
    chanB = -[d_0, d_1, ..., d_{S-2}, d_{S-2}]     (edge-padded backward diff)

computed here as two `jnp.diff` + `concatenate` ops over the whole batch —
one fused XLA kernel instead of S small ones.

NOTE (reference quirk, kept intentionally): with `diff_group=None` the
difference runs over the whole flattened frame axis, crossing `time_dims`
clip-group boundaries when batch_size > 1 (see SURVEY.md M5). Set
`diff_group=time_dims` for the clip-correct variant, or to the per-video
sequence length when several videos are flattened into one batch.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layers import ConvBNAct, ConvBNAct3D, DWBlock

_FAN_OUT = dict(kernel_init_kwargs={"mode": "fan_out"})


def temporal_differences(x: jnp.ndarray, group: Optional[int] = None) -> jnp.ndarray:
    """Build the 2-channel forward/backward frame differences.

    x: (S, H, W, C) frame-major sequence. Returns (S, H, W, 2C) with
    channels [x_i - x_{i-1}, x_i - x_{i+1}] (edges mirrored as above).
    If `group` is given, differences are computed independently per
    consecutive group of `group` frames.
    """
    if group is not None and x.shape[0] != group:
        s = x.shape[0]
        assert s % group == 0, (s, group)
        g = x.reshape(s // group, group, *x.shape[1:])
        out = jax.vmap(lambda seq: temporal_differences(seq, None))(g)
        return out.reshape(s, *out.shape[2:])

    d = x[1:] - x[:-1]  # (S-1, H, W, C)
    chan_a = jnp.concatenate([d[:1], d], axis=0)
    chan_b = -jnp.concatenate([d, d[-1:]], axis=0)
    return jnp.concatenate([chan_a, chan_b], axis=-1)


class SpConv(nn.Module):
    """Spatial branch: a single inverted-residual block (reference: model.py:163-171)."""

    planes: int = 256
    res_connect: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        return DWBlock(self.planes, 3, res_connect=self.res_connect, name="spconv", **_FAN_OUT)(
            x, train
        )


class TeConvSub(nn.Module):
    """Temporal branch: reduce 1x1 -> frame differences -> dwBlock -> expand 1x1
    (reference: model.py:173-208).

    `diff_group` controls the span of the frame differences along the
    flattened batch: None reproduces the reference (differences over the whole
    flattened batch, crossing clip groups — SURVEY.md M5 quirk); set it to the
    per-video sequence length when multiple videos are flattened together
    (differences must never cross videos), or to `time_dims` for the
    clip-correct variant."""

    planes: int = 256
    time_dims: int = 5
    reduction: int = 8
    res_connect: bool = False
    diff_group: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        width = self.planes // self.reduction
        x1 = ConvBNAct(width, 1, name="reduce_conv", **_FAN_OUT)(x, train)

        x_sub = temporal_differences(x1, self.diff_group)
        x_sub = DWBlock(width, 3, res_connect=False, name="sub_conv", **_FAN_OUT)(x_sub, train)
        out = ConvBNAct(self.planes, 1, name="last_conv", **_FAN_OUT)(x_sub, train)

        if self.res_connect and inplanes == self.planes:
            out = x + out
        return out


class STBlock(nn.Module):
    """Parallel spatial+temporal with sum/cat fusion (reference: model.py:210-249)."""

    planes: int = 256
    time_dims: int = 5
    reduction: int = 8
    fu_type: str = "sum"
    res_connect: bool = True
    diff_group: "Optional[int]" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.fu_type in ("sum", "cat")
        use_res = self.res_connect and x.shape[-1] == self.planes

        x_sp = SpConv(self.planes, name="stconv_sp")(x, train)
        x_te = TeConvSub(
            self.planes,
            self.time_dims,
            self.reduction,
            diff_group=self.diff_group,
            name="stconv_te",
        )(x, train)

        out = x_sp + x_te if self.fu_type == "sum" else jnp.concatenate([x_sp, x_te], axis=-1)
        out = ConvBNAct(self.planes, 1, name="stconv_last", **_FAN_OUT)(out, train)
        return x + out if use_res else out


class STBlockS2T(nn.Module):
    """Sequential spatial->temporal ablation (reference: model.py:392-419)."""

    planes: int = 256
    time_dims: int = 5
    reduction: int = 8
    res_connect: bool = True
    diff_group: "Optional[int]" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_res = self.res_connect and x.shape[-1] == self.planes
        x_sp = SpConv(self.planes, name="stconv_sp")(x, train)
        x_te = TeConvSub(
            self.planes, self.time_dims, self.reduction,
            diff_group=self.diff_group, name="stconv_te",
        )(x_sp, train)
        out = ConvBNAct(self.planes, 1, name="stconv_last", **_FAN_OUT)(x_te, train)
        return x + out if use_res else out


class STBlockT2S(nn.Module):
    """Sequential temporal->spatial ablation (reference: model.py:421-448)."""

    planes: int = 256
    time_dims: int = 5
    reduction: int = 8
    res_connect: bool = True
    diff_group: "Optional[int]" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_res = self.res_connect and x.shape[-1] == self.planes
        x_te = TeConvSub(
            self.planes, self.time_dims, self.reduction,
            diff_group=self.diff_group, name="stconv_te",
        )(x, train)
        x_sp = SpConv(self.planes, name="stconv_sp")(x_te, train)
        out = ConvBNAct(self.planes, 1, name="stconv_last", **_FAN_OUT)(x_sp, train)
        return x + out if use_res else out


class STBlockSS2T(nn.Module):
    """Spatial -> temporal with inner skip ablation (reference: model.py:450-478)."""

    planes: int = 256
    time_dims: int = 5
    reduction: int = 8
    res_connect: bool = True
    diff_group: "Optional[int]" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_res = self.res_connect and x.shape[-1] == self.planes
        x_sp = SpConv(self.planes, name="stconv_sp")(x, train)
        x_te = TeConvSub(
            self.planes, self.time_dims, self.reduction,
            diff_group=self.diff_group, name="stconv_te",
        )(x_sp, train)
        out = ConvBNAct(self.planes, 1, name="stconv_last", **_FAN_OUT)(x_sp + x_te, train)
        return x + out if use_res else out


class STC3D(nn.Module):
    """Full 3D-conv temporal block ablation (reference: model.py:480-507).

    Input (S, H, W, C) with S = groups * time_dims; reshaped to
    (groups, time_dims, H, W, C) == NDHWC for the 3D conv.
    """

    planes: int = 256
    time_dims: int = 5
    res_connect: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        s, h, w, c = x.shape
        use_res = self.res_connect and c == self.planes
        g = s // self.time_dims
        x_te = x.reshape(g, self.time_dims, h, w, c)
        x_te = ConvBNAct3D(self.planes, 3, name="stconv_te", **_FAN_OUT)(x_te, train)
        out = x_te.reshape(s, h, w, self.planes)
        return x + out if use_res else out


class STC23D(nn.Module):
    """Parallel 2D + 3D conv ablation (reference: model.py:509-556)."""

    planes: int = 256
    time_dims: int = 5
    fu_type: str = "sum"
    res_connect: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.fu_type in ("sum", "cat")
        s, h, w, c = x.shape
        use_res = self.res_connect and c == self.planes

        x_sp = ConvBNAct(self.planes, 3, name="stconv_sp", **_FAN_OUT)(x, train)

        g = s // self.time_dims
        x_te = x.reshape(g, self.time_dims, h, w, c)
        x_te = ConvBNAct3D(self.planes, 3, name="stconv_te", **_FAN_OUT)(x_te, train)
        x_te = x_te.reshape(s, h, w, self.planes)

        out = x_sp + x_te if self.fu_type == "sum" else jnp.concatenate([x_sp, x_te], axis=-1)
        out = ConvBNAct(self.planes, 1, name="stconv_last", **_FAN_OUT)(out, train)
        return x + out if use_res else out
