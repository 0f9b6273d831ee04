"""SRF-Net: saliency-related feature neck (ASPP over the pyramid top).

TPU-native equivalent of `uavsal_srfnet_aspp` (reference: model.py:110-158):
- 1x1 lateral convs on c3 (-> planes[1]) and c4 (-> planes[2]);
- ASPP on c5: 1x1 branch + three depthwise dilated branches (rates 6/12/18),
  concat -> 1x1 fuse (-> planes[3]);
- bilinear (align_corners) upsample of c4/c5 to c3 resolution (stride 8);
- concat -> 3x3 conv -> `last_channel` features.

The upsamples are the matmul-form resize from ops.resize, so they ride the
MXU and fuse with the following concat+conv.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.layers import ConvBNAct, DWBlock
from ..ops.resize import resize_bilinear_align_corners
from .backbone import build_backbone

ASPP_RATES = (6, 12, 18)


class SRFNet(nn.Module):
    cnn_type: str = "mobilenet_v2"
    planes: Sequence[int] = (64, 64, 128, 256)
    last_channel: int = 256
    s2d_stem: bool = False  # exact space-to-depth stem (ops.layers.S2DStem)

    @nn.compact
    def __call__(self, x, train: bool = False):
        planes = list(self.planes)
        if self.last_channel == 128:
            planes = [32, 32, 64, 128]

        _, _, c3, c4, c5 = build_backbone(self.cnn_type, self.s2d_stem)(x, train)

        fan_out = dict(kernel_init_kwargs={"mode": "fan_out"})

        a1 = ConvBNAct(planes[3], 1, name="lv5_aspp1", **fan_out)(c5, train)
        a2 = DWBlock(planes[3], 3, dilation=ASPP_RATES[0], name="lv5_aspp2", **fan_out)(c5, train)
        a3 = DWBlock(planes[3], 3, dilation=ASPP_RATES[1], name="lv5_aspp3", **fan_out)(c5, train)
        a4 = DWBlock(planes[3], 3, dilation=ASPP_RATES[2], name="lv5_aspp4", **fan_out)(c5, train)
        x_c5 = jnp.concatenate([a1, a2, a3, a4], axis=-1)
        x_c5 = ConvBNAct(planes[3], 1, name="conv_lv5", **fan_out)(x_c5, train)

        x_c4 = ConvBNAct(planes[2], 1, name="conv_lv4", **fan_out)(c4, train)
        x_c3 = ConvBNAct(planes[1], 1, name="conv_lv3", **fan_out)(c3, train)

        h, w = c3.shape[-3], c3.shape[-2]
        x_c5 = resize_bilinear_align_corners(x_c5, h, w)
        x_c4 = resize_bilinear_align_corners(x_c4, h, w)

        out = jnp.concatenate([x_c5, x_c4, x_c3], axis=-1)
        out = ConvBNAct(self.last_channel, 3, name="conv_last", **fan_out)(out, train)
        return out
