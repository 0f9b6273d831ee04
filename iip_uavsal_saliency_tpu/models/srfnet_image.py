"""Static-image saliency model for the SALICON SRF-Net pretraining stage.

The reference pipeline is: ImageNet MobileNetV2 -> fine-tune SRF-Net on
SALICON -> train the full video model on UAV2/AVS1K (reference: README.md:60;
the SALICON dataset/loader at dataset.py:27-115, image metrics drivers at
utils_score.py:570-682). The reference ships no in-tree SALICON training
script; this module provides the trainable image-stage model and the
parameter transplant into the video model.

`SRFNetImage` = SRF-Net neck + 1-channel dwBlock head + sigmoid, i.e. the
UAVSal graph with the temporal stages (STBlocks, MP-Net, TWA) removed. The
`sfnet` submodule tree is name-compatible with `UAVSal`'s `trunk/sfnet`, so
`transfer_sfnet` moves the pretrained neck straight into the video model.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax

from ..ops.layers import DWBlock
from .srfnet import SRFNet

_FAN_OUT = dict(kernel_init_kwargs={"mode": "fan_out"})


class SRFNetImage(nn.Module):
    """Image saliency: sfnet -> 1-ch head -> sigmoid. Input (B, H, W, 3),
    output (B, H//8, W//8, 1)."""

    cnn_type: str = "mobilenet_v2"
    planes: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SRFNet(self.cnn_type, last_channel=self.planes, name="sfnet")(x, train)
        out = DWBlock(1, 3, name="conv_out", **_FAN_OUT)(x, train)
        return jax.nn.sigmoid(out)


def transfer_sfnet(image_variables, video_variables):
    """Copy the pretrained SRF-Net subtree from an `SRFNetImage` variables
    dict into a `UAVSal` variables dict (params + batch_stats), returning the
    updated video variables (inputs are not mutated)."""
    import flax

    video_variables = flax.core.unfreeze(
        jax.tree_util.tree_map(lambda a: a, video_variables)
    )
    for col in ("params", "batch_stats"):
        src = image_variables[col]["sfnet"]
        video_variables[col]["trunk"]["sfnet"] = jax.tree_util.tree_map(
            lambda a: a, src
        )
    return video_variables
