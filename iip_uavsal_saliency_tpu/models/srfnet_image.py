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


def is_image_stage_variables(variables) -> bool:
    """True when `variables` is an `SRFNetImage` tree (the SALICON stage's
    checkpoint layout: exactly {sfnet, conv_out} at the top of params).

    The exact-set test matters: several video ablation variants also name
    their neck `sfnet` at the top level (models/uavsal.py UAVSalSpConv etc.),
    but they always carry additional heads (fust_layer/conv_out_st), so only
    the image stage matches. The Trainer and `cli train` use this to
    auto-route a `--model-path` at an image checkpoint through
    `transfer_sfnet` instead of loading it as video-model variables
    (reference 3-stage recipe: README.md:60)."""
    from collections.abc import Mapping

    params = variables.get("params", {})
    # Mapping, not dict: a flax FrozenDict tree (e.g. variables frozen by a
    # caller) must classify identically to its plain-dict round trip
    return isinstance(params, Mapping) and set(params.keys()) == {"sfnet", "conv_out"}


def transfer_sfnet(image_variables, video_variables):
    """Copy the pretrained SRF-Net subtree from an `SRFNetImage` variables
    dict into a `UAVSal` (or zoo-variant) variables dict (params +
    batch_stats), returning the updated video variables (inputs are not
    mutated). The destination is wherever the video tree keeps its neck:
    `trunk/sfnet` for the full model, top-level `sfnet` for the variants
    that inline it (reference classes at model.py:582-957)."""
    import flax

    video_variables = flax.core.unfreeze(
        jax.tree_util.tree_map(lambda a: a, video_variables)
    )
    for col in ("params", "batch_stats"):
        src = image_variables[col]["sfnet"]
        dst = video_variables[col]
        if "trunk" in dst and "sfnet" in dst["trunk"]:
            dst = dst["trunk"]
        elif "sfnet" not in dst:
            raise ValueError(
                "video variables have no sfnet subtree (neither trunk/sfnet "
                "nor top-level sfnet) — cannot transplant the image-stage "
                f"SRF-Net; top-level keys: {sorted(dst.keys())}"
            )
        dst["sfnet"] = jax.tree_util.tree_map(lambda a: a, src)
    return video_variables
