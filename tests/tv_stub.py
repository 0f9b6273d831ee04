"""Minimal offline torchvision stand-in for importing the reference's code.

torchvision is not installed in this image, but the reference's
model_feature.py does `from torchvision.models.{vgg,resnet,mobilenet} import *`
at import time and only ever *uses* `mobilenet_v2().features`
(reference: model_feature.py:4-10, 59-68). This stub provides:

- a MobileNetV2 whose module structure and state_dict key layout match
  torchvision's exactly (`features.0.{0,1}`, `features.{1..17}.conv.{j}...`,
  `features.18.{0,1}`, `classifier.1`), so the reference wrapper's stage
  slicing and our converter (models/convert.py) both see the real layout;
- importable (but unusable) names for the resnet/vgg loader dicts.

No pretrained weights are available offline: `pretrained=True` returns the
randomly initialized network (parity tests move weights explicitly in both
directions, so downloads are never needed).
"""

from __future__ import annotations

import sys
import types

import torch.nn as nn


class ConvBNReLU(nn.Sequential):
    def __init__(self, inp, oup, kernel_size=3, stride=1, groups=1):
        padding = (kernel_size - 1) // 2
        super().__init__(
            nn.Conv2d(inp, oup, kernel_size, stride, padding, groups=groups, bias=False),
            nn.BatchNorm2d(oup),
            nn.ReLU6(inplace=True),
        )


class InvertedResidual(nn.Module):
    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        self.stride = stride
        hidden_dim = int(round(inp * expand_ratio))
        self.use_res_connect = self.stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(ConvBNReLU(inp, hidden_dim, kernel_size=1))
        layers.extend(
            [
                ConvBNReLU(hidden_dim, hidden_dim, stride=stride, groups=hidden_dim),
                nn.Conv2d(hidden_dim, oup, 1, 1, 0, bias=False),
                nn.BatchNorm2d(oup),
            ]
        )
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res_connect else self.conv(x)


# torchvision's inverted_residual_setting: (expand t, channels c, repeats n, stride s)
_MOBILENET_V2_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class MobileNetV2(nn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        input_channel, last_channel = 32, 1280
        features = [ConvBNReLU(3, input_channel, stride=2)]
        for t, c, n, s in _MOBILENET_V2_CFG:
            for i in range(n):
                features.append(
                    InvertedResidual(input_channel, c, s if i == 0 else 1, expand_ratio=t)
                )
                input_channel = c
        features.append(ConvBNReLU(input_channel, last_channel, kernel_size=1))
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(nn.Dropout(0.2), nn.Linear(last_channel, num_classes))

    def forward(self, x):
        x = self.features(x).mean([2, 3])
        return self.classifier(x)


def mobilenet_v2(pretrained=False, progress=True, **kwargs):
    del pretrained, progress  # offline: random init; tests load weights explicitly
    return MobileNetV2(**kwargs)


def _unavailable(name):
    def f(*a, **k):
        raise NotImplementedError(f"{name} is not available in the offline torchvision stub")

    f.__name__ = name
    return f


def install():
    """Register the fake `torchvision` package (idempotent)."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    mob = types.ModuleType("torchvision.models.mobilenet")
    mob.MobileNetV2 = MobileNetV2
    mob.mobilenet_v2 = mobilenet_v2
    mob.__all__ = ["MobileNetV2", "mobilenet_v2"]

    res = types.ModuleType("torchvision.models.resnet")
    res.__all__ = [
        "ResNet", "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
        "resnext50_32x4d", "resnext101_32x8d", "wide_resnet50_2", "wide_resnet101_2",
    ]
    for n in res.__all__:
        setattr(res, n, _unavailable(n))

    vgg = types.ModuleType("torchvision.models.vgg")
    vgg.__all__ = [
        "VGG", "vgg11", "vgg11_bn", "vgg13", "vgg13_bn",
        "vgg16", "vgg16_bn", "vgg19", "vgg19_bn",
    ]
    for n in vgg.__all__:
        setattr(vgg, n, _unavailable(n))

    models.mobilenet, models.resnet, models.vgg = mob, res, vgg
    tv.models = models
    sys.modules.update(
        {
            "torchvision": tv,
            "torchvision.models": models,
            "torchvision.models.mobilenet": mob,
            "torchvision.models.resnet": res,
            "torchvision.models.vgg": vgg,
        }
    )
