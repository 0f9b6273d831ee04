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


class BasicBlock(nn.Module):
    """torchvision resnet BasicBlock (state_dict keys conv1/bn1/conv2/bn2
    [+ downsample.0/.1])."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    """torchvision resnet Bottleneck (v1.5: stride on the 3x3 conv2)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    """torchvision-layout ResNet (conv1/bn1/maxpool/layer1..4/avgpool/fc)."""

    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        layers += [block(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


def resnet18(pretrained=False, progress=True, **kwargs):
    del pretrained, progress
    return ResNet(BasicBlock, [2, 2, 2, 2], **kwargs)


def resnet34(pretrained=False, progress=True, **kwargs):
    del pretrained, progress
    return ResNet(BasicBlock, [3, 4, 6, 3], **kwargs)


def resnet50(pretrained=False, progress=True, **kwargs):
    del pretrained, progress
    return ResNet(Bottleneck, [3, 4, 6, 3], **kwargs)


def resnet101(pretrained=False, progress=True, **kwargs):
    del pretrained, progress
    return ResNet(Bottleneck, [3, 4, 23, 3], **kwargs)


def resnet152(pretrained=False, progress=True, **kwargs):
    del pretrained, progress
    return ResNet(Bottleneck, [3, 8, 36, 3], **kwargs)


# torchvision vgg16 cfg "D"
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


class VGG(nn.Module):
    """torchvision-layout VGG (features Sequential + classifier)."""

    def __init__(self, features, num_classes=1000):
        super().__init__()
        self.features = features
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, num_classes),
        )

    def forward(self, x):
        x = self.avgpool(self.features(x))
        return self.classifier(torch.flatten(x, 1))


def _vgg_layers(cfg):
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(inplace=True)]
            in_ch = v
    return nn.Sequential(*layers)


def vgg16(pretrained=False, progress=True, **kwargs):
    del pretrained, progress
    return VGG(_vgg_layers(_VGG16_CFG), **kwargs)


class Compose:
    """Minimal torchvision.transforms for importing the reference's
    dataset.py (module-level Compose([...]) objects; reference:
    dataset.py:14-24). Functional enough for tests that feed images."""

    def __init__(self, ts):
        self.transforms = ts

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class ToTensor:
    def __call__(self, x):
        import numpy as np
        import torch as _torch

        a = np.asarray(x)
        if a.ndim == 2:
            a = a[:, :, None]
        t = _torch.from_numpy(np.ascontiguousarray(a.transpose(2, 0, 1)))
        return t.float().div(255) if a.dtype == np.uint8 else t.float()


class Normalize:
    def __init__(self, mean, std):
        self.mean, self.std = mean, std

    def __call__(self, t):
        import torch as _torch

        mean = _torch.tensor(self.mean).view(-1, 1, 1)
        std = _torch.tensor(self.std).view(-1, 1, 1)
        return (t - mean) / std


class Resize:
    def __init__(self, size):
        self.size = size  # (h, w)

    def __call__(self, x):
        import cv2
        import numpy as np

        return cv2.resize(
            np.asarray(x), (self.size[1], self.size[0]),
            interpolation=cv2.INTER_LINEAR,
        )


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
    res.ResNet = ResNet
    for n, f in (("resnet18", resnet18), ("resnet34", resnet34),
                 ("resnet50", resnet50), ("resnet101", resnet101),
                 ("resnet152", resnet152)):
        setattr(res, n, f)

    vgg = types.ModuleType("torchvision.models.vgg")
    vgg.__all__ = [
        "VGG", "vgg11", "vgg11_bn", "vgg13", "vgg13_bn",
        "vgg16", "vgg16_bn", "vgg19", "vgg19_bn",
    ]
    for n in vgg.__all__:
        setattr(vgg, n, _unavailable(n))
    vgg.VGG = VGG
    vgg.vgg16 = vgg16

    tr = types.ModuleType("torchvision.transforms")
    tr.Compose, tr.ToTensor, tr.Normalize, tr.Resize = (
        Compose, ToTensor, Normalize, Resize,
    )

    models.mobilenet, models.resnet, models.vgg = mob, res, vgg
    tv.models = models
    tv.transforms = tr
    sys.modules.update(
        {
            "torchvision": tv,
            "torchvision.models": models,
            "torchvision.models.mobilenet": mob,
            "torchvision.models.resnet": res,
            "torchvision.models.vgg": vgg,
            "torchvision.transforms": tr,
        }
    )
