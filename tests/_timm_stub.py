"""Minimal faithful ``timm`` stub for differential parity tests.

The reference's resnetvd.py imports ``timm.models.resnet.{BasicBlock,
Bottleneck}`` and ``timm.models.layers.{DropBlock2d, DropPath,
AvgPool2dSame}``. timm is not installed in this container, so the parity
tests (tests/test_torch_parity_stacks.py) install this stub, which
reimplements the standard timm ResNet blocks exactly (the public
rwightman/pytorch-image-models semantics: conv1 1x1 -> bn -> act ->
conv2 3x3 (stride here, "v1.5") -> bn -> act -> conv3 1x1 -> bn ->
(+shortcut) -> act).  Eval-path only: DropBlock/DropPath are identity at
rate 0 (the only rates the reference build uses).

Test-only infrastructure; nothing here ships in the framework.
"""

from __future__ import annotations

import math
import sys
import types


def install_timm_stub() -> None:
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class DropBlock2d(nn.Module):
        def __init__(self, drop_prob=0.1, block_size=7, gamma_scale=1.0,
                     **kw):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if not self.training or not self.drop_prob:
                return x
            raise NotImplementedError("parity stub: eval only")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if not self.training or not self.drop_prob:
                return x
            raise NotImplementedError("parity stub: eval only")

    class AvgPool2dSame(nn.AvgPool2d):
        """timm SAME-padding avg pool (only reached for dilated variants;
        unused in the parity builds but imported at module load)."""

        def forward(self, x):  # pragma: no cover
            ih, iw = x.shape[-2:]
            kh, kw = self.kernel_size, self.kernel_size
            sh, sw = self.stride, self.stride
            ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
            pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
            x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
            return F.avg_pool2d(x, self.kernel_size, self.stride,
                                self.padding, self.ceil_mode,
                                self.count_include_pad)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     cardinality=1, base_width=64, reduce_first=1,
                     dilation=1, first_dilation=None, act_layer=nn.ReLU,
                     norm_layer=nn.BatchNorm2d, attn_layer=None,
                     aa_layer=None, drop_block=None, drop_path=None):
            super().__init__()
            assert cardinality == 1 and base_width == 64
            first_planes = planes // reduce_first
            outplanes = planes * self.expansion
            first_dilation = first_dilation or dilation

            self.conv1 = nn.Conv2d(
                inplanes, first_planes, kernel_size=3, stride=stride,
                padding=first_dilation, dilation=first_dilation, bias=False)
            self.bn1 = norm_layer(first_planes)
            self.act1 = act_layer(inplace=True)
            self.conv2 = nn.Conv2d(
                first_planes, outplanes, kernel_size=3, padding=dilation,
                dilation=dilation, bias=False)
            self.bn2 = norm_layer(outplanes)
            self.act2 = act_layer(inplace=True)
            self.downsample = downsample
            self.drop_block = drop_block
            self.drop_path = drop_path

        def zero_init_last_bn(self):
            nn.init.zeros_(self.bn2.weight)

        def forward(self, x):
            shortcut = x
            x = self.conv1(x)
            x = self.bn1(x)
            x = self.act1(x)
            x = self.conv2(x)
            x = self.bn2(x)
            if self.drop_path is not None:
                x = self.drop_path(x)
            if self.downsample is not None:
                shortcut = self.downsample(shortcut)
            x += shortcut
            x = self.act2(x)
            return x

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     cardinality=1, base_width=64, reduce_first=1,
                     dilation=1, first_dilation=None, act_layer=nn.ReLU,
                     norm_layer=nn.BatchNorm2d, attn_layer=None,
                     aa_layer=None, drop_block=None, drop_path=None):
            super().__init__()
            width = int(math.floor(planes * (base_width / 64)) * cardinality)
            first_planes = width // reduce_first
            outplanes = planes * self.expansion
            first_dilation = first_dilation or dilation

            self.conv1 = nn.Conv2d(inplanes, first_planes, kernel_size=1,
                                   bias=False)
            self.bn1 = norm_layer(first_planes)
            self.act1 = act_layer(inplace=True)
            self.conv2 = nn.Conv2d(
                first_planes, width, kernel_size=3, stride=stride,
                padding=first_dilation, dilation=first_dilation,
                groups=cardinality, bias=False)
            self.bn2 = norm_layer(width)
            self.act2 = act_layer(inplace=True)
            self.conv3 = nn.Conv2d(width, outplanes, kernel_size=1,
                                   bias=False)
            self.bn3 = norm_layer(outplanes)
            self.act3 = act_layer(inplace=True)
            self.downsample = downsample
            self.drop_block = drop_block
            self.drop_path = drop_path

        def zero_init_last_bn(self):
            nn.init.zeros_(self.bn3.weight)

        def forward(self, x):
            shortcut = x
            x = self.conv1(x)
            x = self.bn1(x)
            x = self.act1(x)
            x = self.conv2(x)
            x = self.bn2(x)
            x = self.act2(x)
            x = self.conv3(x)
            x = self.bn3(x)
            if self.drop_path is not None:
                x = self.drop_path(x)
            if self.downsample is not None:
                shortcut = self.downsample(shortcut)
            x += shortcut
            x = self.act3(x)
            return x

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    def register_model(fn):
        return fn

    def _cfg(url="", **kw):
        return dict(url=url, **kw)

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    resnet = types.ModuleType("timm.models.resnet")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")
    vit = types.ModuleType("timm.models.vision_transformer")
    registry.register_model = register_model
    vit._cfg = _cfg
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    resnet.BasicBlock = BasicBlock
    resnet.Bottleneck = Bottleneck
    layers.DropBlock2d = DropBlock2d
    layers.DropPath = DropPath
    layers.AvgPool2dSame = AvgPool2dSame
    models.resnet = resnet
    models.layers = layers
    models.registry = registry
    models.vision_transformer = vit
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.resnet"] = resnet
    sys.modules["timm.models.layers"] = layers
    sys.modules["timm.models.registry"] = registry
    sys.modules["timm.models.vision_transformer"] = vit
