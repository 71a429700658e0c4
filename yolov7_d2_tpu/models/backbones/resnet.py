"""ResNet-50/101 backbone (+ the PP-YOLO "vd" variant).

Parity with the d2 ResNets the reference consumes for SparseInst/DETR
(``MODEL.RESNETS`` keys) and with resnetvd.py
(/root/reference/yolov7/modeling/backbone/resnetvd.py:517
``build_resnet_vd_backbone``): deep 3x3 stem + avg-pool downsample in the
shortcut. FrozenBN ≙ BatchNorm evaluated with running stats and no updates —
on TPU we simply never mark those stats mutable.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY
from ..layers.norm import BatchNorm

BN_EPS = 1e-5


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    frozen_bn: bool = True
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            (self.stride, self.stride), padding=[(p, p), (p, p)],
            feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = BatchNorm(
            use_running_average=(not train) or self.frozen_bn,
            momentum=0.9, epsilon=BN_EPS, dtype=jnp.float32, name="bn",
        )(x)
        if self.act:
            x = nn.relu(x)
        return x.astype(self.dtype)


class Bottleneck(nn.Module):
    out_channels: int
    stride: int = 1
    vd: bool = False               # avg-pool shortcut downsampling
    stride_in_1x1: bool = True     # d2 torchvision-style flag
    frozen_bn: bool = True
    deform: bool = False           # DCN on the 3x3 (R-50-DCN configs)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_channels // 4
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        y = ConvBN(mid, 1, s1, frozen_bn=self.frozen_bn, dtype=self.dtype,
                   name="conv1")(x, train)
        if self.deform and s3 == 1:
            from yolov7_d2_tpu.ops.deform_conv import DeformConv

            y = DeformConv(mid, dtype=self.dtype, name="conv2_dcn")(y)
            y = BatchNorm(
                use_running_average=(not train) or self.frozen_bn,
                momentum=0.9, epsilon=BN_EPS, dtype=jnp.float32,
                name="conv2_bn",
            )(y)
            y = nn.relu(y).astype(self.dtype)
        else:
            y = ConvBN(mid, 3, s3, frozen_bn=self.frozen_bn, dtype=self.dtype,
                       name="conv2")(y, train)
        y = ConvBN(self.out_channels, 1, 1, act=False,
                   frozen_bn=self.frozen_bn, dtype=self.dtype, name="conv3")(
            y, train
        )
        if x.shape[-1] != self.out_channels or self.stride != 1:
            sc = x
            if self.vd and self.stride != 1:
                # reference downsample_avg: AvgPool2d(2, 2, ceil_mode=True,
                # count_include_pad=False) (resnetvd.py:156-183)
                ph, pw = sc.shape[1] % 2, sc.shape[2] % 2
                sc = nn.avg_pool(
                    sc, (2, 2), (2, 2), padding=[(0, ph), (0, pw)],
                    count_include_pad=False,
                )
                sc = ConvBN(self.out_channels, 1, 1, act=False,
                            frozen_bn=self.frozen_bn, dtype=self.dtype,
                            name="shortcut")(sc, train)
            else:
                sc = ConvBN(self.out_channels, 1, self.stride, act=False,
                            frozen_bn=self.frozen_bn, dtype=self.dtype,
                            name="shortcut")(sc, train)
        else:
            sc = x
        return nn.relu(y + sc).astype(self.dtype)


STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class ResNet(nn.Module):
    depth: int = 50
    vd: bool = False
    out_features: Sequence[str] = ("res3", "res4", "res5")
    frozen_bn: bool = True
    stride_in_1x1: bool = True
    # per-stage deformable-conv flags (MODEL.RESNETS.DEFORM_ON_PER_STAGE)
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        if self.vd:
            # deep stem: 3x 3x3 convs (resnetvd.py)
            x = ConvBN(32, 3, 2, frozen_bn=self.frozen_bn, dtype=self.dtype,
                       name="stem1")(x, train)
            x = ConvBN(32, 3, 1, frozen_bn=self.frozen_bn, dtype=self.dtype,
                       name="stem2")(x, train)
            x = ConvBN(64, 3, 1, frozen_bn=self.frozen_bn, dtype=self.dtype,
                       name="stem3")(x, train)
        else:
            x = ConvBN(64, 7, 2, frozen_bn=self.frozen_bn, dtype=self.dtype,
                       name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

        outputs: Dict[str, jnp.ndarray] = {}
        blocks = STAGE_BLOCKS[self.depth]
        channels = (256, 512, 1024, 2048)
        for stage, (n, c) in enumerate(zip(blocks, channels)):
            stride = 1 if stage == 0 else 2
            for i in range(n):
                x = Bottleneck(
                    c, stride=stride if i == 0 else 1, vd=self.vd,
                    stride_in_1x1=self.stride_in_1x1,
                    frozen_bn=self.frozen_bn,
                    deform=self.deform_on_per_stage[stage],
                    dtype=self.dtype,
                    name=f"res{stage + 2}_{i}",
                )(x, train)
            outputs[f"res{stage + 2}"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


RESNET_CHANNELS = {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}
RESNET_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}


@BACKBONE_REGISTRY.register()
def build_resnet_backbone(cfg, dtype=jnp.float32):
    return ResNet(
        depth=cfg.MODEL.RESNETS.DEPTH,
        vd=cfg.MODEL.RESNETS.VD,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        frozen_bn=(cfg.MODEL.RESNETS.NORM == "FrozenBN"),
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        deform_on_per_stage=tuple(cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE),
        dtype=dtype,
    )


@BACKBONE_REGISTRY.register()
def build_resnet_vd_backbone(cfg, dtype=jnp.float32):
    """Reference resnetvd.py:517 registry name.

    The reference vd build uses timm-style blocks whose stride always lives
    on the 3x3 conv (timm ``Bottleneck``), so ``stride_in_1x1`` is forced
    False regardless of the d2-oriented config key."""
    return ResNet(
        depth=cfg.MODEL.RESNETS.DEPTH,
        vd=True,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        frozen_bn=(cfg.MODEL.RESNETS.NORM == "FrozenBN"),
        stride_in_1x1=False,
        dtype=dtype,
    )
