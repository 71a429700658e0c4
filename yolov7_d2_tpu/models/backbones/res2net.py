"""Res2Net-50/101 backbone (multi-scale residual, v1b/v1d stems).

Parity with /root/reference/yolov7/modeling/backbone/res2nets/
(``build_res2net_backbone``, wrapper.py:7). The Res2Net bottleneck splits
the 3x3 stage into ``scale`` hierarchical sub-convolutions.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY
from yolov7_d2_tpu.models.backbones.resnet import STAGE_BLOCKS, ConvBN


class Res2NetBottleneck(nn.Module):
    """Bottle2neck (reference res2net_v1b.py:18): 1x1 expand to
    width*scale, hierarchical 3x3s over the first scale-1 splits
    (sp_i = conv(spx_i + sp_{i-1})), last split passes through (pooled in
    'stage' blocks — including the STRIDE-1 stage block opening layer1,
    where the 3x3 stride-1 avg pool still applies and the hierarchical
    adds do not), 1x1 fuse."""

    out_channels: int
    stride: int = 1
    scale: int = 4
    base_width: int = 26
    cardinality: int = 1  # >1 = Res2NeXt grouped 3x3s (res2next.py:18)
    vd: bool = False
    stage: bool = False  # first block of a layer (reference stype='stage')
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        planes = self.out_channels // 4
        w = int(planes * self.base_width / 64.0) * self.cardinality
        width = w * self.scale
        y = ConvBN(width, 1, 1, frozen_bn=False, dtype=self.dtype,
                   name="conv1")(x, train)
        splits = jnp.split(y, self.scale, axis=-1)
        nums = 1 if self.scale == 1 else self.scale - 1
        outs = []
        sp = None
        for i in range(nums):
            inp = splits[i] if (i == 0 or self.stage) else splits[i] + sp
            sp = ConvBN(w, 3, self.stride, frozen_bn=False,
                        groups=self.cardinality, dtype=self.dtype,
                        name=f"conv2_{i}")(inp, train)
            outs.append(sp)
        if self.scale > 1:
            last = splits[-1]
            if self.stage:
                # reference pools the passthrough in EVERY stage block,
                # stride 1 included (AvgPool2d(3, stride, padding=1))
                last = nn.avg_pool(
                    last, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)],
                )
            outs.append(last)
        y = jnp.concatenate(outs, axis=-1)
        y = ConvBN(self.out_channels, 1, 1, act=False, frozen_bn=False,
                   dtype=self.dtype, name="conv3")(y, train)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            sc = x
            if self.vd and self.stride != 1:
                # reference downsample: AvgPool(k=stride, ceil_mode=True,
                # count_include_pad=False) + 1x1 conv + bn
                ph, pw = sc.shape[1] % 2, sc.shape[2] % 2
                sc = nn.avg_pool(
                    sc, (2, 2), (2, 2), padding=[(0, ph), (0, pw)],
                    count_include_pad=False,
                )
                sc = ConvBN(self.out_channels, 1, 1, act=False,
                            frozen_bn=False, dtype=self.dtype,
                            name="shortcut")(sc, train)
            else:
                sc = ConvBN(self.out_channels, 1, self.stride, act=False,
                            frozen_bn=False, dtype=self.dtype,
                            name="shortcut")(sc, train)
        else:
            sc = x
        return nn.relu(y + sc).astype(self.dtype)


class Res2Net(nn.Module):
    depth: int = 50
    scale: int = 4
    base_width: int = 26
    cardinality: int = 1
    vd: bool = True  # v1d stem by default (reference default res2net50_v1d)
    out_features: Sequence[str] = ("res3", "res4", "res5")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        if self.vd:
            x = ConvBN(32, 3, 2, frozen_bn=False, dtype=self.dtype,
                       name="stem1")(x, train)
            x = ConvBN(32, 3, 1, frozen_bn=False, dtype=self.dtype,
                       name="stem2")(x, train)
            x = ConvBN(64, 3, 1, frozen_bn=False, dtype=self.dtype,
                       name="stem3")(x, train)
        else:
            x = ConvBN(64, 7, 2, frozen_bn=False, dtype=self.dtype,
                       name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        outputs: Dict[str, jnp.ndarray] = {}
        channels = (256, 512, 1024, 2048)
        for stage, (n, c) in enumerate(zip(STAGE_BLOCKS[self.depth], channels)):
            for i in range(n):
                x = Res2NetBottleneck(
                    c, stride=(2 if (i == 0 and stage > 0) else 1),
                    scale=self.scale, base_width=self.base_width,
                    cardinality=self.cardinality, vd=self.vd,
                    stage=(i == 0), dtype=self.dtype,
                    name=f"res{stage + 2}_{i}",
                )(x, train)
            outputs[f"res{stage + 2}"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


@BACKBONE_REGISTRY.register()
def build_res2net_backbone(cfg, dtype=jnp.float32):
    r2type = cfg.MODEL.RESNETS.R2TYPE  # e.g. res2net50_v1b / res2next50
    depth = 101 if "101" in r2type else 50
    if "next" in r2type:
        # res2next50 (reference res2next.py:209): baseWidth 4,
        # cardinality 8, plain 7x7 stem + conv downsample
        return Res2Net(
            depth=depth, base_width=4, cardinality=8, vd=False,
            out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
            dtype=dtype,
        )
    return Res2Net(
        depth=depth,
        vd="v1d" in r2type or "v1b" in r2type,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        dtype=dtype,
    )
