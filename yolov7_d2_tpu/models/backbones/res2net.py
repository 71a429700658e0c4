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
    out_channels: int
    stride: int = 1
    scale: int = 4
    base_width: int = 26
    vd: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.out_channels / 4 / 64 * self.base_width) * self.scale
        y = ConvBN(width, 1, 1, frozen_bn=False, dtype=self.dtype,
                   name="conv1")(x, train)
        # hierarchical split: sp_i = conv(sp_i + out_{i-1})
        splits = jnp.split(y, self.scale, axis=-1)
        w = width // self.scale
        outs = []
        prev = None
        for i, sp in enumerate(splits):
            if i == 0:
                outs.append(sp)
                continue
            if self.stride != 1 or prev is None or i == 1:
                # stride case: no hierarchical add (each split downsamples)
                inp = sp
            else:
                inp = sp + prev
            prev = ConvBN(w, 3, self.stride, frozen_bn=False,
                          dtype=self.dtype, name=f"conv2_{i}")(inp, train)
            outs.append(prev)
        if self.stride != 1:
            # the first split is pooled to match spatial dims
            outs[0] = nn.avg_pool(outs[0], (3, 3), (self.stride, self.stride),
                                  padding=[(1, 1), (1, 1)])
        y = jnp.concatenate(outs, axis=-1)
        y = ConvBN(self.out_channels, 1, 1, act=False, frozen_bn=False,
                   dtype=self.dtype, name="conv3")(y, train)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            sc = x
            if self.vd and self.stride != 1:
                sc = nn.avg_pool(sc, (2, 2), (2, 2))
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
                    scale=self.scale, base_width=self.base_width, vd=self.vd,
                    dtype=self.dtype, name=f"res{stage + 2}_{i}",
                )(x, train)
            outputs[f"res{stage + 2}"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


@BACKBONE_REGISTRY.register()
def build_res2net_backbone(cfg, dtype=jnp.float32):
    r2type = cfg.MODEL.RESNETS.R2TYPE  # e.g. res2net50_v1d
    depth = 101 if "101" in r2type else 50
    return Res2Net(
        depth=depth,
        vd="v1d" in r2type or "v1b" in r2type,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        dtype=dtype,
    )
