"""Generic d2-style FPN.

The reference delegates this to detectron2 (``build_resnet_fpn_backbone``,
used by configs/coco/r50.yaml and the new_baselines LazyConfig universe —
SURVEY.md L0: the d2 substrate is part of the capability surface). Standard
semantics: lateral 1x1 on each input level, top-down nearest 2x upsample
additions, 3x3 output convs, plus extra coarser levels (maxpool P6, or
P6/P7 convs) when requested.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY
from yolov7_d2_tpu.models.necks.yolo_pafpn import upsample2x_nearest


class FPN(nn.Module):
    """inputs: shallow->deep feature list; returns {p2.., p_top} dict."""

    out_channels: int = 256
    top_block: str = "maxpool"   # "maxpool" (P6) | "none"
    first_level: int = 2         # names start at p<first_level>
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        n = len(feats)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"lateral_{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down pathway
        tops = [None] * n
        tops[-1] = laterals[-1]
        for i in range(n - 2, -1, -1):
            tops[i] = laterals[i] + upsample2x_nearest(tops[i + 1])
        outs = {}
        for i in range(n):
            p = nn.Conv(self.out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"output_{i}")(tops[i])
            outs[f"p{self.first_level + i}"] = p
        if self.top_block == "maxpool":
            last = outs[f"p{self.first_level + n - 1}"]
            outs[f"p{self.first_level + n}"] = nn.max_pool(
                last, (1, 1), strides=(2, 2)
            )
        return outs


class ResNetFPN(nn.Module):
    """ResNet (res2..res5) + FPN (p2..p6) — d2's
    ``build_resnet_fpn_backbone`` equivalent."""

    depth: int = 50
    out_channels: int = 256
    frozen_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        from yolov7_d2_tpu.models.backbones.resnet import ResNet

        feats = ResNet(
            depth=self.depth,
            out_features=("res2", "res3", "res4", "res5"),
            frozen_bn=self.frozen_bn,
            dtype=self.dtype,
            name="bottom_up",
        )(x, train)
        return FPN(
            out_channels=self.out_channels, dtype=self.dtype, name="fpn"
        )([feats[f] for f in ("res2", "res3", "res4", "res5")], train)


@BACKBONE_REGISTRY.register()
def build_resnet_fpn_backbone(cfg, dtype=jnp.float32):
    return ResNetFPN(
        depth=cfg.MODEL.RESNETS.DEPTH,
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        frozen_bn=(cfg.MODEL.RESNETS.NORM == "FrozenBN"),
        dtype=dtype,
    )
