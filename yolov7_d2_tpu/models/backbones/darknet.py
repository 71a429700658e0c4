"""Darknet-53 backbone (+ CSP variant) — the classic YOLOv3/YOLOv7 trunk.

Parity with /root/reference/yolov7/modeling/backbone/darknet.py
(``build_darknet_backbone:239``, stage plan 1-2-8-8-4 residual blocks,
outputs dark3/dark4/dark5) and the CSP wrapping used when
``MODEL.DARKNET.WITH_CSP`` (cspdarknet.py flavour). NHWC, bf16-ready.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY
from yolov7_d2_tpu.models.layers.blocks import BaseConv, CSPLayer


class DarkResidual(nn.Module):
    """1x1 squeeze -> 3x3 expand + residual (darknet block)."""

    channels: int
    act: str = "lrelu"
    bn_eps: float = 1e-5  # reference darknet.py uses torch-default BN eps
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = BaseConv(self.channels // 2, 1, 1, act=self.act,
                     bn_eps=self.bn_eps, dtype=self.dtype,
                     name="conv1")(x, train)
        y = BaseConv(self.channels, 3, 1, act=self.act,
                     bn_eps=self.bn_eps, dtype=self.dtype,
                     name="conv2")(y, train)
        return x + y


class Darknet53(nn.Module):
    stem_out_channels: int = 32
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    with_csp: bool = False
    act: str = "lrelu"
    dtype: Any = jnp.float32

    # residual blocks per stage (Darknet-53 plan)
    stage_blocks: Sequence[int] = (1, 2, 8, 8, 4)

    # reference darknet.py builds plain torch BatchNorm2d (eps 1e-5); the
    # CSP variant (reference cspdarknet.py:59) uses eps 1e-4 — set by the
    # builders so one model never mixes eps conventions
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        c = self.stem_out_channels
        x = BaseConv(c, 3, 1, act=self.act, bn_eps=self.bn_eps,
                     dtype=self.dtype, name="stem")(x, train)
        outputs: Dict[str, jnp.ndarray] = {}
        for i, nblocks in enumerate(self.stage_blocks):
            c *= 2
            x = BaseConv(c, 3, 2, act=self.act, bn_eps=self.bn_eps,
                         dtype=self.dtype,
                         name=f"stage{i + 1}_down")(x, train)
            if self.with_csp:
                x = CSPLayer(
                    c, n=nblocks, act=self.act, bn_eps=self.bn_eps,
                    dtype=self.dtype, name=f"stage{i + 1}_csp",
                )(x, train)
            else:
                for j in range(nblocks):
                    x = DarkResidual(
                        c, act=self.act, bn_eps=self.bn_eps, dtype=self.dtype,
                        name=f"stage{i + 1}_res{j}",
                    )(x, train)
            outputs[f"dark{i + 1}"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


DARKNET53_STRIDES = {"dark1": 2, "dark2": 4, "dark3": 8, "dark4": 16, "dark5": 32}
DARKNET53_CHANNELS = {"dark3": 256, "dark4": 512, "dark5": 1024}


@BACKBONE_REGISTRY.register()
def build_darknet_backbone(cfg, dtype=jnp.float32):
    return Darknet53(
        stem_out_channels=cfg.MODEL.DARKNET.STEM_OUT_CHANNELS,
        out_features=tuple(cfg.MODEL.DARKNET.OUT_FEATURES),
        with_csp=cfg.MODEL.DARKNET.WITH_CSP,
        dtype=dtype,
    )


@BACKBONE_REGISTRY.register()
def build_cspdarknet_backbone(cfg, dtype=jnp.float32):
    """PP-YOLO flavoured CSP-Darknet53 (reference cspdarknet.py:405)."""
    return Darknet53(
        stem_out_channels=cfg.MODEL.DARKNET.STEM_OUT_CHANNELS,
        out_features=tuple(cfg.MODEL.DARKNET.OUT_FEATURES),
        with_csp=True,
        act="silu",
        bn_eps=1e-4,  # reference cspdarknet.py:59 get_norm(..., eps=1e-4)
        dtype=dtype,
    )
