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


class PPDarkBlock(nn.Module):
    """PP-YOLO CSP DarkBlock (reference cspdarknet.py:64): optional 1x1
    downsample ConvNormActivation, then 1x1 (width -> squeeze) and 3x3
    (squeeze -> width) convs, mish, residual AFTER the downsample. Note the
    reference's swapped arg names: conv1 maps planes->inplanes."""

    squeeze: int      # reference 'inplanes' (conv1 out)
    width: int        # reference 'planes' (block in/out)
    use_down: bool = False
    down_out: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_down:
            x = BaseConv(self.down_out, 1, 1, act="mish", bn_eps=1e-4,
                         dtype=self.dtype, name="down")(x, train)
        y = BaseConv(self.squeeze, 1, 1, act="mish", bn_eps=1e-4,
                     dtype=self.dtype, name="conv1")(x, train)
        y = BaseConv(self.width, 3, 1, act="mish", bn_eps=1e-4,
                     dtype=self.dtype, name="conv2")(y, train)
        return x + y


class CSPDarkStage(nn.Module):
    """CrossStagePartialBlock (reference cspdarknet.py:124): stride-2 base
    conv, two partial transitions, DarkBlocks on the transition-2 branch,
    concat [blocks, transition-1], 1x1 fuse. First stage keeps full width
    in the blocks; later stages run them at half width (CSP split)."""

    inplanes: int
    planes: int
    num_blocks: int
    first: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cb = lambda f, k, s, name: BaseConv(  # noqa: E731
            f, k, s, act="mish", bn_eps=1e-4, dtype=self.dtype, name=name
        )
        x = cb(self.planes, 3, 2, "base")(x, train)
        out1 = cb(self.inplanes if not self.first else self.planes,
                  1, 1, "pt1")(x, train)
        inner = self.planes if self.first else self.inplanes
        y = x
        for j in range(self.num_blocks):
            y = PPDarkBlock(
                squeeze=self.inplanes, width=inner,
                use_down=(j == 0), down_out=inner,
                dtype=self.dtype, name=f"block{j}",
            )(y, train)
        out2 = cb(inner, 1, 1, "pt2")(y, train)
        out = jnp.concatenate([out2, out1], axis=-1)
        return cb(self.planes, 1, 1, "fuse")(out, train)


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
        stem_act = "mish" if self.with_csp else self.act
        x = BaseConv(c, 3, 1, act=stem_act, bn_eps=self.bn_eps,
                     dtype=self.dtype, name="stem")(x, train)
        outputs: Dict[str, jnp.ndarray] = {}
        if self.with_csp:
            # faithful PP-YOLO CSP trunk (reference cspdarknet.py:124-215):
            # CrossStagePartialBlocks with mish, eps 1e-4
            inplanes = c
            for i, nblocks in enumerate(self.stage_blocks):
                planes = 64 * 2 ** i
                x = CSPDarkStage(
                    inplanes, planes, nblocks, first=(i == 0),
                    dtype=self.dtype, name=f"stage{i + 1}",
                )(x, train)
                inplanes = planes
                outputs[f"dark{i + 1}"] = x
            return {k: v for k, v in outputs.items()
                    if k in self.out_features}
        for i, nblocks in enumerate(self.stage_blocks):
            c *= 2
            x = BaseConv(c, 3, 2, act=self.act, bn_eps=self.bn_eps,
                         dtype=self.dtype,
                         name=f"stage{i + 1}_down")(x, train)
            if self.with_csp:
                pass  # handled below (faithful PP-YOLO CSP stage)
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
