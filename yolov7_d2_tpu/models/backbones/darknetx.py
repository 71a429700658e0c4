"""CSPDarknet-X — the YOLOX backbone family (s/m/l/x via width/depth muls).

Parity with /root/reference/yolov7/modeling/backbone/darknetx.py (CSPDarknet,
``build_cspdarknetx_backbone:194``): Focus stem -> dark2..dark5 with CSP
stages, SPP in dark5. NHWC / bf16-ready; returns a dict of named multi-scale
features like the reference's d2 ``Backbone.output_shape()`` contract.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY
from yolov7_d2_tpu.models.layers.blocks import (
    BaseConv,
    CSPLayer,
    DWConv,
    Focus,
    SPPBottleneck,
)


class CSPDarknetX(nn.Module):
    dep_mul: float = 1.0
    wid_mul: float = 1.0
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        base_ch = int(self.wid_mul * 64)
        base_depth = max(round(self.dep_mul * 3), 1)
        conv_cls = DWConv if self.depthwise else BaseConv
        outputs: Dict[str, jnp.ndarray] = {}

        # stem: stride 2 via space-to-depth
        x = Focus(base_ch, ksize=3, act=self.act, dtype=self.dtype, name="stem")(
            x, train
        )
        outputs["stem"] = x

        # dark2 (stride 4)
        x = conv_cls(base_ch * 2, 3, 2, act=self.act, dtype=self.dtype,
                     name="dark2_conv")(x, train)
        x = CSPLayer(base_ch * 2, n=base_depth, depthwise=self.depthwise,
                     act=self.act, dtype=self.dtype, name="dark2_csp")(x, train)
        outputs["dark2"] = x

        # dark3 (stride 8)
        x = conv_cls(base_ch * 4, 3, 2, act=self.act, dtype=self.dtype,
                     name="dark3_conv")(x, train)
        x = CSPLayer(base_ch * 4, n=base_depth * 3, depthwise=self.depthwise,
                     act=self.act, dtype=self.dtype, name="dark3_csp")(x, train)
        outputs["dark3"] = x

        # dark4 (stride 16)
        x = conv_cls(base_ch * 8, 3, 2, act=self.act, dtype=self.dtype,
                     name="dark4_conv")(x, train)
        x = CSPLayer(base_ch * 8, n=base_depth * 3, depthwise=self.depthwise,
                     act=self.act, dtype=self.dtype, name="dark4_csp")(x, train)
        outputs["dark4"] = x

        # dark5 (stride 32): conv -> SPP -> CSP(no shortcut)
        x = conv_cls(base_ch * 16, 3, 2, act=self.act, dtype=self.dtype,
                     name="dark5_conv")(x, train)
        x = SPPBottleneck(base_ch * 16, act=self.act, dtype=self.dtype,
                          name="dark5_spp")(x, train)
        x = CSPLayer(base_ch * 16, n=base_depth, shortcut=False,
                     depthwise=self.depthwise, act=self.act, dtype=self.dtype,
                     name="dark5_csp")(x, train)
        outputs["dark5"] = x

        return {k: v for k, v in outputs.items() if k in self.out_features}


# stride/channel metadata, the counterpart of d2 Backbone.output_shape()
CSPDARKNETX_STRIDES = {"stem": 2, "dark2": 4, "dark3": 8, "dark4": 16, "dark5": 32}


def cspdarknetx_out_channels(wid_mul: float) -> Dict[str, int]:
    base = int(wid_mul * 64)
    return {
        "stem": base, "dark2": base * 2, "dark3": base * 4,
        "dark4": base * 8, "dark5": base * 16,
    }


@BACKBONE_REGISTRY.register()
def build_cspdarknetx_backbone(cfg, dtype=jnp.float32):
    """Builder with the reference's registry name (darknetx.py:194)."""
    return CSPDarknetX(
        dep_mul=cfg.MODEL.YOLO.DEPTH_MUL,
        wid_mul=cfg.MODEL.YOLO.WIDTH_MUL,
        out_features=tuple(cfg.MODEL.YOLO.IN_FEATURES),
        depthwise=cfg.MODEL.DARKNET.DEPTH_WISE,
        dtype=dtype,
    )
