"""YOLOv5 CSP backbone.

Parity with /root/reference/yolov7/modeling/backbone/yolov5_backbone.py:14
(``YOLOv5BackBone``): Focus stem -> Conv/C3 stages with the v5 depth plan
(3, 9, 9, 3 repeats scaled by gd), SPP(5/9/13) after the stride-32 conv,
a final no-shortcut C3 and a 1x1 conv that NARROWS C5 to 512*gw — the
channel plan that distinguishes it from the YOLOX CSPDarknet (darknetx.py),
whose SPP sits before the last CSP and whose C5 stays at 1024*gw.

Size gains (reference :20-24): s=(0.33, 0.5) m=(0.67, 0.75) l=(1, 1)
x=(1.33, 1.25).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY
from yolov7_d2_tpu.models.layers.blocks import (
    BaseConv,
    CSPLayer,
    Focus,
    SPPBottleneck,
)

_GAINS = {
    "s": (0.33, 0.5),
    "m": (0.67, 0.75),
    "l": (1.0, 1.0),
    "x": (1.33, 1.25),
}


def _make_divisible(v: float, d: int = 8) -> int:
    return max(int((v + d / 2) // d * d), d)


class YOLOv5Backbone(nn.Module):
    version: str = "s"
    with_focus: bool = True
    out_features: Sequence[str] = ("c3", "c4", "c5")
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        gd, gw = _GAINS[self.version.lower()]

        def w(c):
            return _make_divisible(c * gw)

        def d(n):
            return max(round(n * gd), 1) if n > 1 else n

        if self.with_focus:
            x = Focus(w(64), ksize=3, act=self.act, dtype=self.dtype,
                      name="stage1")(x, train)
        else:
            x = BaseConv(w(64), 3, 2, act=self.act, dtype=self.dtype,
                         name="stage1")(x, train)
        x = BaseConv(w(128), 3, 2, act=self.act, dtype=self.dtype,
                     name="stage2_1")(x, train)
        x = CSPLayer(w(128), n=d(3), act=self.act, dtype=self.dtype,
                     name="stage2_2")(x, train)
        x = BaseConv(w(256), 3, 2, act=self.act, dtype=self.dtype,
                     name="stage3_1")(x, train)
        c3 = CSPLayer(w(256), n=d(9), act=self.act, dtype=self.dtype,
                      name="stage3_2")(x, train)
        x = BaseConv(w(512), 3, 2, act=self.act, dtype=self.dtype,
                     name="stage4_1")(c3, train)
        c4 = CSPLayer(w(512), n=d(9), act=self.act, dtype=self.dtype,
                      name="stage4_2")(x, train)
        x = BaseConv(w(1024), 3, 2, act=self.act, dtype=self.dtype,
                     name="stage5")(c4, train)
        x = SPPBottleneck(w(1024), act=self.act, dtype=self.dtype,
                          name="spp")(x, train)
        x = CSPLayer(w(1024), n=d(3), shortcut=False, act=self.act,
                     dtype=self.dtype, name="csp1")(x, train)
        c5 = BaseConv(w(512), 1, 1, act=self.act, dtype=self.dtype,
                      name="conv1")(x, train)
        outputs = {"c3": c3, "c4": c4, "c5": c5}
        return {k: v for k, v in outputs.items() if k in self.out_features}


@BACKBONE_REGISTRY.register()
def build_yolov5_backbone(cfg, dtype=jnp.float32):
    """Version from the width multiplier (the reference selects via its
    yolov5 config family: s/m/l/x)."""
    wm = cfg.MODEL.YOLO.WIDTH_MUL
    version = {0.5: "s", 0.75: "m", 1.0: "l", 1.25: "x"}.get(wm, "s")
    return YOLOv5Backbone(version=version, dtype=dtype)
