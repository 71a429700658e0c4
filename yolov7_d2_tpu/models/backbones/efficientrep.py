"""EfficientRep backbone (YOLOv6) built from RepVGG blocks.

Parity with /root/reference/yolov7/modeling/backbone/efficientrep.py
(``build_efficientrep_backbone:492``, ``build_efficientrep_tiny:517``):
RepVGG stem + per-stage RepBlock stacks + SPPF at stride 32. Deploy-time
3-branch fusion lives in utils/checkpoint (rep-param conv fuse).

BN eps/momentum are the ASSEMBLED-model values (1e-3 / torch 0.03): the
standalone reference modules keep torch BatchNorm2d defaults (eps 1e-5),
but every assembled reference meta-arch overwrites them via ``_init_model``
(meta_arch/yolov6.py:107-111, yolox.py:82-90) — so a checkpoint trained
with the reference always carries 1e-3 statistics.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY
from yolov7_d2_tpu.models.layers.blocks import RepVGGBlock, SPPBottleneck


def make_divisible(x: float, divisor: int = 8) -> int:
    """YOLOv6 channel rounding (reference efficientrep.py builder:
    ``make_divisible(i * width_mul, 8)`` = ceil to a multiple of 8)."""
    import math

    return int(math.ceil(x / divisor) * divisor)


class RepBlock(nn.Module):
    channels: int
    n: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n):
            x = RepVGGBlock(self.channels, 1, dtype=self.dtype,
                            name=f"rep_{i}")(x, train)
        return x


class EfficientRep(nn.Module):
    width_mul: float = 1.0
    depth_mul: float = 1.0
    out_features: Sequence[str] = ("erep3", "erep4", "erep5")
    dtype: Any = jnp.float32

    channels_plan: Sequence[int] = (64, 128, 256, 512, 1024)
    repeats_plan: Sequence[int] = (1, 6, 12, 18, 6)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        chs = [make_divisible(c * self.width_mul) for c in self.channels_plan]
        reps = [
            max(round(r * self.depth_mul), 1) if r > 1 else r
            for r in self.repeats_plan
        ]
        x = RepVGGBlock(chs[0], 2, dtype=self.dtype, name="stem")(x, train)
        outputs: Dict[str, jnp.ndarray] = {}
        for i in range(1, 5):
            x = RepVGGBlock(chs[i], 2, dtype=self.dtype,
                            name=f"down{i + 1}")(x, train)
            x = RepBlock(chs[i], reps[i], dtype=self.dtype,
                         name=f"stage{i + 1}")(x, train)
            if i == 4:
                x = SPPBottleneck(chs[i], act="relu", dtype=self.dtype,
                                  name="sppf")(x, train)
            outputs[f"erep{i + 1}"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


@BACKBONE_REGISTRY.register()
def build_efficientrep_backbone(cfg, dtype=jnp.float32):
    return EfficientRep(
        width_mul=cfg.MODEL.YOLO.WIDTH_MUL,
        depth_mul=cfg.MODEL.YOLO.DEPTH_MUL,
        dtype=dtype,
    )


@BACKBONE_REGISTRY.register()
def build_efficientrep_tiny_backbone(cfg, dtype=jnp.float32):
    return EfficientRep(
        width_mul=0.25, depth_mul=0.33, dtype=dtype,
    )
