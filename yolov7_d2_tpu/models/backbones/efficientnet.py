"""EfficientNet-b0..b7 backbone (MBConv + SE).

Parity with /root/reference/yolov7/modeling/backbone/efficientnet.py
(``build_efficientnet_backbone:315`` and the +BiFPN combo ``:341``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY
from yolov7_d2_tpu.models.backbones.regnet import SE

# width_mult, depth_mult per variant
EFFNET_SCALING = {
    "efficientnet_b0": (1.0, 1.0), "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b2": (1.1, 1.2), "efficientnet_b3": (1.2, 1.4),
    "efficientnet_b4": (1.4, 1.8), "efficientnet_b5": (1.6, 2.2),
    "efficientnet_b6": (1.8, 2.6), "efficientnet_b7": (2.0, 3.1),
}
# (expand, channels, repeats, stride, kernel)
MBCONV_PLAN = [
    (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


def _round_filters(c: int, mult: float, divisor: int = 8) -> int:
    c = c * mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def _round_repeats(r: int, mult: float) -> int:
    return int(math.ceil(r * mult))


class MBConv(nn.Module):
    expand: int
    out_channels: int
    stride: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        mid = inp * self.expand

        def conv_bn(y, f, k, s, g, name):
            p = (k - 1) // 2
            y = nn.Conv(f, (k, k), (s, s), padding=[(p, p), (p, p)],
                        feature_group_count=g, use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"{name}_conv")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.float32,
                             name=f"{name}_bn")(y)
            return y.astype(self.dtype)

        y = x
        if self.expand != 1:
            y = nn.silu(conv_bn(y, mid, 1, 1, 1, "expand"))
        y = nn.silu(conv_bn(y, mid, self.kernel, self.stride, mid, "dw"))
        y = SE(mid, ratio=0.25 / self.expand, dtype=self.dtype, name="se")(y)
        y = conv_bn(y, self.out_channels, 1, 1, 1, "project")
        if self.stride == 1 and inp == self.out_channels:
            y = y + x
        return y


class EfficientNet(nn.Module):
    variant: str = "efficientnet_b0"
    out_features: Sequence[str] = ("stride4", "stride8", "stride16", "stride32")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        wm, dm = EFFNET_SCALING[self.variant]
        stem = _round_filters(32, wm)
        x = nn.Conv(stem, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32, name="stem_bn")(x)
        x = nn.silu(x).astype(self.dtype)

        outputs: Dict[str, jnp.ndarray] = {}
        stride = 2
        bid = 0
        for si, (e, c, r, s, k) in enumerate(MBCONV_PLAN):
            c = _round_filters(c, wm)
            r = _round_repeats(r, dm)
            for i in range(r):
                blk_stride = s if i == 0 else 1
                if blk_stride == 2:
                    # record the feature BEFORE downsampling as this stride's
                    # output (standard multi-scale tap)
                    outputs[f"stride{stride}"] = x
                x = MBConv(e, c, blk_stride, k, dtype=self.dtype,
                           name=f"block{bid}")(x, train)
                if blk_stride == 2:
                    stride *= 2
                bid += 1
        outputs[f"stride{stride}"] = x
        return {n: v for n, v in outputs.items() if n in self.out_features}


@BACKBONE_REGISTRY.register()
def build_efficientnet_backbone(cfg, dtype=jnp.float32):
    return EfficientNet(
        variant=cfg.MODEL.EFFICIENTNET.NAME,
        out_features=tuple(cfg.MODEL.EFFICIENTNET.OUT_FEATURES),
        dtype=dtype,
    )
