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
from ..layers.norm import BatchNorm

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


def _static_same_pad(k: int, s: int):
    """Reference layers/wrappers.py:250 'static_same': p = max(k - s, 0)
    split (p//2, p - p//2) — ASYMMETRIC for stride-2 convs ((0,1) at k3s2,
    (1,2) at k5s2), unlike symmetric (k-1)//2 padding."""
    p = max(k - s, 0)
    return (p // 2, p - p // 2)


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
            pad = _static_same_pad(k, s) if g > 1 else (0, 0)
            y = nn.Conv(f, (k, k), (s, s), padding=[pad, pad],
                        feature_group_count=g, use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"{name}_conv")(y)
            y = BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.float32,
                             name=f"{name}_bn")(y)
            return y.astype(self.dtype)

        y = x
        if self.expand != 1:
            y = nn.silu(conv_bn(y, mid, 1, 1, 1, "expand"))
        y = nn.silu(conv_bn(y, mid, self.kernel, self.stride, mid, "dw"))
        # SE with SWISH on the squeezed path (reference MBConvBlock.forward
        # applies self._swish between _se_reduce and _se_expand) and
        # reduction on the INPUT width (reduced_dim = in_planes / 4)
        se_mid = max(1, int(inp / 4))
        s_ = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s_ = nn.Conv(se_mid, (1, 1), dtype=jnp.float32,
                     name="se_reduce")(s_)
        s_ = nn.silu(s_)
        s_ = nn.Conv(mid, (1, 1), dtype=jnp.float32, name="se_expand")(s_)
        y = (y * nn.sigmoid(s_)).astype(self.dtype)
        y = conv_bn(y, self.out_channels, 1, 1, 1, "project")
        if self.stride == 1 and inp == self.out_channels:
            y = y + x
        return y


class EfficientNet(nn.Module):
    """``feature_indices`` taps the output AFTER those block ids, labeled
    stride4/8/16/32 positionally — the reference's
    ``return_features_indices`` semantics (efficientnet.py:179, default
    [1, 4, 10, 15] for b0; note index 1 is MID-stage-2, a quirk preserved
    for parity)."""

    variant: str = "efficientnet_b0"
    out_features: Sequence[str] = ("stride4", "stride8", "stride16", "stride32")
    feature_indices: Sequence[int] = (1, 4, 10, 15)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        wm, dm = EFFNET_SCALING[self.variant]
        stem = _round_filters(32, wm)
        pad = _static_same_pad(3, 2)
        x = nn.Conv(stem, (3, 3), (2, 2), padding=[pad, pad],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_conv")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32, name="stem_bn")(x)
        x = nn.silu(x).astype(self.dtype)

        names = ["stride4", "stride8", "stride16", "stride32"]
        taps = {b: names[i] for i, b in enumerate(sorted(self.feature_indices))}
        outputs: Dict[str, jnp.ndarray] = {}
        bid = 0
        for si, (e, c, r, s, k) in enumerate(MBCONV_PLAN):
            c = _round_filters(c, wm)
            r = _round_repeats(r, dm)
            for i in range(r):
                blk_stride = s if i == 0 else 1
                x = MBConv(e, c, blk_stride, k, dtype=self.dtype,
                           name=f"block{bid}")(x, train)
                if bid in taps:
                    outputs[taps[bid]] = x
                bid += 1
        return {n: v for n, v in outputs.items() if n in self.out_features}


@BACKBONE_REGISTRY.register()
def build_efficientnet_backbone(cfg, dtype=jnp.float32):
    return EfficientNet(
        variant=cfg.MODEL.EFFICIENTNET.NAME,
        out_features=tuple(cfg.MODEL.EFFICIENTNET.OUT_FEATURES),
        feature_indices=tuple(cfg.MODEL.EFFICIENTNET.FEATURE_INDICES),
        dtype=dtype,
    )
