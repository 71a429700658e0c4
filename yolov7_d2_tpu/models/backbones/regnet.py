"""RegNetX/Y backbones.

Parity with /root/reference/yolov7/modeling/backbone/regnet.py
(``build_regnet_backbone:146``). Standard AnyNet bottleneck stages with
group conv; the Y variant adds squeeze-excitation.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY
from ..layers.norm import BatchNorm

# (depths, widths, group_width) per stage — standard published configs
REGNET_SPECS: Dict[str, Tuple[Tuple[int, ...], Tuple[int, ...], int]] = {
    "x_200mf": ((1, 1, 4, 7), (24, 56, 152, 368), 8),
    "x_400mf": ((1, 2, 7, 12), (32, 64, 160, 384), 16),
    "x_800mf": ((1, 3, 7, 5), (64, 128, 288, 672), 16),
    "x_1.6gf": ((2, 4, 10, 2), (72, 168, 408, 912), 24),
    "y_400mf": ((1, 3, 6, 6), (48, 104, 208, 440), 8),
    "y_800mf": ((1, 3, 8, 2), (64, 128, 320, 768), 16),
}


class SE(nn.Module):
    channels: int
    ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(max(int(self.channels * self.ratio), 1), (1, 1),
                    dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="fc2")(s)
        return x * nn.sigmoid(s)


class RegNetBlock(nn.Module):
    width: int
    stride: int
    group_width: int
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv_bn(y, f, k, s, g, name, act=True):
            p = (k - 1) // 2
            y = nn.Conv(f, (k, k), (s, s), padding=[(p, p), (p, p)],
                        feature_group_count=g, use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"{name}_conv")(y)
            y = BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"{name}_bn")(y)
            return (nn.relu(y) if act else y).astype(self.dtype)

        groups = max(self.width // self.group_width, 1)
        y = conv_bn(x, self.width, 1, 1, 1, "a")
        y = conv_bn(y, self.width, 3, self.stride, groups, "b")
        if self.use_se:
            y = SE(self.width, dtype=self.dtype, name="se")(y)
        y = conv_bn(y, self.width, 1, 1, 1, "c", act=False)
        if x.shape[-1] != self.width or self.stride != 1:
            x = conv_bn(x, self.width, 1, self.stride, 1, "proj", act=False)
        return nn.relu(y + x).astype(self.dtype)


class RegNet(nn.Module):
    variant: str = "x_400mf"
    out_features: Sequence[str] = ("s2", "s3", "s4")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        depths, widths, gw = REGNET_SPECS[self.variant]
        x = nn.Conv(32, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_conv")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="stem_bn")(x)
        x = nn.relu(x).astype(self.dtype)
        outputs: Dict[str, jnp.ndarray] = {}
        use_se = self.variant.startswith("y")
        for stage, (n, w) in enumerate(zip(depths, widths)):
            for i in range(n):
                x = RegNetBlock(
                    w, stride=2 if i == 0 else 1, group_width=gw,
                    use_se=use_se, dtype=self.dtype,
                    name=f"s{stage + 1}_b{i}",
                )(x, train)
            outputs[f"s{stage + 1}"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


@BACKBONE_REGISTRY.register()
def build_regnet_backbone(cfg, dtype=jnp.float32):
    """Accepts reference-style names ('RegNetX_400MF', 'regnetx_0.4g',
    'regnetx_200mf') and spec keys ('x_400mf')."""
    t = cfg.MODEL.REGNETS.TYPE.lower().replace("regnet", "").lstrip("_")
    t = {
        "x_0.2g": "x_200mf", "x_0.4g": "x_400mf", "x_0.8g": "x_800mf",
        "x_1.6g": "x_1.6gf", "y_0.4g": "y_400mf", "y_0.8g": "y_800mf",
    }.get(t, t)
    if "_" not in t:
        t = f"{t}_400mf"
    return RegNet(
        variant=t,
        out_features=tuple(cfg.MODEL.REGNETS.OUT_FEATURES),
        dtype=dtype,
    )
