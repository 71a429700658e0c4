"""ConvNeXt-T/S/B backbone.

Parity with /root/reference/yolov7/modeling/backbone/convnext.py
(``build_convnext_backbone:210``; used by the YoloFormer/ConvNeXt-tiny
BASELINE row). Depthwise 7x7 + LN + pointwise MLP blocks with layer scale;
stochastic depth is omitted at init-parity (rate configurable later).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import BACKBONE_REGISTRY

CONVNEXT_SPECS = {
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3), (3, 3)],
            feature_group_count=self.dim, dtype=self.dtype,
            param_dtype=jnp.float32, name="dwconv",
        )(x)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pwconv2")(y)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init),
            (self.dim,),
        )
        y = y * gamma
        if self.drop_path > 0 and train:
            keep = 1.0 - self.drop_path
            rng = self.make_rng("droppath")
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            y = y * mask / keep
        return x + y.astype(x.dtype)


class ConvNeXt(nn.Module):
    size: str = "tiny"
    out_features: Sequence[int] = (1, 2, 3)  # stage indices (reference style)
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        depths, dims = CONVNEXT_SPECS[self.size]
        outputs: Dict[str, jnp.ndarray] = {}
        total = sum(depths)
        block_id = 0
        for stage, (n, d) in enumerate(zip(depths, dims)):
            if stage == 0:
                x = nn.Conv(d, (4, 4), (4, 4), dtype=self.dtype,
                            param_dtype=jnp.float32, name="stem_conv")(x)
                x = nn.LayerNorm(dtype=jnp.float32, name="stem_norm")(x).astype(
                    self.dtype
                )
            else:
                x = nn.LayerNorm(dtype=jnp.float32,
                                 name=f"down_norm_{stage}")(x).astype(self.dtype)
                x = nn.Conv(d, (2, 2), (2, 2), dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"down_conv_{stage}")(x)
            for i in range(n):
                dp = self.drop_path_rate * block_id / max(total - 1, 1)
                x = ConvNeXtBlock(
                    d, drop_path=dp, dtype=self.dtype,
                    name=f"stage{stage}_block{i}",
                )(x, train)
                block_id += 1
            if stage in self.out_features:
                # reference applies a per-stage channels-first LayerNorm
                # (eps 1e-6) to each output feature (convnext.py:108-113,
                # forward_features :157)
                out = nn.LayerNorm(dtype=jnp.float32,
                                   name=f"out_norm_{stage}")(x)
                outputs[f"stage{stage}"] = out.astype(self.dtype)
        return outputs


@BACKBONE_REGISTRY.register()
def build_convnext_backbone(cfg, dtype=jnp.float32):
    return ConvNeXt(
        size=cfg.MODEL.CONVNEXT.TYPE,
        out_features=tuple(cfg.MODEL.CONVNEXT.OUT_FEATURES),
        drop_path_rate=cfg.MODEL.CONVNEXT.DROP_PATH_RATE,
        dtype=dtype,
    )
