"""BiFPN — bidirectional weighted feature pyramid.

Parity with /root/reference/yolov7/modeling/neck/bifpn.py (``BiFPN:295``,
weighted ``FpnCombine:184``, ``ResampleFeatureMap:144``): 5-level pyramid
(P3..P7), fast-normalized fusion weights, separable convs optional.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import NECK_REGISTRY


class _SepConvBN(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=c, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dw")(x)
        x = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="pw")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32, name="bn")(x)
        return x.astype(self.dtype)


class _Combine(nn.Module):
    """Fast-normalized weighted sum of N inputs + sep-conv."""

    channels: int
    num_inputs: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        w = self.param(
            "fusion_weights", nn.initializers.ones, (self.num_inputs,)
        )
        w = nn.relu(w)
        w = w / (jnp.sum(w) + 1e-4)
        fused = sum(wi * x for wi, x in zip(w, inputs))
        fused = nn.silu(fused)
        return _SepConvBN(self.channels, dtype=self.dtype, name="conv")(
            fused, train
        )


def _downsample2x(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])


class BiFPN(nn.Module):
    """Input: 3 backbone levels (stride 8/16/32); internally extends to 5
    levels (P6, P7 via stride-2 pools) and runs ``num_bifpn`` passes."""

    out_channels: int = 160
    num_bifpn: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        # project + extend to 5 levels
        levels = []
        for i, f in enumerate(feats):
            p = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"proj_{i}")(f)
            p = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.float32,
                             name=f"proj_bn_{i}")(p).astype(self.dtype)
            levels.append(p)
        levels.append(_downsample2x(levels[-1]))          # P6
        levels.append(_downsample2x(levels[-1]))          # P7

        def up_to(x, ref):
            if x.shape[1:3] == ref.shape[1:3]:
                return x
            return jax.image.resize(x, ref.shape[:1] + ref.shape[1:3] + x.shape[3:],
                                    "nearest")

        for rep in range(self.num_bifpn):
            # top-down
            td = [None] * 5
            td[4] = levels[4]
            for i in range(3, -1, -1):
                td[i] = _Combine(
                    self.out_channels, 2, dtype=self.dtype,
                    name=f"r{rep}_td_{i}",
                )([levels[i], up_to(td[i + 1], levels[i])], train)
            # bottom-up
            out = [None] * 5
            out[0] = td[0]
            for i in range(1, 5):
                inputs = [levels[i], _downsample2x(out[i - 1])]
                n_in = 2
                if td[i] is not levels[i] and i != 4:
                    inputs.append(td[i])
                    n_in = 3
                out[i] = _Combine(
                    self.out_channels, n_in, dtype=self.dtype,
                    name=f"r{rep}_bu_{i}",
                )(inputs, train)
            levels = out
        return tuple(levels)


@NECK_REGISTRY.register()
def build_bifpn(cfg, dtype=jnp.float32):
    return BiFPN(
        out_channels=cfg.MODEL.BIFPN.OUT_CHANNELS,
        num_bifpn=cfg.MODEL.BIFPN.NUM_BIFPN,
        dtype=dtype,
    )
