"""YOLOv3 FPN neck with optional SPP.

Parity with /root/reference/yolov7/modeling/neck/yolo_fpn.py:13-110:
top-down lateral 1x1 + upsample + concat, 5-conv blocks per level, optional
SPP on the deepest level (MODEL.YOLO.NECK.WITH_SPP).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import NECK_REGISTRY
from yolov7_d2_tpu.models.layers.blocks import BaseConv, SPPBottleneck
from yolov7_d2_tpu.models.necks.yolo_pafpn import upsample2x_nearest


class _ConvBlock5(nn.Module):
    """The classic 1-3-1-3-1 conv stack of YOLOv3 heads. BN eps 1e-5:
    the YOLO/YOLOV7 archs never apply the yolox BN reset, so the neck's
    BatchNorms keep torch defaults (reference yolo_fpn.py builds plain
    BaseConv/BatchNorm2d)."""

    channels: int
    act: str = "lrelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        kw = dict(act=self.act, bn_eps=1e-5, dtype=self.dtype)
        x = BaseConv(c, 1, 1, name="conv0", **kw)(x, train)
        x = BaseConv(c * 2, 3, 1, name="conv1", **kw)(x, train)
        x = BaseConv(c, 1, 1, name="conv2", **kw)(x, train)
        x = BaseConv(c * 2, 3, 1, name="conv3", **kw)(x, train)
        x = BaseConv(c, 1, 1, name="conv4", **kw)(x, train)
        return x


class YOLOFPN(nn.Module):
    """Returns (P3, P4, P5) with channels (128, 256, 512)."""

    with_spp: bool = False
    act: str = "lrelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> Tuple[jnp.ndarray, ...]:
        x2, x1, x0 = feats  # dark3 (s8), dark4 (s16), dark5 (s32)

        if self.with_spp:
            # reference yolo_fpn.py:48 SPPBottleneck keeps its DEFAULT silu
            # activation (mixed with the lrelu neck — faithful quirk)
            x0 = SPPBottleneck(
                x0.shape[-1], act="silu", bn_eps=1e-5, dtype=self.dtype,
                name="spp",
            )(x0, train)
        out0 = _ConvBlock5(512, act=self.act, dtype=self.dtype, name="block5")(
            x0, train
        )

        lat1 = BaseConv(256, 1, 1, act=self.act, bn_eps=1e-5,
                        dtype=self.dtype, name="lateral1")(out0, train)
        x1 = jnp.concatenate([upsample2x_nearest(lat1), x1], axis=-1)
        out1 = _ConvBlock5(256, act=self.act, dtype=self.dtype, name="block4")(
            x1, train
        )

        lat2 = BaseConv(128, 1, 1, act=self.act, bn_eps=1e-5,
                        dtype=self.dtype, name="lateral2")(out1, train)
        x2 = jnp.concatenate([upsample2x_nearest(lat2), x2], axis=-1)
        out2 = _ConvBlock5(128, act=self.act, dtype=self.dtype, name="block3")(
            x2, train
        )

        return (out2, out1, out0)  # strides 8, 16, 32


@NECK_REGISTRY.register()
def build_yolo_fpn(cfg, dtype=jnp.float32):
    return YOLOFPN(with_spp=cfg.MODEL.YOLO.NECK.WITH_SPP, dtype=dtype)
