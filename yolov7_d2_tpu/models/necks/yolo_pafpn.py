"""YOLOPAFPN — the YOLOX PAN neck.

Parity with /root/reference/yolov7/modeling/neck/yolo_pafpn.py:13-114:
two top-down (upsample+concat+CSP) stages then two bottom-up (stride-2
conv+concat+CSP) stages. Upsampling is nearest 2x — a reshape/broadcast on
TPU, fused by XLA into the surrounding convs.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import NECK_REGISTRY
from yolov7_d2_tpu.models.layers.blocks import BaseConv, CSPLayer, DWConv


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class YOLOPAFPN(nn.Module):
    depth: float = 1.0
    width: float = 1.0
    in_channels: Sequence[int] = (256, 512, 1024)
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], train: bool = False
    ) -> Tuple[jnp.ndarray, ...]:
        """feats: (P3, P4, P5) = (dark3, dark4, dark5), NHWC."""
        x2, x1, x0 = feats  # stride 8, 16, 32
        w = self.width
        n = max(round(3 * self.depth), 1)
        c0, c1, c2 = [int(c * w) for c in self.in_channels]
        conv_cls = DWConv if self.depthwise else BaseConv

        # top-down
        fpn_out0 = BaseConv(c1, 1, 1, act=self.act, dtype=self.dtype,
                            name="lateral_conv0")(x0, train)
        f_out0 = jnp.concatenate([upsample2x_nearest(fpn_out0), x1], axis=-1)
        f_out0 = CSPLayer(c1, n=n, shortcut=False, depthwise=self.depthwise,
                          act=self.act, dtype=self.dtype, name="C3_p4")(
            f_out0, train
        )

        fpn_out1 = BaseConv(c0, 1, 1, act=self.act, dtype=self.dtype,
                            name="reduce_conv1")(f_out0, train)
        f_out1 = jnp.concatenate([upsample2x_nearest(fpn_out1), x2], axis=-1)
        pan_out2 = CSPLayer(c0, n=n, shortcut=False, depthwise=self.depthwise,
                            act=self.act, dtype=self.dtype, name="C3_p3")(
            f_out1, train
        )

        # bottom-up
        p_out1 = conv_cls(c0, 3, 2, act=self.act, dtype=self.dtype,
                          name="bu_conv2")(pan_out2, train)
        p_out1 = jnp.concatenate([p_out1, fpn_out1], axis=-1)
        pan_out1 = CSPLayer(c1, n=n, shortcut=False, depthwise=self.depthwise,
                            act=self.act, dtype=self.dtype, name="C3_n3")(
            p_out1, train
        )

        p_out0 = conv_cls(c1, 3, 2, act=self.act, dtype=self.dtype,
                          name="bu_conv1")(pan_out1, train)
        p_out0 = jnp.concatenate([p_out0, fpn_out0], axis=-1)
        pan_out0 = CSPLayer(c2, n=n, shortcut=False, depthwise=self.depthwise,
                            act=self.act, dtype=self.dtype, name="C3_n4")(
            p_out0, train
        )

        return (pan_out2, pan_out1, pan_out0)  # strides 8, 16, 32


@NECK_REGISTRY.register()
def build_yolo_pafpn(cfg, dtype=jnp.float32):
    return YOLOPAFPN(
        depth=cfg.MODEL.YOLO.DEPTH_MUL,
        width=cfg.MODEL.YOLO.WIDTH_MUL,
        depthwise=cfg.MODEL.DARKNET.DEPTH_WISE,
        dtype=dtype,
    )
