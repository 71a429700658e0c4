"""YOLOMask / OrienMask — detection + orientation-field instance masks.

Parity with /root/reference/yolov7/modeling/meta_arch/yolomask.py:52
(``OrienHead:334``, ``OrienMaskYOLOLoss:431``, multi-scale loss :855,
``postprocess_yolomask`` utils/boxes.py:307-378): an anchor-based YOLO
detector plus a dense 2D *orientation field* at 1/4 resolution — each pixel
predicts an offset vector toward the center of the instance it belongs to;
a detection's mask is the set of pixels whose pointed-at location falls
inside its box.

TPU redesign: the mask-recovery test (pixel + vector inside box?) is one
broadcasted comparison per detection — [D, H/4, W/4] boolean tensor ops, no
per-instance loops. The orientation head consumes the detector's own neck
pyramid (P3/P4/P5), matching the reference's shared-FPN layout.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY
from yolov7_d2_tpu.models.layers.blocks import BaseConv
from yolov7_d2_tpu.models.meta_arch.yolov7 import AnchorYOLO
from yolov7_d2_tpu.models.necks.yolo_pafpn import upsample2x_nearest
from yolov7_d2_tpu.ops.losses import masked_mean
from yolov7_d2_tpu.structures.instances import Detections


class OrienHead(nn.Module):
    """Fuse the FPN pyramid up to 1/4 resolution -> 2-channel offset field
    (reference OrienHead:334, UP_CHANNELS cfg)."""

    up_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        # feats: (P3 s8, P4 s16, P5 s32) -> all to s8, sum, then up to s4
        p3, p4, p5 = feats
        p4 = upsample2x_nearest(
            BaseConv(p3.shape[-1], 1, 1, dtype=self.dtype, name="lat4")(
                p4, train
            )
        )
        p5 = upsample2x_nearest(upsample2x_nearest(
            BaseConv(p3.shape[-1], 1, 1, dtype=self.dtype, name="lat5")(
                p5, train
            )
        ))
        x = p3 + p4 + p5
        x = BaseConv(self.up_channels, 3, 1, dtype=self.dtype, name="conv1")(
            x, train
        )
        x = upsample2x_nearest(x)
        x = BaseConv(self.up_channels, 3, 1, dtype=self.dtype, name="conv2")(
            x, train
        )
        # offset field in units of the 1/4-res grid
        return nn.Conv(2, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                       name="orien_pred")(x).astype(jnp.float32)


class YOLOMask(nn.Module):
    """AnchorYOLO detector + OrienHead. Returns det outputs + orien field."""

    num_classes: int = 80
    up_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        det = AnchorYOLO(
            num_classes=self.num_classes, backbone_type="cspdarknet53",
            neck_type="pafpn", act="silu", return_pyramid=True,
            dtype=self.dtype, name="detector",
        )
        flat = det(images, train)
        # OrienHead taps the DETECTOR'S OWN neck pyramid (P3/P4/P5), as the
        # reference does (yolomask.py:52 feeds the YOLO FPN levels into
        # OrienHead:334) — shared features, no parallel stem.
        pyramid = flat.pop("pyramid")
        orien = OrienHead(self.up_channels, dtype=self.dtype, name="orien")(
            list(pyramid), train
        )
        flat["orien"] = orien   # [B, H/4, W/4, 2]
        return flat


def orien_loss(
    orien: jnp.ndarray,        # [B, Hq, Wq, 2] offset field (grid units)
    gt_masks: jnp.ndarray,     # [B, G, H, W] binary at input res
    gt_boxes: jnp.ndarray,     # [B, G, 4] xyxy input pixels
    gt_valid: jnp.ndarray,     # [B, G]
) -> jnp.ndarray:
    """Orientation loss (OrienMaskYOLOLoss flavor): inside each instance
    mask the field must point at the instance center; scale 4 = stride."""
    b, hq, wq, _ = orien.shape
    g = gt_masks.shape[1]
    masks_q = (
        jax.image.resize(gt_masks.astype(jnp.float32), (b, g, hq, wq),
                         "bilinear") > 0.5
    ).astype(jnp.float32)
    ys = (jnp.arange(hq, dtype=jnp.float32) + 0.5)
    xs = (jnp.arange(wq, dtype=jnp.float32) + 0.5)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    cx = (gt_boxes[..., 0] + gt_boxes[..., 2]) * 0.5 / 4.0  # grid units
    cy = (gt_boxes[..., 1] + gt_boxes[..., 3]) * 0.5 / 4.0
    # target offset for pixels of instance g: center - pixel
    tx = cx[:, :, None, None] - gx[None, None]
    ty = cy[:, :, None, None] - gy[None, None]
    pred = orien[:, None]                                   # [B, 1, Hq, Wq, 2]
    err = jnp.abs(pred[..., 0] - tx) + jnp.abs(pred[..., 1] - ty)
    w = masks_q * gt_valid[:, :, None, None].astype(jnp.float32)
    return masked_mean(err, w > 0)


def yolomask_recover_masks(
    dets: Detections, orien: jnp.ndarray, stride: int = 4
) -> jnp.ndarray:
    """Mask recovery: pixel p belongs to detection d iff p + offset(p)
    lands inside d's box (postprocess_yolomask semantics). Returns
    [B, D, Hq, Wq] float masks."""
    b, hq, wq, _ = orien.shape
    ys = (jnp.arange(hq, dtype=jnp.float32) + 0.5)
    xs = (jnp.arange(wq, dtype=jnp.float32) + 0.5)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    px = (gx[None] + orien[..., 0]) * stride               # [B, Hq, Wq]
    py = (gy[None] + orien[..., 1]) * stride
    boxes = dets.boxes                                      # [B, D, 4]
    inside = (
        (px[:, None] >= boxes[..., 0, None, None])
        & (px[:, None] <= boxes[..., 2, None, None])
        & (py[:, None] >= boxes[..., 1, None, None])
        & (py[:, None] <= boxes[..., 3, None, None])
    )
    return inside.astype(jnp.float32) * dets.valid[..., None, None]


@META_ARCH_REGISTRY.register(name="YOLOMask")
def build_yolomask(cfg, dtype: Optional[Any] = None):
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    return YOLOMask(
        num_classes=cfg.MODEL.YOLO.CLASSES,
        up_channels=cfg.MODEL.YOLO.ORIEN_HEAD.UP_CHANNELS,
        dtype=dtype,
    )
