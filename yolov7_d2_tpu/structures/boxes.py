"""Box modes and coordinate conversions.

Capability parity with the reference's ``BoxModeMy``
(/root/reference/yolov7/utils/boxes.py:441-663) including its deliberate
quirk: ``XYWH_ABS`` is **center**-xywh (cx, cy, w, h) — documented at
boxes.py:452-455 — which differs from detectron2's corner convention. We keep
both under explicit names so nothing is ambiguous.

All functions are pure jnp and jit-safe; they accept ``[..., 4]`` arrays.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class BoxMode(enum.IntEnum):
    XYXY_ABS = 0      # (x0, y0, x1, y1) absolute pixels
    XYWH_ABS = 1      # (cx, cy, w, h) — CENTER convention (reference quirk)
    XYXY_REL = 2      # (x0, y0, x1, y1) in [0, 1]
    XYWH_REL = 3      # (cx, cy, w, h) in [0, 1]
    XYWHA_ABS = 4     # rotated; (cx, cy, w, h, angle)
    XYWH_CORNER_ABS = 5  # (x0, y0, w, h) — COCO / detectron2 convention


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1
    )


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def xywh_corner_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x0, y0, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x0, y0, x0 + w, y0 + h], axis=-1)


def xyxy_to_xywh_corner(boxes: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x0, y0, x1 - x0, y1 - y0], axis=-1)


_CONVERTERS = {
    (BoxMode.XYWH_ABS, BoxMode.XYXY_ABS): cxcywh_to_xyxy,
    (BoxMode.XYXY_ABS, BoxMode.XYWH_ABS): xyxy_to_cxcywh,
    (BoxMode.XYWH_CORNER_ABS, BoxMode.XYXY_ABS): xywh_corner_to_xyxy,
    (BoxMode.XYXY_ABS, BoxMode.XYWH_CORNER_ABS): xyxy_to_xywh_corner,
}


def convert_box_mode(
    boxes: jnp.ndarray, from_mode: BoxMode, to_mode: BoxMode
) -> jnp.ndarray:
    """Convert between box modes (reference BoxModeMy.convert)."""
    if from_mode == to_mode:
        return boxes
    key = (from_mode, to_mode)
    if key in _CONVERTERS:
        return _CONVERTERS[key](boxes)
    # two-hop through XYXY_ABS
    mid = _CONVERTERS[(from_mode, BoxMode.XYXY_ABS)](boxes)
    return _CONVERTERS[(BoxMode.XYXY_ABS, to_mode)](mid)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, clamped at 0 for degenerate boxes."""
    wh = jnp.clip(boxes[..., 2:4] - boxes[..., 0:2], min=0.0)
    return wh[..., 0] * wh[..., 1]


def clip_boxes(boxes: jnp.ndarray, h, w) -> jnp.ndarray:
    """Clip xyxy boxes to an image of size (h, w)."""
    x0 = jnp.clip(boxes[..., 0:1], 0.0, w)
    y0 = jnp.clip(boxes[..., 1:2], 0.0, h)
    x1 = jnp.clip(boxes[..., 2:3], 0.0, w)
    y1 = jnp.clip(boxes[..., 3:4], 0.0, h)
    return jnp.concatenate([x0, y0, x1, y1], axis=-1)


def scale_boxes(boxes: jnp.ndarray, scale_x, scale_y) -> jnp.ndarray:
    sx = jnp.asarray(scale_x, boxes.dtype)
    sy = jnp.asarray(scale_y, boxes.dtype)
    return boxes * jnp.stack([sx, sy, sx, sy])
