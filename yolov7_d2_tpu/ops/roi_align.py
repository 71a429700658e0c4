"""ROIAlign as a pure-XLA gather/bilinear kernel.

The reference delegates ROI pooling to detectron2's CUDA ROIAlignV2 (the
Mask R-CNN / new_baselines model family of the LazyConfig universe —
SURVEY.md L0 substrate). TPU-native formulation: for every box, a static
``out_size * sampling_ratio`` sampling grid is bilinearly interpolated via
4-neighbor gathers and average-pooled per bin — fixed shapes, vmappable
over boxes and batch, differentiable.

Semantics follow ROIAlignV2 (``aligned=True``): continuous coordinates with
the half-pixel offset, no coordinate rounding anywhere.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """feat [H, W, C]; ys/xs arbitrary same-shape float grids -> [..., C].
    Out-of-range coordinates clamp to the border (ROIAlign behavior)."""
    h, w, _ = feat.shape
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    v00 = feat[y0i, x0i]
    v01 = feat[y0i, x1i]
    v10 = feat[y1i, x0i]
    v11 = feat[y1i, x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def roi_align(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """feat [H, W, C]; boxes [N, 4] xyxy in IMAGE coordinates ->
    [N, out_size, out_size, C]."""
    r = max(sampling_ratio, 1)
    s = out_size * r

    def one(box):
        # aligned=True: scale then shift by half a pixel
        x0 = box[0] * spatial_scale - 0.5
        y0 = box[1] * spatial_scale - 0.5
        x1 = box[2] * spatial_scale - 0.5
        y1 = box[3] * spatial_scale - 0.5
        bw = jnp.maximum(x1 - x0, 1e-4)
        bh = jnp.maximum(y1 - y0, 1e-4)
        xs = x0 + (jnp.arange(s, dtype=jnp.float32) + 0.5) * (bw / s)
        ys = y0 + (jnp.arange(s, dtype=jnp.float32) + 0.5) * (bh / s)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        samples = bilinear_sample(feat, gy, gx)          # [s, s, C]
        # average the r x r samples inside each output bin
        c = samples.shape[-1]
        samples = samples.reshape(out_size, r, out_size, r, c)
        return samples.mean(axis=(1, 3))

    return jax.vmap(one)(boxes)


def multilevel_roi_align(
    feats: dict,
    boxes: jnp.ndarray,
    out_size: int,
    strides: Tuple[int, ...] = (4, 8, 16, 32),
    level_names: Tuple[str, ...] = ("p2", "p3", "p4", "p5"),
    canonical_size: int = 224,
    canonical_level: int = 2,
) -> jnp.ndarray:
    """FPN level assignment (FPN paper eq.1 / d2 ROIPooler): each box pools
    from level floor(canonical + log2(sqrt(area)/canonical_size)). Static
    implementation: pool from EVERY level, then select per box."""
    areas = jnp.maximum(
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-4
    )
    target = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(areas) / canonical_size + 1e-8)
    )
    lvl_idx = jnp.clip(
        target - canonical_level + 0, 0, len(level_names) - 1
    ).astype(jnp.int32)
    pooled = jnp.stack(
        [
            roi_align(
                feats[name], boxes, out_size, spatial_scale=1.0 / stride
            )
            for name, stride in zip(level_names, strides)
        ],
        axis=0,
    )  # [L, N, S, S, C]  (feats[name]: per-image [H, W, C])
    return jnp.take_along_axis(
        pooled, lvl_idx[None, :, None, None, None], axis=0
    )[0]
