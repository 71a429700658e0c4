"""Deformable convolution v1/v2 — gather-based TPU formulation.

The reference consumes detectron2's CUDA deform-conv for the R-50-DCN
SparseInst configs and SOLOv2's optional DCN towers (SURVEY.md §2.14 item 2).
On TPU there is no scatter/gather conv primitive; the idiomatic formulation:

  1. a regular conv predicts per-position offsets [B, H, W, K*K*2]
     (+ modulation masks for v2),
  2. for each of the K*K taps, bilinear-sample the input at
     (base_grid + tap_offset + predicted_offset) — four gathers + lerp,
     fully vectorized over B,H,W,
  3. the sampled taps stack into [B, H, W, K*K*C] and a 1x1 conv
     (= the original K*K kernel reshaped) produces the output — one big
     MXU matmul.

Everything is static-shaped; XLA fuses the sampling arithmetic around the
gathers.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def bilinear_sample(
    img: jnp.ndarray,    # [B, H, W, C]
    x: jnp.ndarray,      # [B, H', W'] sample x coords (pixel units)
    y: jnp.ndarray,      # [B, H', W']
) -> jnp.ndarray:
    """Bilinear sampling with zero padding outside the image."""
    b, h, w, c = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    def gather(yy, xx):
        inside = (
            (xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1)
        )[..., None]
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        batch_idx = jnp.arange(b)[:, None, None]
        vals = img[batch_idx, yi, xi]
        return vals * inside

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def deform_sample_taps(
    x: jnp.ndarray,        # [B, H, W, C]
    offsets: jnp.ndarray,  # [B, H, W, K*K*2] (dy, dx) per tap
    kernel: int = 3,
    modulation: jnp.ndarray | None = None,  # [B, H, W, K*K] (v2 masks)
) -> jnp.ndarray:
    """Sample the K*K deformed taps -> [B, H, W, K*K*C]."""
    b, h, w, c = x.shape
    k2 = kernel * kernel
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    taps = []
    half = (kernel - 1) // 2
    off = offsets.reshape(b, h, w, k2, 2)
    idx = 0
    for dy in range(-half, half + 1):
        for dx in range(-half, half + 1):
            sy = gy[None] + dy + off[..., idx, 0]
            sx = gx[None] + dx + off[..., idx, 1]
            s = bilinear_sample(x, sx, sy)
            if modulation is not None:
                s = s * jax.nn.sigmoid(modulation[..., idx])[..., None]
            taps.append(s)
            idx += 1
    return jnp.concatenate(taps, axis=-1)


class DeformConv(nn.Module):
    """Deformable conv block (v2 when ``modulated``): offset conv + sampled
    taps + 1x1 fuse (the reshaped KxK kernel)."""

    features: int
    kernel: int = 3
    modulated: bool = True     # DCNv2 (reference TYPE_DCN: DCN | DCNv2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k2 = self.kernel * self.kernel
        off_ch = k2 * (3 if self.modulated else 2)
        raw = nn.Conv(
            off_ch, (self.kernel, self.kernel),
            padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.zeros,   # start as a plain conv
            dtype=jnp.float32, param_dtype=jnp.float32, name="offset_conv",
        )(x.astype(jnp.float32))
        offsets = raw[..., : k2 * 2]
        modulation = raw[..., k2 * 2 :] if self.modulated else None
        taps = deform_sample_taps(
            x.astype(jnp.float32), offsets, self.kernel, modulation
        )
        out = nn.Conv(
            self.features, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, name="weight",
        )(taps.astype(self.dtype))
        return out
