"""Pallas TPU kernels for the device side of the input pipeline.

BASELINE's north star: the mapper's normalize/letterbox tail fuses into
device kernels feeding a double-buffered host->HBM pipeline. Host workers do
decode + geometry (cv2 resize/mosaic); the device kernel does everything
elementwise after that in ONE VMEM pass:

    uint8 HWC -> float -> (x - mean) / std  (or /255, or identity) -> dtype

This halves host->device bandwidth (uint8 instead of f32, 4x smaller) and
removes the separate normalize op from the model graph. On CPU (tests) the
kernel runs in interpreter mode.

Also here: ``pallas_grid_mask`` — GridMask dropout applied on device from a
per-image seed, so the host never touches pixel data for it.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _normalize_kernel(stats_ref, img_ref, out_ref):
    """One image row-block: uint8 -> (x - mean) / std in out dtype.

    Layout: channels are folded into the lane dimension ([B, H, W*C]) so
    tiles are dense — a trailing dim of 3 would waste 125/128 lanes.
    Mean/std arrive pre-tiled to the full W*C row. Mosaic has no uint8->f32
    cast; bitcast to int8 (same width) and undo two's complement.
    """
    s8 = pltpu.bitcast(img_ref[:], jnp.int8)
    x = s8.astype(jnp.float32)
    x = jnp.where(x < 0.0, x + 256.0, x)
    mean = stats_ref[0:1, :]  # [1, W*C] broadcasts over rows
    std = stats_ref[1:2, :]
    out_ref[:] = ((x - mean[None]) / std[None]).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("out_dtype", "block_rows"))
def fused_normalize(
    images: jnp.ndarray,             # [B, H, W, 3] uint8
    mean: jnp.ndarray,               # [3]
    std: jnp.ndarray,                # [3]
    out_dtype=jnp.bfloat16,
    block_rows: int = 64,
) -> jnp.ndarray:
    """uint8 batch -> normalized out_dtype batch, one fused VMEM pass."""
    b, h, w, c = images.shape
    grid = (b, pl.cdiv(h, block_rows))
    interpret = not _on_tpu()
    flat = images.reshape(b, h, w * c)
    stats = jnp.stack(
        [jnp.tile(mean.astype(jnp.float32), w),
         jnp.tile(std.astype(jnp.float32), w)]
    )                                           # [2, W*C]
    out = pl.pallas_call(
        _normalize_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, w * c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, w * c), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_rows, w * c),
                               lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(stats, flat)
    return out.reshape(b, h, w, c)


def _grid_mask_kernel(params_ref, img_ref, out_ref):
    """Apply GridMask from scalar params (d, keep, off_y, off_x, mode)."""
    d = params_ref[0, 0]
    keep = params_ref[0, 1]
    off_y = params_ref[0, 2]
    off_x = params_ref[0, 3]
    mode = params_ref[0, 4]
    x = img_ref[:]
    _, h, w, c = x.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    my = ((ys + off_y) % d) < (d - keep)
    mx = ((xs + off_x) % d) < (d - keep)
    drop = my | mx
    mask = jnp.where(mode == 1, ~drop, drop)
    out_ref[:] = jnp.where(mask[None, :, :, None], jnp.zeros_like(x), x)


@jax.jit
def pallas_grid_mask(
    images: jnp.ndarray,             # [B, H, W, C]
    params: jnp.ndarray,             # [B, 5] int32: d, keep, off_y, off_x, mode
) -> jnp.ndarray:
    """Per-image GridMask on device (reference Grid, transform.py:33-97)."""
    b, h, w, c = images.shape
    interpret = not _on_tpu()
    return pl.pallas_call(
        _grid_mask_kernel,
        out_shape=jax.ShapeDtypeStruct(images.shape, images.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 5), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
    )(params.astype(jnp.int32), images)


def reference_normalize(images, mean, std, out_dtype=jnp.bfloat16):
    """Plain-XLA version of fused_normalize (for testing / fallback)."""
    return (
        (images.astype(jnp.float32) - mean.reshape(1, 1, 1, 3))
        / std.reshape(1, 1, 1, 3)
    ).astype(out_dtype)
