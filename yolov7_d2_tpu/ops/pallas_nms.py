"""Pallas TPU kernel for greedy NMS.

The XLA formulation in ops/nms.py lowers the greedy loop to a
``lax.fori_loop`` whose every iteration re-reads the [N] candidate vectors
from HBM. This kernel keeps all candidate state (coordinates, areas, live
scores) resident in VMEM for the whole ``max_out``-iteration loop — one
kernel launch, zero HBM traffic after the initial load.

Coordinates arrive as four [1, N] rows (TPU wants trailing-128 lanes; a
[N, 4] layout would waste 31/32 of each tile). Class-aware batching uses the
same coordinate-offset trick as ops/nms.py. Interpret mode covers CPU tests.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _nms_kernel(thresh_ref, x0_ref, y0_ref, x1_ref, y1_ref, s_ref,
                idx_out_ref, valid_out_ref, live_ref):
    thresh = thresh_ref[0]
    x0, y0 = x0_ref[0, :], y0_ref[0, :]
    x1, y1 = x1_ref[0, :], y1_ref[0, :]
    area = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)
    live_ref[0, :] = jnp.where(s_ref[0, :] > 0.0, s_ref[0, :], NEG_INF)
    n = x0.shape[0]
    max_out = idx_out_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]
    ocol = jax.lax.broadcasted_iota(jnp.int32, (1, max_out), 1)[0]
    idx_out_ref[0, :] = jnp.full((max_out,), -1, jnp.int32)
    valid_out_ref[0, :] = jnp.zeros((max_out,), jnp.int32)

    def body(i, _):
        live = live_ref[0, :]
        # Pallas TPU forbids dynamic vector indexing: pick the winner via
        # masked reductions instead of live[best] / x0[best].
        maxval = jnp.max(live)
        best = jnp.argmax(live).astype(jnp.int32)
        best_ok = maxval > NEG_INF * 0.5
        sel = col == best
        write = ocol == i
        idx_out_ref[0, :] = jnp.where(
            write, jnp.where(best_ok, best, -1), idx_out_ref[0, :]
        )
        valid_out_ref[0, :] = jnp.where(
            write, best_ok.astype(jnp.int32), valid_out_ref[0, :]
        )
        bx0 = jnp.sum(jnp.where(sel, x0, 0.0))
        by0 = jnp.sum(jnp.where(sel, y0, 0.0))
        bx1 = jnp.sum(jnp.where(sel, x1, 0.0))
        by1 = jnp.sum(jnp.where(sel, y1, 0.0))
        barea = jnp.maximum(bx1 - bx0, 0.0) * jnp.maximum(by1 - by0, 0.0)
        iw = jnp.maximum(jnp.minimum(x1, bx1) - jnp.maximum(x0, bx0), 0.0)
        ih = jnp.maximum(jnp.minimum(y1, by1) - jnp.maximum(y0, by0), 0.0)
        inter = iw * ih
        iou = inter / (area + barea - inter + 1e-9)
        suppress = (iou > thresh) | sel
        live_ref[0, :] = jnp.where(best_ok & suppress, NEG_INF, live)
        return 0

    jax.lax.fori_loop(0, max_out, body, 0)


@partial(jax.jit, static_argnames=("max_outputs",))
def pallas_nms(
    boxes: jnp.ndarray,      # [N, 4] xyxy
    scores: jnp.ndarray,     # [N] (0 = padded slot)
    iou_threshold: float = 0.5,
    max_outputs: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ops.nms.nms (greedy semantics, same outputs)."""
    n = boxes.shape[0]
    interpret = not _on_tpu()
    idx, valid = pl.pallas_call(
        _nms_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, max_outputs), jnp.int32),
            jax.ShapeDtypeStruct((1, max_outputs), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)],
        interpret=interpret,
    )(
        jnp.asarray([iou_threshold], jnp.float32),
        boxes[None, :, 0].astype(jnp.float32),
        boxes[None, :, 1].astype(jnp.float32),
        boxes[None, :, 2].astype(jnp.float32),
        boxes[None, :, 3].astype(jnp.float32),
        scores[None, :].astype(jnp.float32),
    )
    return idx[0], valid[0].astype(bool)


def pallas_batched_nms(
    boxes: jnp.ndarray, scores: jnp.ndarray, classes: jnp.ndarray,
    iou_threshold: float = 0.5, max_outputs: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware variant via the coordinate-offset trick."""
    span = jnp.max(boxes) + 1.0
    shifted = boxes + classes.astype(boxes.dtype)[..., None] * span
    return pallas_nms(shifted, scores, iou_threshold, max_outputs)
