"""TPU-native NMS suite — fixed shapes, no host round-trips.

Replaces the reference's CUDA ``torchvision.ops.batched_nms`` and its NMS
variants:
  * ``generalized_batched_nms`` dispatch (normal / softnms-linear /
    softnms-gaussian / cluster) — /root/reference/yolov7/modeling/meta_arch/utils.py:30-113
  * matrix-NMS for SOLOv2 masks — /root/reference/yolov7/utils/solov2_utils.py:142-232
  * class-aware batching via the coordinate-offset trick (torchvision's).

Every function takes and returns **static shapes**: inputs are padded
candidate sets with score 0 / validity masks, outputs are ``max_outputs``
slots + a validity mask. Greedy NMS is a ``lax.fori_loop`` of argmax +
vectorized suppression — O(max_out · N) VPU work, sequential only in
``max_out`` (≤100), which XLA pipelines well. All ops vmap over a batch dim.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from yolov7_d2_tpu.ops.iou import pairwise_box_iou

NEG_INF = -1e10


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    max_outputs: int = 100,
    score_threshold: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy hard NMS. boxes [N,4] xyxy, scores [N] (0 = padded slot).

    Returns (keep_indices [max_outputs] int32, keep_valid [max_outputs] bool).
    Semantics match torchvision.ops.nms restricted to the top max_outputs.
    """
    keep_idx, keep_valid = nms_batched(
        boxes[None], scores[None], iou_threshold, max_outputs, score_threshold
    )
    return keep_idx[0], keep_valid[0]


def nms_batched(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    max_outputs: int = 100,
    score_threshold: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy hard NMS over a whole batch in one loop.

    boxes [B,N,4] xyxy, scores [B,N] -> (keep_idx [B,max_outputs] int32,
    keep_valid [B,max_outputs] bool). Identical semantics to ``jax.vmap(nms)``
    but ~26x faster on TPU: vmapping the scalar-argmax loop lowers each
    iteration to per-image gathers; expressing the loop batched keeps every
    iteration a [B,N] vector op (argmax / row-gather / masked update).
    """
    b, n, _ = boxes.shape
    # The barrier forces the [B,N,N] matrix to materialize BEFORE the loop:
    # without it XLA fuses the IoU computation into the loop body and
    # recomputes the full matrix every iteration (measured 85ms -> 4ms for
    # B=128, N=1024 on v5e).
    iou = jax.lax.optimization_barrier(
        jax.vmap(pairwise_box_iou)(boxes, boxes)
    )  # [B, N, N]
    live = jnp.where(scores > score_threshold, scores, NEG_INF)

    def body(i, carry):
        live, keep_idx, keep_valid = carry
        best = jnp.argmax(live, axis=1)  # [B]
        best_score = jnp.take_along_axis(live, best[:, None], axis=1)[:, 0]
        ok = best_score > NEG_INF * 0.5
        keep_idx = jax.lax.dynamic_update_slice_in_dim(
            keep_idx, jnp.where(ok, best, -1).astype(jnp.int32)[:, None], i, 1
        )
        keep_valid = jax.lax.dynamic_update_slice_in_dim(
            keep_valid, ok[:, None], i, 1
        )
        row = jnp.take_along_axis(iou, best[:, None, None], axis=1)[:, 0]
        suppress = (row > iou_threshold) | (
            jnp.arange(n)[None, :] == best[:, None]
        )
        live = jnp.where(ok[:, None] & suppress, NEG_INF, live)
        return live, keep_idx, keep_valid

    keep_idx = jnp.full((b, max_outputs), -1, jnp.int32)
    keep_valid = jnp.zeros((b, max_outputs), bool)
    _, keep_idx, keep_valid = jax.lax.fori_loop(
        0, max_outputs, body, (live, keep_idx, keep_valid)
    )
    return keep_idx, keep_valid


def batched_nms_batched(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_threshold: float = 0.5,
    max_outputs: int = 100,
    score_threshold: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware batched-over-images NMS ([B,N,4], [B,N], [B,N])."""
    return nms_batched(
        _class_offset_boxes(boxes, classes),
        scores,
        iou_threshold,
        max_outputs,
        score_threshold,
    )


def _class_offset_boxes(
    boxes: jnp.ndarray, classes: jnp.ndarray
) -> jnp.ndarray:
    """Offset boxes per class so cross-class pairs never overlap."""
    span = jnp.max(boxes) + 1.0
    offset = classes.astype(boxes.dtype)[..., None] * span
    return boxes + offset


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_threshold: float = 0.5,
    max_outputs: int = 100,
    score_threshold: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS (torchvision.ops.batched_nms semantics)."""
    return nms(
        _class_offset_boxes(boxes, classes),
        scores,
        iou_threshold,
        max_outputs,
        score_threshold,
    )


def soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    max_outputs: int = 100,
    sigma: float = 0.5,
    score_threshold: float = 0.001,
    method: str = "gaussian",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft-NMS (Bodla et al.): decay neighbor scores instead of removing.

    method: 'linear' (score *= 1-iou when iou>thresh) or 'gaussian'
    (score *= exp(-iou²/sigma)). Returns (keep_idx, keep_valid, new_scores)
    where new_scores are the decayed scores of the kept boxes.
    """
    n = boxes.shape[0]
    # barrier: keep XLA from fusing the matrix into the loop (see nms_batched)
    iou = jax.lax.optimization_barrier(pairwise_box_iou(boxes, boxes))

    def body(i, carry):
        live_scores, keep_idx, keep_valid, kept_scores = carry
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        best_ok = best_score > score_threshold
        keep_idx = keep_idx.at[i].set(jnp.where(best_ok, best, -1))
        keep_valid = keep_valid.at[i].set(best_ok)
        kept_scores = kept_scores.at[i].set(jnp.where(best_ok, best_score, 0.0))
        ious = iou[best]
        if method == "linear":
            decay = jnp.where(ious > iou_threshold, 1.0 - ious, 1.0)
        else:
            decay = jnp.exp(-(ious * ious) / sigma)
        live_scores = jnp.where(best_ok, live_scores * decay, live_scores)
        live_scores = jnp.where(
            jnp.arange(n) == best, NEG_INF, live_scores
        )
        return live_scores, keep_idx, keep_valid, kept_scores

    carry = (
        jnp.where(scores > 0, scores, NEG_INF),
        jnp.full((max_outputs,), -1, jnp.int32),
        jnp.zeros((max_outputs,), bool),
        jnp.zeros((max_outputs,), jnp.float32),
    )
    _, keep_idx, keep_valid, kept_scores = jax.lax.fori_loop(
        0, max_outputs, body, carry
    )
    return keep_idx, keep_valid, kept_scores


def cluster_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    max_outputs: int = 100,
    num_iters: int = 20,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster-NMS (CIoU paper): parallel iterative matrix suppression.

    Converges to hard-NMS semantics in ≤ #clusters iterations; we run a
    fixed ``num_iters`` (sufficient for detection workloads) to stay static.
    """
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    iou = pairwise_box_iou(boxes_s, boxes_s)
    # barrier: materialize before the loop (see nms_batched)
    upper = jax.lax.optimization_barrier(jnp.triu(iou, k=1))

    def body(_, keep):
        # a box is kept iff no *kept* higher-scored box overlaps it
        max_iou = jnp.max(upper * keep[:, None], axis=0)
        return (max_iou <= iou_threshold).astype(boxes.dtype)

    keep = jax.lax.fori_loop(
        0, num_iters, body, jnp.ones_like(scores_s)
    )
    keep = keep.astype(bool) & (scores_s > 0)
    # compact to max_outputs slots, preserving score order
    priority = jnp.where(keep, scores_s, NEG_INF)
    top = jnp.argsort(-priority)[:max_outputs]
    keep_idx = order[top].astype(jnp.int32)
    keep_valid = keep[top]
    return keep_idx, keep_valid


def matrix_nms_masks(
    mask_ious: jnp.ndarray,
    labels: jnp.ndarray,
    scores: jnp.ndarray,
    kernel: str = "gaussian",
    sigma: float = 2.0,
) -> jnp.ndarray:
    """SOLOv2 matrix NMS: decay scores in one shot from the pairwise mask-IoU
    matrix (solov2_utils.py:142-200). Inputs sorted by descending score.

    mask_ious: [N, N] pairwise IoUs; labels: [N]; scores: [N].
    Returns decayed scores [N].
    """
    n = scores.shape[0]
    same_class = labels[:, None] == labels[None, :]
    upper = jnp.triu(jnp.ones((n, n), bool), k=1)
    decay_iou = jnp.where(same_class & upper, mask_ious, 0.0)
    # per-box max IoU vs any higher-scored same-class box
    compensate = jnp.max(decay_iou, axis=0)  # "iou of the suppressor itself"
    if kernel == "gaussian":
        decay = jnp.exp(-sigma * decay_iou**2)
        comp = jnp.exp(-sigma * compensate**2)
        decay_coef = jnp.min(decay / comp[:, None], axis=0)
    else:  # linear
        decay_coef = jnp.min(
            (1.0 - decay_iou) / (1.0 - compensate[:, None] + 1e-9), axis=0
        )
    return scores * decay_coef


def generalized_batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_threshold: float = 0.5,
    max_outputs: int = 100,
    score_threshold: float = 0.0,
    nms_type: str = "normal",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dispatch on MODEL.NMS_TYPE (reference meta_arch/utils.py:83-113).

    Returns (keep_idx, keep_valid, out_scores); out_scores differ from the
    input only for soft-NMS variants.
    """
    if nms_type == "normal":
        idx, valid = batched_nms(
            boxes, scores, classes, iou_threshold, max_outputs, score_threshold
        )
        out_scores = jnp.where(valid, scores[jnp.clip(idx, 0)], 0.0)
        return idx, valid, out_scores
    if nms_type in ("softnms-linear", "softnms-gaussian"):
        method = "linear" if nms_type.endswith("linear") else "gaussian"
        idx, valid, out_scores = soft_nms(
            _class_offset_boxes(boxes, classes),
            scores,
            iou_threshold,
            max_outputs,
            method=method,
            score_threshold=max(score_threshold, 1e-3),
        )
        return idx, valid, out_scores
    if nms_type == "cluster":
        idx, valid = cluster_nms(
            _class_offset_boxes(boxes, classes), scores, iou_threshold, max_outputs
        )
        out_scores = jnp.where(valid, scores[jnp.clip(idx, 0)], 0.0)
        return idx, valid, out_scores
    raise ValueError(f"Unknown nms_type: {nms_type}")


@partial(jax.jit, static_argnames=("iou_threshold", "max_outputs", "weight_thresh"))
def weighted_boxes_fusion(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.55,
    max_outputs: int = 100,
    weight_thresh: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted Boxes Fusion (Solovyev et al.) — single-model variant.

    Clusters boxes greedily by IoU with the running best box, then replaces
    each kept box by the score-weighted average of its cluster. Returns
    (fused_boxes [max_outputs,4], fused_scores, valid).
    """
    idx, valid = nms(boxes, scores, iou_threshold, max_outputs, weight_thresh)
    sel_boxes = boxes[jnp.clip(idx, 0)]
    # soft assignment of every candidate to its nearest kept box
    iou = pairwise_box_iou(sel_boxes, boxes)  # [K, N]
    member = (iou > iou_threshold) & (scores[None, :] > weight_thresh)
    w = jnp.where(member, scores[None, :], 0.0)  # [K, N]
    wsum = jnp.sum(w, axis=1, keepdims=True) + 1e-9
    fused = jnp.einsum("kn,nc->kc", w, boxes) / wsum
    fused_scores = jnp.sum(w * scores[None, :], axis=1) / wsum[:, 0]
    fused = jnp.where(valid[:, None], fused, 0.0)
    fused_scores = jnp.where(valid, fused_scores, 0.0)
    return fused, fused_scores, valid
