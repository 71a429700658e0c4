"""Classification / mask losses.

Parity targets: ``FocalLoss`` / ``sigmoid_focal_loss``
(/root/reference/yolov7/modeling/loss/loss.py:7-127), dice losses
(loss/seg.py:18-60, loss/sparseinst_loss.py), BCE variants used by the YOLO
heads. All return **unreduced** per-element losses unless stated; reduction
is the caller's job (masked means with static shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def sigmoid_binary_cross_entropy(
    logits: jnp.ndarray, targets: jnp.ndarray
) -> jnp.ndarray:
    """Numerically-stable BCE-with-logits (torch F.binary_cross_entropy_with_logits)."""
    neg_abs = -jnp.abs(logits)
    return (
        jnp.clip(logits, min=0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(neg_abs))
    )


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """RetinaNet-style sigmoid focal loss, unreduced."""
    p = jax.nn.sigmoid(logits)
    ce = sigmoid_binary_cross_entropy(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def softmax_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """CE with integer labels, unreduced over leading dims."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(onehot * logp, axis=-1)


def weighted_softmax_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray,
) -> jnp.ndarray:
    """CE with per-class weights (DETR's eos_coef down-weighting)."""
    num_classes = logits.shape[-1]
    ce = softmax_cross_entropy(logits, labels, num_classes)
    return ce * class_weights[labels]


def dice_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    smooth: float = 1.0,
) -> jnp.ndarray:
    """Dice loss over the last axis (flattened masks): [..., P] -> [...].

    ``pred`` are probabilities in [0, 1]; ``valid`` optionally masks pixels.
    """
    if valid is not None:
        pred = pred * valid
        target = target * valid
    inter = jnp.sum(pred * target, axis=-1)
    denom = jnp.sum(pred * pred, axis=-1) + jnp.sum(target * target, axis=-1)
    return 1.0 - (2.0 * inter + smooth) / (denom + smooth)


def dice_score(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Soft dice coefficient over last axis (used in SparseInst match cost)."""
    inter = 2.0 * jnp.sum(pred * target, axis=-1)
    denom = jnp.sum(pred * pred, axis=-1) + jnp.sum(target * target, axis=-1)
    return inter / (denom + EPS)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target)


def smooth_l1_loss(
    pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0
) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def quality_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    beta: float = 2.0,
) -> jnp.ndarray:
    """Quality Focal Loss (GFL, Li et al. 2020), unreduced.

    Like sigmoid focal loss but the target is a *continuous* quality score
    in [0, 1] (e.g. the predicted box's IoU with its gt) instead of a
    binary label; the modulating factor is |target - p|^beta.
    """
    p = jax.nn.sigmoid(logits)
    ce = sigmoid_binary_cross_entropy(logits, targets)
    return ce * jnp.abs(targets - p) ** beta


def distribution_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
) -> jnp.ndarray:
    """Distribution Focal Loss (GFL): regression as a discrete distribution.

    ``logits`` [..., n_bins] predict a categorical distribution over integer
    bin positions; ``targets`` [...] are continuous positions in
    [0, n_bins-1]. The loss is CE against the two enclosing integer bins
    weighted by proximity, which drives the distribution's expectation to
    the target. Returns unreduced per-element losses.
    """
    n_bins = logits.shape[-1]
    t = jnp.clip(targets, 0.0, n_bins - 1 - 1e-6)
    left = jnp.floor(t).astype(jnp.int32)
    right = left + 1
    w_right = t - left
    w_left = 1.0 - w_right
    logp = jax.nn.log_softmax(logits, axis=-1)
    lp_left = jnp.take_along_axis(logp, left[..., None], axis=-1)[..., 0]
    lp_right = jnp.take_along_axis(
        logp, jnp.clip(right, 0, n_bins - 1)[..., None], axis=-1
    )[..., 0]
    return -(w_left * lp_left + w_right * lp_right)


def dfl_expectation(logits: jnp.ndarray) -> jnp.ndarray:
    """Decode a DFL distribution to its expected position."""
    n_bins = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    bins = jnp.arange(n_bins, dtype=probs.dtype)
    return jnp.sum(probs * bins, axis=-1)


def masked_mean(
    values: jnp.ndarray, mask: jnp.ndarray, min_count: float = 1.0
) -> jnp.ndarray:
    """Mean over mask=True elements; static-shape safe."""
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), min_count)
