"""Fixed-shape detection containers.

The reference passes detectron2 ``Instances`` (dynamic length) between model
and evaluator. On TPU every shape must be static under jit, so the native
equivalent is a **masked struct-of-arrays pytree**: every field has a leading
``capacity`` dimension and ``valid`` marks live rows. This is registered as a
pytree so it flows through jit / pjit / grad unchanged.

Contract parity: meta-arch eval returns ``Detections`` per image (the
counterpart of ``[{"instances": Instances}]``); masks/keypoints are optional
fields (``BitMasks`` / keypoint tensors in d2).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Detections:
    """Static-capacity detection set for one image (or a batch of images).

    boxes:   [..., K, 4] xyxy in the *network input* coordinate frame
    scores:  [..., K]
    classes: [..., K] int32
    valid:   [..., K] bool — rows beyond the true count are garbage
    masks:   optional [..., K, Hm, Wm] float mask logits or probabilities
    keypoints: optional [..., K, P, 3] (x, y, score)
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray
    masks: Optional[jnp.ndarray] = None
    keypoints: Optional[jnp.ndarray] = None

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def replace(self, **kw) -> "Detections":
        return dataclasses.replace(self, **kw)

    @staticmethod
    def empty(
        capacity: int,
        num_keypoints: int = 0,
        mask_shape: Optional[Tuple[int, int]] = None,
    ) -> "Detections":
        return Detections(
            boxes=jnp.zeros((capacity, 4), jnp.float32),
            scores=jnp.zeros((capacity,), jnp.float32),
            classes=jnp.zeros((capacity,), jnp.int32),
            valid=jnp.zeros((capacity,), bool),
            masks=(
                jnp.zeros((capacity, *mask_shape), jnp.float32)
                if mask_shape
                else None
            ),
            keypoints=(
                jnp.zeros((capacity, num_keypoints, 3), jnp.float32)
                if num_keypoints
                else None
            ),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GtInstances:
    """Dense ground-truth labels for a batch.

    The reference densifies GT to ``[bs, max_boxes, 5]`` (class, cx, cy, w, h)
    before the head (yolox.py:144-157). We keep fields separate and add a
    validity mask; boxes are xyxy in input coordinates.

    boxes:   [B, G, 4] xyxy
    classes: [B, G] int32
    valid:   [B, G] bool
    masks:   optional [B, G, H, W] binary masks (instance segmentation)
    keypoints: optional [B, G, P, 3] (x, y, visibility)
    """

    boxes: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray
    masks: Optional[jnp.ndarray] = None
    keypoints: Optional[jnp.ndarray] = None

    @property
    def max_boxes(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def replace(self, **kw) -> "GtInstances":
        return dataclasses.replace(self, **kw)
