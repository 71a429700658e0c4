"""Checkpointing: save/restore TrainState, periodic + resume.

Parity with d2 ``DetectionCheckpointer.resume_or_load`` +
``PeriodicCheckpointer`` (reference train_det.py:67-74, SURVEY.md §5) on
orbax. Also hosts the deploy-time conv+BN fusion and optimizer stripping
(reference yolov7/utils/checkpoint.py:11-106 equivalents).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def resume_or_load(self, state_template: Any, resume: bool = True):
        """d2 semantics: if resume and a checkpoint exists, restore it and
        report the step; otherwise return the template untouched."""
        step = self.latest_step()
        if resume and step is not None:
            return self.restore(state_template, step), step
        return state_template, 0


def strip_optimizer(state):
    """Deploy-time stripping (reference strip_optimizer:95): keep only
    inference-relevant leaves (EMA params if present, else params + BN)."""
    params = state.ema_params if state.ema_params is not None else state.params
    return {"params": params, "batch_stats": state.batch_stats}


def fuse_conv_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-3):
    """Fold BN into conv weights (reference fuse_conv_and_bn:11).

    kernel: [kh, kw, cin, cout] (flax layout); BN vectors: [cout].
    Returns (fused_kernel, fused_bias).
    """
    std = np.sqrt(np.asarray(bn_var) + eps)
    scale = np.asarray(bn_scale) / std
    fused_kernel = np.asarray(kernel) * scale[None, None, None, :]
    fused_bias = np.asarray(bn_bias) - np.asarray(bn_mean) * scale
    return fused_kernel, fused_bias
