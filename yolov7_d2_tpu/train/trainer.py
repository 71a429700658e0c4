"""The Trainer: hooks + the sharded training loop.

Parity with the reference's d2 ``DefaultTrainer`` composition
(/root/reference/train_det.py:21-50, train_transformer.py:108-155):
hook points (timer, LR tracking, periodic checkpoint, periodic eval,
writers), resume semantics, and the aug-disable / L1-enable schedule
(DISABLE_AT_ITER) — all without any torch.distributed machinery: the step
function is jitted over a Mesh with the batch sharded on the ``data`` axis,
so gradient sync is XLA's problem (ICI collectives), not ours.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from yolov7_d2_tpu.parallel.mesh import build_mesh, shard_batch_pytree
from yolov7_d2_tpu.train.checkpoint import Checkpointer
from yolov7_d2_tpu.train.train_state import TrainState
from yolov7_d2_tpu.utils.events import (
    CommonMetricPrinter,
    EventStorage,
    JSONWriter,
)

logger = logging.getLogger("yolov7_d2_tpu")


class HookBase:
    def before_train(self, trainer: "Trainer") -> None: ...
    def after_step(self, trainer: "Trainer") -> None: ...
    def after_train(self, trainer: "Trainer") -> None: ...


class IterationTimer(HookBase):
    def before_train(self, trainer):
        self._start = time.time()

    def after_step(self, trainer):
        trainer.storage.put_scalar(
            "time_per_iter", (time.time() - self._start)
        )
        self._start = time.time()


class PeriodicCheckpointer(HookBase):
    def __init__(self, checkpointer: Checkpointer, period: int):
        self.checkpointer = checkpointer
        self.period = period

    def after_step(self, trainer):
        it = trainer.storage.iter
        if self.period > 0 and it > 0 and it % self.period == 0:
            self.checkpointer.save(it, jax.device_get(trainer.state))

    def after_train(self, trainer):
        self.checkpointer.save(
            trainer.storage.iter, jax.device_get(trainer.state)
        )


class PeriodicWriter(HookBase):
    def __init__(self, writers: List, period: int = 20):
        self.writers = writers
        self.period = period

    def after_step(self, trainer):
        for w in self.writers:
            w.write(trainer.storage)


class EvalHook(HookBase):
    def __init__(self, period: int, eval_fn: Callable[["Trainer"], Dict]):
        self.period = period
        self.eval_fn = eval_fn

    def after_step(self, trainer):
        it = trainer.storage.iter
        if self.period > 0 and it > 0 and it % self.period == 0:
            results = self.eval_fn(trainer)
            for k, v in (results or {}).items():
                trainer.storage.put_scalar(f"eval/{k}", v)

    def after_train(self, trainer):
        results = self.eval_fn(trainer)
        for k, v in (results or {}).items():
            trainer.storage.put_scalar(f"eval/{k}", v)


class AugDisableHook(HookBase):
    """Turn off mosaic/mixup near end of training (the reference's
    DISABLE_AT_ITER flag broadcast, yolox.py:105-121 — here a plain
    deterministic host-side switch on the shared mapper object)."""

    def __init__(self, mapper, disable_at_iter: int):
        self.mapper = mapper
        self.disable_at = disable_at_iter

    def after_step(self, trainer):
        if (
            getattr(self.mapper, "enable_aug", None)
            and trainer.storage.iter >= self.disable_at
        ):
            self.mapper.enable_aug = False
            logger.info(
                f"iter {trainer.storage.iter}: strong augmentation disabled"
            )


class MultiScaleHook(HookBase):
    """Advance a MultiScaleMapperWrapper's step so the input-size schedule
    follows training (data/multiscale.py; the reference's multi-size
    broadcast, yolo.py:131-146, without the collective)."""

    def __init__(self, ms_wrapper):
        self.ms = ms_wrapper

    def after_step(self, trainer):
        self.ms.step = trainer.storage.iter


class Trainer:
    """Generic loop: jitted sharded train_step over a host data iterator."""

    DEFAULT_FIELDS = ("image", "gt_boxes", "gt_classes", "gt_valid")

    def __init__(
        self,
        train_step: Callable,
        state: TrainState,
        data_iter: Iterable[Dict[str, np.ndarray]],
        max_iter: int,
        mesh=None,
        hooks: Optional[List[HookBase]] = None,
        start_iter: int = 0,
        output_dir: str = "./output",
        batch_fields: Optional[Iterable[str]] = None,
        metrics_period: int = 20,
    ):
        self.mesh = mesh or build_mesh()
        self.jitted_step = jax.jit(train_step, donate_argnums=(0,))
        self.state = state
        self.data_iter = iter(data_iter)
        self.max_iter = max_iter
        self.hooks = hooks or []
        self.storage = EventStorage(start_iter)
        self.output_dir = output_dir
        self.batch_fields = tuple(batch_fields or self.DEFAULT_FIELDS)
        # fetching metrics forces a host<->device sync; doing it every step
        # would stall the pipeline, so sync only every `metrics_period` steps
        self.metrics_period = max(metrics_period, 1)

    @staticmethod
    def default_writers(output_dir: str, max_iter: int, period: int = 20):
        return [
            CommonMetricPrinter(max_iter, period),
            JSONWriter(f"{output_dir}/metrics.json", period),
        ]

    def train(self) -> TrainState:
        for h in self.hooks:
            h.before_train(self)
        while self.storage.iter < self.max_iter:
            batch = next(self.data_iter)
            batch = shard_batch_pytree(
                {k: v for k, v in batch.items() if k in self.batch_fields},
                self.mesh,
            )
            self.state, metrics = self.jitted_step(self.state, batch)
            self.storage.step()
            if (
                self.storage.iter % self.metrics_period == 0
                or self.storage.iter >= self.max_iter
            ):
                for k, v in metrics.items():
                    self.storage.put_scalar(k, jax.device_get(v))
            for h in self.hooks:
                h.after_step(self)
        for h in self.hooks:
            h.after_train(self)
        return self.state
