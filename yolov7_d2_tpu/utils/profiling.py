"""Profiling / tracing utilities.

The reference has only ad-hoc ``time.time()`` timing (SURVEY.md §5). The
TPU-native equivalent is first-class: ``jax.profiler`` traces viewable in
TensorBoard/Perfetto, plus a trainer hook that captures a trace window
mid-run and per-step device timing.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

from yolov7_d2_tpu.train.trainer import HookBase

logger = logging.getLogger("yolov7_d2_tpu")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ProfilerHook(HookBase):
    """Capture a trace window [start_iter, start_iter + num_iters)."""

    def __init__(self, log_dir: str, start_iter: int = 10, num_iters: int = 5):
        self.log_dir = log_dir
        self.start = start_iter
        self.stop = start_iter + num_iters
        self._active = False

    def after_step(self, trainer):
        it = trainer.storage.iter
        if it == self.start and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            logger.info(f"profiler: trace started at iter {it}")
        elif it >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            logger.info(
                f"profiler: trace written to {self.log_dir} at iter {it}"
            )

    def after_train(self, trainer):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def timed(fn, *args, sync_result=True, **kwargs):
    """Time one call including device sync; returns (result, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    if sync_result:
        jax.block_until_ready(out)
    return out, time.perf_counter() - t0
