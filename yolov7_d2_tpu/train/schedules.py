"""LR schedules: WarmupMultiStepLR / WarmupCosineLR.

Parity with the d2 schedulers the reference selects by YAML
(``SOLVER.LR_SCHEDULER_NAME``, e.g. /root/reference/configs/coco/yolox_s.yaml:73)
plus the extra keys from yolov7/config.py:46-54. Implemented as pure
step -> lr functions compatible with optax inject_hyperparams.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def _warmup_factor(step, warmup_iters: int, warmup_factor: float, method: str):
    if warmup_iters <= 0:
        return jnp.ones_like(jnp.asarray(step, jnp.float32))
    s = jnp.asarray(step, jnp.float32)
    if method == "constant":
        wf = jnp.full_like(s, warmup_factor)
    else:  # linear
        alpha = s / warmup_iters
        wf = warmup_factor * (1.0 - alpha) + alpha
    return jnp.where(s >= warmup_iters, 1.0, wf)


def warmup_multistep_lr(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_iters: int = 1000,
    warmup_factor: float = 0.001,
    warmup_method: str = "linear",
) -> Callable:
    milestones = jnp.asarray(list(steps), jnp.int32)

    def schedule(step):
        decays = jnp.sum((jnp.asarray(step) >= milestones).astype(jnp.int32))
        lr = base_lr * (gamma ** decays.astype(jnp.float32))
        return lr * _warmup_factor(step, warmup_iters, warmup_factor, warmup_method)

    return schedule


def warmup_cosine_lr(
    base_lr: float,
    max_iters: int,
    warmup_iters: int = 1000,
    warmup_factor: float = 0.001,
    warmup_method: str = "linear",
    min_lr_ratio: float = 0.0,
) -> Callable:
    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        progress = jnp.clip(s / max(max_iters, 1), 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        lr = base_lr * (min_lr_ratio + (1.0 - min_lr_ratio) * cos)
        return lr * _warmup_factor(step, warmup_iters, warmup_factor, warmup_method)

    return schedule


def build_lr_schedule(cfg) -> Callable:
    name = cfg.SOLVER.LR_SCHEDULER_NAME
    if name == "WarmupMultiStepLR":
        return warmup_multistep_lr(
            cfg.SOLVER.BASE_LR,
            cfg.SOLVER.STEPS,
            cfg.SOLVER.GAMMA,
            cfg.SOLVER.WARMUP_ITERS,
            cfg.SOLVER.WARMUP_FACTOR,
            cfg.SOLVER.WARMUP_METHOD,
        )
    if name == "WarmupCosineLR":
        return warmup_cosine_lr(
            cfg.SOLVER.BASE_LR,
            cfg.SOLVER.MAX_ITER,
            cfg.SOLVER.WARMUP_ITERS,
            cfg.SOLVER.WARMUP_FACTOR,
            cfg.SOLVER.WARMUP_METHOD,
        )
    raise ValueError(f"Unknown LR scheduler: {name}")


def auto_scale_config(cfg, world_size: int):
    """d2's REFERENCE_WORLD_SIZE auto-scaling (reference
    utils/get_default_cfg.py:14-23): linearly scale LR and shrink iteration
    counts when the actual world size differs from the reference one."""
    ref = cfg.SOLVER.REFERENCE_WORLD_SIZE
    if ref in (0, world_size):
        return cfg
    scale = world_size / ref
    frozen = cfg.is_frozen()
    if frozen:
        cfg.defrost()
    cfg.SOLVER.BASE_LR = cfg.SOLVER.BASE_LR * scale
    cfg.SOLVER.MAX_ITER = int(round(cfg.SOLVER.MAX_ITER / scale))
    cfg.SOLVER.STEPS = [int(round(s / scale)) for s in cfg.SOLVER.STEPS]
    cfg.SOLVER.WARMUP_ITERS = int(round(cfg.SOLVER.WARMUP_ITERS / scale))
    cfg.SOLVER.IMS_PER_BATCH = int(round(cfg.SOLVER.IMS_PER_BATCH * scale))
    cfg.SOLVER.REFERENCE_WORLD_SIZE = world_size
    if frozen:
        cfg.freeze()
    return cfg
