"""Optimizer builder with parameter groups.

Parity with the reference optimizer layer
(/root/reference/yolov7/optimizer/build.py): ``sgd``/``adamw`` registry
(:235,:249), per-group weight decay exemptions for norm/bias params
(:24-203), backbone LR multiplier (SOLVER.BACKBONE_MULTIPLIER), and
full-model gradient clipping (:206-223). Implemented as optax transforms
with parameter-path masks (the pytree-native version of param groups).
"""

from __future__ import annotations

from typing import Callable

import optax

from yolov7_d2_tpu.core.registry import OPTIMIZER_REGISTRY


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def make_mask(params, predicate: Callable[[str], bool]):
    """Boolean mask pytree from a parameter-path predicate."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    vals = [predicate(_path_str(path)) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, vals)


def is_norm_or_bias(path: str) -> bool:
    """BN scale/bias and conv bias get no weight decay (reference :24-203)."""
    lowered = path.lower()
    return (
        "/bn/" in lowered
        or lowered.endswith("/bias")
        or lowered.endswith("/scale")
        or "batchnorm" in lowered
        or "layernorm" in lowered
        or "/ln/" in lowered
    )


def sgd_with_groups(lr_schedule, cfg):
    wd = cfg.SOLVER.WEIGHT_DECAY

    def tx(params):
        decay_mask = make_mask(params, lambda p: not is_norm_or_bias(p))
        chain = []
        # torch.optim.SGD couples decay INTO the momentum buffer
        # (grad += wd*param before momentum) — decay precedes trace.
        if wd:
            chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
        chain.append(
            optax.trace(decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV)
        )
        chain.append(optax.scale_by_schedule(lambda s: -lr_schedule(s)))
        return optax.chain(*chain)

    return tx


def adamw_with_groups(lr_schedule, cfg):
    wd = cfg.SOLVER.WEIGHT_DECAY
    mu_dtype = (
        "bfloat16" if bool(getattr(cfg.SOLVER, "ADAM_BF16_STATE", False))
        else None)

    def tx(params):
        decay_mask = make_mask(params, lambda p: not is_norm_or_bias(p))
        chain = [
            optax.scale_by_adam(mu_dtype=mu_dtype),
        ]
        if wd:
            chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
        chain.append(optax.scale_by_schedule(lambda s: -lr_schedule(s)))
        return optax.chain(*chain)

    return tx


OPTIMIZER_REGISTRY.register(sgd_with_groups, name="sgd")
OPTIMIZER_REGISTRY.register(adamw_with_groups, name="adamw")


def build_optimizer(cfg, params, lr_schedule=None):
    """Build the optax GradientTransformation for ``params``.

    Handles: optimizer selection (SOLVER.OPTIMIZER), weight-decay masking,
    backbone LR multiplier, and optional global-norm clipping.
    """
    from yolov7_d2_tpu.train.schedules import build_lr_schedule

    lr_schedule = lr_schedule or build_lr_schedule(cfg)
    name = cfg.SOLVER.OPTIMIZER.lower()
    base_tx = OPTIMIZER_REGISTRY.get(name)(lr_schedule, cfg)(params)

    transforms = []
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "value":
            transforms.append(
                optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
            )
        else:  # full_model global norm
            transforms.append(
                optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
            )

    transforms.append(base_tx)

    # Backbone LR multiplier must scale the UPDATE (a per-group lr, as the
    # reference does via param groups) — applied after the preconditioner and
    # lr step, since adam normalizes any gradient-side scaling to a no-op.
    mult = cfg.SOLVER.BACKBONE_MULTIPLIER
    if mult != 1.0:
        backbone_mask = make_mask(params, lambda p: p.startswith("backbone"))
        transforms.append(optax.masked(optax.scale(mult), backbone_mask))

    return optax.chain(*transforms)
