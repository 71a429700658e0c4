"""Train state + the jitted train/eval steps.

The counterpart of the reference's ``Trainer(DefaultTrainer)`` run_step hot
loop (/root/reference/train_det.py:21, d2 SimpleTrainer.run_step): one pure
function ``train_step(state, batch) -> (state, metrics)`` that XLA compiles
once — forward, SimOTA, losses, backward, optimizer update, EMA, BN stats —
entirely on device. DDP's NCCL allreduce becomes sharded-batch pjit: gradients
are averaged by XLA collectives over the mesh's ``data`` axis automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    def replace(self, **kw) -> "TrainState":
        return dataclasses.replace(self, **kw)


def create_train_state(
    model,
    cfg,
    rng: jax.Array,
    sample_batch: Dict[str, jnp.ndarray],
    tx: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    variables = model.init(rng, sample_batch["image"], train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if tx is None:
        from yolov7_d2_tpu.train.optimizer import build_optimizer

        tx = build_optimizer(cfg, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=(
            jax.tree.map(jnp.copy, params) if cfg.SOLVER.EMA.ENABLED else None
        ),
    )


def make_train_step(
    model,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.0,
    use_l1_after: Optional[int] = None,
    remat: bool = False,
    seed: int = 0,
) -> Callable:
    """Build the jittable train step.

    ``loss_fn(head_out, batch, use_l1) -> dict with 'total_loss'``; a
    loss_fn declaring an ``rng`` keyword additionally receives a per-step
    key (stochastic losses, e.g. Mask R-CNN's d2-style ROI subsampling).
    ``use_l1_after`` reproduces the reference's L1-enable broadcast
    (yolox.py:105-121) as a deterministic function of state.step.
    ``remat`` (cfg TPU.REMAT) checkpoints the forward — activations are
    recomputed in the backward pass, trading ~1 extra forward for peak-HBM
    headroom (bigger batches / inputs).
    """
    import inspect

    loss_takes_rng = "rng" in inspect.signature(loss_fn).parameters

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        use_l1 = (
            state.step >= use_l1_after if use_l1_after is not None else False
        )

        # per-step rngs for stochastic layers: base key from the configured
        # seed, folded with step, split into independent streams
        step_rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
        dropout_rng, droppath_rng, loss_rng = jax.random.split(step_rng, 3)

        def forward(params, images):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng, "droppath": droppath_rng},
            )

        if remat:
            forward = jax.checkpoint(forward)

        def compute_loss(params):
            out, mutated = forward(params, batch["image"])
            if loss_takes_rng:
                losses = loss_fn(out, batch, use_l1, rng=loss_rng)
            else:
                losses = loss_fn(out, batch, use_l1)
            return losses["total_loss"], (losses, mutated["batch_stats"])

        grads, (losses, new_stats) = jax.grad(compute_loss, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        if state.ema_params is not None and ema_decay > 0:
            new_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                state.ema_params,
                new_params,
            )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(model, postprocess_fn: Callable) -> Callable:
    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        params = state.ema_params if state.ema_params is not None else state.params
        out = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"],
            train=False,
        )
        return postprocess_fn(out)

    return eval_step
