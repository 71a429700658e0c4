#!/usr/bin/env python
"""Training from LazyConfig python files.

Parity with /root/reference/tools/lazyconfig_train_net.py:43-130: the
DRIVER owns the train loop (``do_train``) — it instantiates ``cfg.model``,
builds the optimizer and LR schedule from ``cfg.optimizer``/``cfg.train``,
wires hooks (timer, periodic checkpoint, writers) and runs the Trainer.
A config may still provide its own ``run(model, train_cfg, resume=...)``
callable to fully override the loop, but shipped lazy configs train without
one.

``cfg.dataloader`` may be a LazyCall producing an iterable of batches; when
absent a synthetic dummy-batch iterator keeps the loop runnable for smoke
training (there is no COCO data requirement baked into the driver).
"""

from __future__ import annotations

import argparse
import logging
import os

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("lazyconfig_train_net")


def _build_loss_fn(model):
    """Loss wiring by model family (the CfgNode path does this in
    engine.build_system; lazy configs carry the model object instead)."""
    from yolov7_d2_tpu.models.meta_arch.yolox import YOLOX, yolox_loss_fn

    if isinstance(model, YOLOX):
        def loss_fn(out, batch, use_l1_flag):
            losses = yolox_loss_fn(out, batch, model.num_classes, use_l1=False)
            losses["total_loss"] = (
                losses["loss_iou"] + losses["loss_obj"] + losses["loss_cls"]
            )
            return losses

        return loss_fn
    raise SystemExit(
        f"No builtin loss wiring for {type(model).__name__}; define "
        "`loss_fn` or `run` in the LazyConfig file."
    )


def _synthetic_loader(batch_size, input_size, max_boxes=8):
    import numpy as np

    h, w = input_size
    while True:
        yield {
            "image": np.full((batch_size, h, w, 3), 114.0, np.float32),
            "gt_boxes": np.tile(
                np.asarray([[8.0, 8.0, 48.0, 48.0]], np.float32),
                (batch_size, max_boxes, 1),
            ),
            "gt_classes": np.zeros((batch_size, max_boxes), np.int32),
            "gt_valid": np.concatenate(
                [
                    np.ones((batch_size, 1), bool),
                    np.zeros((batch_size, max_boxes - 1), bool),
                ],
                axis=1,
            ),
        }


def do_train(cfg, resume: bool = False):
    import jax
    import jax.numpy as jnp
    import optax

    from yolov7_d2_tpu.config.lazy import instantiate
    from yolov7_d2_tpu.train.checkpoint import Checkpointer
    from yolov7_d2_tpu.train.train_state import TrainState, make_train_step
    from yolov7_d2_tpu.train.trainer import (
        IterationTimer,
        PeriodicCheckpointer,
        PeriodicWriter,
        Trainer,
    )

    model = instantiate(cfg["model"])
    tcfg = dict(cfg.get("train", {}))
    ocfg = dict(cfg.get("optimizer", {}))

    max_iter = int(tcfg.get("max_iter", 90000))
    out_dir = tcfg.get("output_dir", "./output/lazy")
    input_size = tuple(tcfg.get("input_size", (640, 640)))
    batch_size = int(tcfg.get("ims_per_batch", 8))
    seed = int(tcfg.get("seed", 0))
    os.makedirs(out_dir, exist_ok=True)

    h, w = input_size
    rng = jax.random.PRNGKey(seed)
    variables = model.init(
        rng, jnp.zeros((batch_size, h, w, 3), jnp.float32), train=False
    )

    base_lr = float(ocfg.get("base_lr", 0.01))
    warmup = min(int(tcfg.get("warmup_iters", 1000)), max(max_iter // 2, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, base_lr, warmup, max(max_iter, warmup + 1)
    )
    if ocfg.get("name", "sgd") == "adamw":
        tx = optax.adamw(
            schedule, weight_decay=float(ocfg.get("weight_decay", 1e-4))
        )
    else:
        tx = optax.chain(
            optax.add_decayed_weights(float(ocfg.get("weight_decay", 0.0))),
            optax.sgd(schedule, momentum=float(ocfg.get("momentum", 0.9))),
        )

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    ckpt = Checkpointer(os.path.join(out_dir, "ckpt"))
    state, start_iter = ckpt.resume_or_load(state, resume=resume)

    loss_fn = (
        instantiate(cfg["loss_fn"]) if "loss_fn" in cfg else _build_loss_fn(model)
    )
    train_step = make_train_step(model, loss_fn, tx, seed=seed)

    if "dataloader" in cfg:
        loader = instantiate(cfg["dataloader"])
    else:
        logger.warning("no cfg.dataloader — using the synthetic smoke loader")
        loader = _synthetic_loader(batch_size, input_size)

    ckpt_cfg = dict(tcfg.get("checkpointer", {}))
    # mesh whose data axis divides the batch (smoke runs use tiny batches)
    import math as _math

    from yolov7_d2_tpu.parallel.mesh import build_mesh

    n_data = _math.gcd(batch_size, jax.device_count())
    mesh = build_mesh((n_data, 1), ("data", "model"), jax.devices()[:n_data])
    trainer = Trainer(
        train_step,
        state,
        loader,
        max_iter,
        mesh=mesh,
        hooks=[
            IterationTimer(),
            PeriodicCheckpointer(ckpt, int(ckpt_cfg.get("period", 5000))),
            PeriodicWriter(
                Trainer.default_writers(
                    out_dir, max_iter, int(tcfg.get("log_period", 20))
                )
            ),
        ],
        start_iter=start_iter,
        output_dir=out_dir,
    )
    trainer.train()
    return trainer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    from yolov7_d2_tpu.config.lazy import LazyConfig

    cfg = LazyConfig.load(args.config_file)
    if args.opts:
        cfg = LazyConfig.apply_overrides(cfg, args.opts)

    run = cfg.get("run")
    if callable(run):
        from yolov7_d2_tpu.config.lazy import instantiate

        model = instantiate(cfg["model"])
        run(model, cfg.get("train", {}), resume=args.resume)
    else:
        do_train(cfg, resume=args.resume)


if __name__ == "__main__":
    main()
