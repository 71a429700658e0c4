#!/usr/bin/env python
"""DETR-family training CLI.

Parity with /root/reference/train_transformer.py: custom optimizer with
backbone LR multiplier (build_optimizer_mapper :106), DETR mapper selection,
and the same hook stack. Trains any of Detr / AnchorDetr / SMCADetr /
DABDetr / DetrD2go via MODEL.META_ARCHITECTURE.
"""

from __future__ import annotations

import logging
import os

logging.basicConfig(level=logging.INFO)


def main(args) -> None:
    import jax
    import jax.numpy as jnp

    from yolov7_d2_tpu.data.catalog import DatasetCatalog
    from yolov7_d2_tpu.data.loader import build_detection_train_loader
    from yolov7_d2_tpu.data.mappers import (
        DetrDatasetMapper,
        SimpleDatasetMapper,
    )
    from yolov7_d2_tpu.models.build import build_model
    from yolov7_d2_tpu.models.meta_arch.detr import detr_losses
    from yolov7_d2_tpu.parallel.mesh import build_mesh
    from yolov7_d2_tpu.train.checkpoint import Checkpointer
    from yolov7_d2_tpu.train.optimizer import build_optimizer
    from yolov7_d2_tpu.train.train_state import TrainState, make_train_step
    from yolov7_d2_tpu.train.trainer import (
        IterationTimer,
        PeriodicCheckpointer,
        PeriodicWriter,
        Trainer,
    )
    from yolov7_d2_tpu.utils.args import setup_cfg

    cfg = setup_cfg(args)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    records = []
    for name in cfg.DATASETS.TRAIN:
        records.extend(DatasetCatalog.get(name))

    model = build_model(cfg)
    h, w = cfg.INPUT.INPUT_SIZE
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, h, w, 3)), train=False
    )
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )

    num_classes = cfg.MODEL.DETR.NUM_CLASSES
    use_focal = (
        cfg.MODEL.DETR.USE_FOCAL_LOSS
        or cfg.MODEL.META_ARCHITECTURE in ("AnchorDetr",)
    )

    def loss_fn(out, batch, use_l1_flag):
        return detr_losses(
            out, batch, num_classes, (h, w),
            deep_supervision=cfg.MODEL.DETR.DEEP_SUPERVISION,
            eos_coef=cfg.MODEL.DETR.NO_OBJECT_WEIGHT,
            use_focal=use_focal,
        )

    train_step = make_train_step(model, loss_fn, tx)
    # DETR-family archs use the DETR mapper with its 50% crop branch
    # (ref train_transformer.py:50 selects DetrDatasetMapper by arch name)
    if "detr" in cfg.MODEL.META_ARCHITECTURE.lower():
        mapper = DetrDatasetMapper(cfg, is_train=True)
    else:
        mapper = SimpleDatasetMapper(cfg, is_train=True)
    loader = build_detection_train_loader(cfg, records, mapper)
    ckpt = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "ckpt"))
    state, start_iter = ckpt.resume_or_load(state, resume=args.resume)

    trainer = Trainer(
        train_step, state, loader, cfg.SOLVER.MAX_ITER,
        mesh=build_mesh(cfg.TPU.MESH_SHAPE, cfg.TPU.MESH_AXES),
        hooks=[
            IterationTimer(),
            PeriodicCheckpointer(ckpt, cfg.SOLVER.CHECKPOINT_PERIOD),
            PeriodicWriter(
                Trainer.default_writers(cfg.OUTPUT_DIR, cfg.SOLVER.MAX_ITER)
            ),
        ],
        start_iter=start_iter,
        output_dir=cfg.OUTPUT_DIR,
    )
    trainer.train()


if __name__ == "__main__":
    from yolov7_d2_tpu.utils.args import default_argument_parser

    main(default_argument_parser().parse_args())
