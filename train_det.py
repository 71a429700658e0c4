#!/usr/bin/env python
"""Detection training CLI.

Parity with /root/reference/train_det.py: ``--config-file --num-gpus
--eval-only --resume --opts KEY VALUE``; wires the YOLOX mosaic mapper +
COCO evaluation + periodic checkpointing. The d2 ``launch()`` process spawn
is replaced by jax.distributed + a device mesh: one process per host, XLA
collectives over ICI do the gradient sync.
"""

from __future__ import annotations

import logging
import os

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("yolov7_d2_tpu")


def build_eval_fn(cfg, eval_records, model):
    """Periodic COCO evaluation over the TEST dataset."""
    import jax
    import numpy as np

    from yolov7_d2_tpu.data.loader import build_detection_test_loader
    from yolov7_d2_tpu.data.mappers import SimpleDatasetMapper
    from yolov7_d2_tpu.engine import make_yolox_loss_adapter  # noqa: F401
    from yolov7_d2_tpu.evaluation.coco_eval import COCOEvaluator
    from yolov7_d2_tpu.models.meta_arch.yolox import yolox_postprocess

    from yolov7_d2_tpu.data.mappers import annotations_to_arrays

    mapper = SimpleDatasetMapper(cfg, is_train=False)
    # GT straight from the original annotations — round-tripping GT through
    # the letterboxed coordinates clips boxes at letterbox edges and skews AP
    gt_by_id = {
        int(r.get("image_id", i)): annotations_to_arrays(r)
        for i, r in enumerate(eval_records)
    }

    def eval_fn(trainer):
        evaluator = COCOEvaluator(cfg.MODEL.YOLO.CLASSES)
        loader = build_detection_test_loader(cfg, eval_records, mapper)
        state = trainer.state

        @jax.jit
        def predict(state, images):
            params = (
                state.ema_params if state.ema_params is not None else state.params
            )
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=False,
            )
            return yolox_postprocess(
                out,
                conf_threshold=cfg.MODEL.YOLO.CONF_THRESHOLD,
                nms_threshold=cfg.MODEL.YOLO.NMS_THRESHOLD,
                max_detections=cfg.MODEL.YOLO.MAX_DETECTIONS,
                pre_nms_topk=cfg.MODEL.YOLO.NMS_PRE_TOPK,
            )

        for batch in loader:
            dets = jax.device_get(predict(state, batch["image"]))
            for i in range(len(batch["image"])):
                scale = float(batch["scale"][i])
                valid = dets.valid[i]
                evaluator.add_predictions(
                    int(batch["image_id"][i]),
                    dets.boxes[i][valid] / scale,
                    dets.scores[i][valid],
                    dets.classes[i][valid],
                )
                img_id = int(batch["image_id"][i])
                gt_boxes, gt_classes = gt_by_id[img_id]
                evaluator.add_gt(img_id, gt_boxes, gt_classes)
        results = evaluator.evaluate()
        logger.info(f"COCO eval: {results}")
        return {k: v for k, v in results.items() if np.isfinite(v)}

    return eval_fn


def main(args) -> None:
    import jax

    from yolov7_d2_tpu.data.catalog import DatasetCatalog
    from yolov7_d2_tpu.data.loader import build_detection_train_loader
    from yolov7_d2_tpu.data.mappers import YOLOXDatasetMapper
    from yolov7_d2_tpu.engine import build_yolox_system
    from yolov7_d2_tpu.parallel.mesh import build_mesh
    from yolov7_d2_tpu.train.checkpoint import Checkpointer
    from yolov7_d2_tpu.train.schedules import auto_scale_config
    from yolov7_d2_tpu.train.trainer import (
        AugDisableHook,
        EvalHook,
        IterationTimer,
        PeriodicCheckpointer,
        PeriodicWriter,
        Trainer,
    )
    from yolov7_d2_tpu.utils.args import setup_cfg

    if args.num_machines > 1:
        jax.distributed.initialize()

    cfg = setup_cfg(args)
    cfg.defrost()
    auto_scale_config(cfg, jax.device_count())
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
        f.write(cfg.dump())

    records = []
    for name in cfg.DATASETS.TRAIN:
        records.extend(DatasetCatalog.get(name))
    eval_records = []
    for name in cfg.DATASETS.TEST:
        eval_records.extend(DatasetCatalog.get(name))

    model, state, train_step, _ = build_yolox_system(
        cfg, batch_size=cfg.SOLVER.IMS_PER_BATCH
    )
    checkpointer = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "ckpt"))
    state, start_iter = checkpointer.resume_or_load(state, resume=args.resume)

    device_aug = bool(cfg.INPUT.MOSAIC_AND_MIXUP.DEVICE)
    packed_dir = str(cfg.DATALOADER.PACKED_CACHE_DIR)
    if packed_dir:
        # offline geometry (packed shards, uint8) + device photometric aug
        # fused in the jitted step (data/device_aug.py:DevicePhotometric)
        import numpy as np

        from yolov7_d2_tpu.data.device_aug import make_packed_photo_step
        from yolov7_d2_tpu.data.packed_cache import PackedShardLoader

        train_step = make_packed_photo_step(cfg, train_step)
        # SEED=-1 means "unseeded" (d2 convention); numpy needs >=0
        loader = PackedShardLoader(
            packed_dir, cfg.SOLVER.IMS_PER_BATCH, image_dtype=np.uint8,
            seed=max(int(cfg.SEED), 0) + jax.process_index(),
        )
        plain_dir = str(cfg.DATALOADER.PACKED_CACHE_PLAIN_DIR)
        disable_at = int(cfg.INPUT.MOSAIC_AND_MIXUP.DISABLE_AT_ITER)
        if plain_dir:
            # reference DISABLE_AT_ITER: plain resized images for the
            # final phase (dataset_mapper.py:400,490) — switch shard sets
            from yolov7_d2_tpu.data.packed_cache import (
                SwitchingPackedLoader,
            )

            plain_loader = PackedShardLoader(
                plain_dir, cfg.SOLVER.IMS_PER_BATCH, image_dtype=np.uint8,
                seed=max(int(cfg.SEED), 0) + jax.process_index() + 7919,
            )
            loader = SwitchingPackedLoader(
                loader, plain_loader,
                switch_after=max(disable_at - start_iter, 0),
            )
        elif disable_at < cfg.SOLVER.MAX_ITER:
            logger.warning(
                "PACKED_CACHE_DIR without PACKED_CACHE_PLAIN_DIR: after "
                "DISABLE_AT_ITER=%d only the device photometrics stop; "
                "the mosaic geometry baked into the shards keeps feeding "
                "(the reference switches to plain resized images). Write "
                "a plain shard set (data.packed_cache.write_plain_shards) "
                "and set DATALOADER.PACKED_CACHE_PLAIN_DIR for reference "
                "recipe fidelity.", disable_at,
            )
        mapper = None
    elif device_aug:
        # host does decode+resize only; mosaic/mixup/HSV run fused in the
        # jitted train step (data/device_aug.py)
        from yolov7_d2_tpu.data.device_aug import make_device_aug_step
        from yolov7_d2_tpu.data.mappers import TileDatasetMapper

        mapper = TileDatasetMapper(cfg, is_train=True, seed=jax.process_index())
        train_step = make_device_aug_step(cfg, train_step)
    else:
        mapper = YOLOXDatasetMapper(
            cfg, is_train=True, seed=jax.process_index()
        )
    if not packed_dir:
        loader = build_detection_train_loader(cfg, records, mapper)

    mesh = build_mesh(cfg.TPU.MESH_SHAPE, cfg.TPU.MESH_AXES)
    hooks = [
        IterationTimer(),
    ]
    # on-device paths (tile aug / packed photometric) disable aug via a
    # lax.cond on the step counter instead of a host hook
    if not device_aug and not packed_dir:
        hooks.append(
            AugDisableHook(mapper, cfg.INPUT.MOSAIC_AND_MIXUP.DISABLE_AT_ITER)
        )
    hooks += [
        PeriodicCheckpointer(checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD),
        PeriodicWriter(
            Trainer.default_writers(cfg.OUTPUT_DIR, cfg.SOLVER.MAX_ITER)
        ),
    ]
    if cfg.TEST.EVAL_PERIOD > 0 or args.eval_only:
        hooks.append(
            EvalHook(cfg.TEST.EVAL_PERIOD, build_eval_fn(cfg, eval_records, model))
        )

    trainer = Trainer(
        train_step, state, loader, cfg.SOLVER.MAX_ITER,
        mesh=mesh, hooks=hooks, start_iter=start_iter,
        output_dir=cfg.OUTPUT_DIR,
        batch_fields=(
            ("image", "gt_boxes", "gt_classes", "gt_valid", "orig_hw")
            if device_aug else None
        ),
    )
    if args.eval_only:
        results = build_eval_fn(cfg, eval_records, model)(trainer)
        print(results)
        return
    trainer.train()


if __name__ == "__main__":
    from yolov7_d2_tpu.utils.args import default_argument_parser

    main(default_argument_parser().parse_args())
