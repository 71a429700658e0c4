#!/usr/bin/env python
"""Standalone COCO evaluation of a trained model.

Parity with /root/reference/tools/eval_coco.py (inference_on_dataset +
COCOEvaluator, with ad-hoc dataset registrations :39-62): runs the jitted
eval path over DATASETS.TEST and prints AP metrics.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def register_builtin_eval_sets():
    """The reference registers mini-coco / tl / visdrone here; we register
    any dataset passed as --json/--image-root under the given --name."""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="")
    p.add_argument("--json", default="", help="COCO annotation json")
    p.add_argument("--image-root", default="")
    p.add_argument("--weights", default="")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.data.coco import load_coco_json
    from yolov7_d2_tpu.data.loader import build_detection_test_loader
    from yolov7_d2_tpu.data.mappers import SimpleDatasetMapper
    from yolov7_d2_tpu.evaluation.coco_eval import COCOEvaluator
    from yolov7_d2_tpu.models.build import build_model
    from yolov7_d2_tpu.models.meta_arch.yolox import yolox_postprocess
    from yolov7_d2_tpu.utils.weight_port import (
        load_torch_checkpoint,
        port_torch_state_dict,
    )

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    records = load_coco_json(args.json, args.image_root)
    model = build_model(cfg)
    h, w = cfg.INPUT.INPUT_SIZE
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), train=False
    )
    if args.weights:
        sd = load_torch_checkpoint(args.weights)
        variables, report = port_torch_state_dict(sd, variables)
        print(
            f"ported {len(report['ported'])}, unmatched {len(report['unused'])}"
        )

    @jax.jit
    def predict(variables, images):
        out = model.apply(variables, images, train=False)
        return yolox_postprocess(
            out,
            conf_threshold=cfg.MODEL.YOLO.CONF_THRESHOLD,
            nms_threshold=cfg.MODEL.YOLO.NMS_THRESHOLD,
            max_detections=cfg.MODEL.YOLO.MAX_DETECTIONS,
            pre_nms_topk=cfg.MODEL.YOLO.NMS_PRE_TOPK,
        )

    kpts_mode = cfg.MODEL.META_ARCHITECTURE == "YOLOX_KPTS"
    if kpts_mode:
        from yolov7_d2_tpu.evaluation.coco_eval import COCOKeypointEvaluator
        from yolov7_d2_tpu.models.meta_arch.yolox_kpts import (
            yolox_kpts_postprocess,
        )

        @jax.jit
        def predict_kpts(variables, images):
            out = model.apply(variables, images, train=False)
            return yolox_kpts_postprocess(
                out,
                conf_threshold=cfg.MODEL.YOLO.CONF_THRESHOLD,
                nms_threshold=cfg.MODEL.YOLO.NMS_THRESHOLD,
                max_detections=cfg.MODEL.YOLO.MAX_DETECTIONS,
                pre_nms_topk=cfg.MODEL.YOLO.NMS_PRE_TOPK,
            )

    mapper = SimpleDatasetMapper(cfg, is_train=False)
    loader = build_detection_test_loader(cfg, records, mapper, args.batch)
    evaluator = COCOEvaluator(cfg.MODEL.YOLO.CLASSES)
    kpt_eval = COCOKeypointEvaluator(1) if kpts_mode else None
    for batch in loader:
        fn = predict_kpts if kpts_mode else predict
        dets = jax.device_get(fn(variables, batch["image"]))
        for i in range(len(batch["image"])):
            scale = float(batch["scale"][i])
            valid = dets.valid[i]
            evaluator.add_predictions(
                int(batch["image_id"][i]),
                dets.boxes[i][valid] / scale,
                dets.scores[i][valid],
                dets.classes[i][valid],
            )
            gv = batch["gt_valid"][i]
            evaluator.add_gt(
                int(batch["image_id"][i]),
                batch["gt_boxes"][i][gv] / scale,
                batch["gt_classes"][i][gv],
            )
            if kpts_mode and getattr(dets, "keypoints", None) is not None:
                kp = dets.keypoints[i][valid].copy()
                kp[..., :2] /= scale
                kpt_eval.add_pred_keypoints(
                    int(batch["image_id"][i]), kp, dets.scores[i][valid],
                )
                gb = batch["gt_boxes"][i][gv] / scale
                areas = (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
                gkp = np.asarray(batch["gt_keypoints"][i][gv], np.float64)
                gkp[..., :2] /= scale
                kpt_eval.add_gt_keypoints(
                    int(batch["image_id"][i]), gkp, areas=np.asarray(areas),
                    boxes=np.stack([gb[:, 0], gb[:, 1], gb[:, 2] - gb[:, 0],
                                    gb[:, 3] - gb[:, 1]], -1),
                )
    results = evaluator.evaluate()
    for k, v in results.items():
        print(f"{k}: {v:.4f}" if np.isfinite(v) else f"{k}: nan")
    if kpt_eval is not None:
        print("-- keypoints (OKS) --")
        for k, v in kpt_eval.evaluate().items():
            print(f"kpt_{k}: {v:.4f}" if np.isfinite(v) else f"kpt_{k}: nan")


if __name__ == "__main__":
    main()
