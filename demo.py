#!/usr/bin/env python
"""Single-image / directory / video inference + visualization.

Parity with /root/reference/demo.py: ``--config-file -i/--input -c/--confidence-threshold
--nms-threshold --output``; a DefaultPredictor-style wrapper (reference
demo.py:27-60) around the jitted model with letterbox preprocessing, drawing
results with OpenCV (alfred's vis replaced by a small local renderer).
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import cv2
import numpy as np


class DefaultPredictor:
    """Load config + (optionally ported) weights, letterbox, jit, predict."""

    def __init__(self, cfg, weights_path: str = ""):
        import jax
        import jax.numpy as jnp

        from yolov7_d2_tpu.models.build import build_model
        from yolov7_d2_tpu.models.meta_arch.yolox import yolox_postprocess

        self.cfg = cfg
        self.input_size = tuple(cfg.INPUT.INPUT_SIZE)
        self.model = build_model(cfg)
        images = jnp.zeros((1, *self.input_size, 3), jnp.float32)
        self.variables = self.model.init(
            jax.random.PRNGKey(0), images, train=False
        )
        weights_path = weights_path or cfg.MODEL.WEIGHTS
        if weights_path:
            if weights_path.endswith((".pth", ".pt", ".pkl")):
                from yolov7_d2_tpu.utils.weight_port import (
                    load_torch_checkpoint,
                    port_torch_state_dict,
                )

                sd = load_torch_checkpoint(weights_path)
                self.variables, report = port_torch_state_dict(
                    sd, self.variables
                )
                if report["unused"]:
                    print(f"warning: {len(report['unused'])} unmatched keys")
            else:
                from yolov7_d2_tpu.train.checkpoint import Checkpointer

                ckpt = Checkpointer(weights_path)
                state, _ = ckpt.resume_or_load(None, resume=False)

        def _predict(variables, images):
            out = self.model.apply(variables, images, train=False)
            return yolox_postprocess(
                out,
                conf_threshold=cfg.MODEL.YOLO.CONF_THRESHOLD,
                nms_threshold=cfg.MODEL.YOLO.NMS_THRESHOLD,
                max_detections=cfg.MODEL.YOLO.MAX_DETECTIONS,
                pre_nms_topk=cfg.MODEL.YOLO.NMS_PRE_TOPK,
            )

        self._predict = jax.jit(_predict)

    def __call__(self, bgr_image: np.ndarray):
        import jax

        from yolov7_d2_tpu.data.transforms.augment import letterbox

        img, _, scale = letterbox(
            bgr_image, np.zeros((0, 4), np.float32), self.input_size,
            int(self.cfg.MODEL.PADDED_VALUE),
        )
        dets = self._predict(
            self.variables, img[None].astype(np.float32)
        )
        dets = jax.device_get(dets)
        valid = dets.valid[0]
        return {
            "boxes": dets.boxes[0][valid] / scale,
            "scores": dets.scores[0][valid],
            "classes": dets.classes[0][valid],
        }


def vis_res_fast(img, boxes, scores, classes, class_names=None):
    """Draw boxes (the counterpart of reference demo.py:139)."""
    rng = np.random.default_rng(3)
    colors = rng.integers(60, 255, (80, 3))
    for box, score, cls in zip(boxes, scores, classes):
        x0, y0, x1, y1 = [int(v) for v in box]
        color = tuple(int(c) for c in colors[int(cls) % 80])
        cv2.rectangle(img, (x0, y0), (x1, y1), color, 2)
        label = (
            class_names[int(cls)] if class_names else str(int(cls))
        ) + f" {score:.2f}"
        cv2.putText(
            img, label, (x0, max(y0 - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX,
            0.5, color, 1,
        )
    return img


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("-i", "--input", nargs="+", required=True)
    parser.add_argument("--output", default="demo_out")
    parser.add_argument("-c", "--confidence-threshold", type=float, default=0.25)
    parser.add_argument("--nms-threshold", type=float, default=0.65)
    parser.add_argument("--weights", default="")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    from yolov7_d2_tpu.config import get_cfg

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.MODEL.YOLO.CONF_THRESHOLD = args.confidence_threshold
    cfg.MODEL.YOLO.NMS_THRESHOLD = args.nms_threshold
    cfg.freeze()

    predictor = DefaultPredictor(cfg, args.weights)
    os.makedirs(args.output, exist_ok=True)

    def run_video(source):
        """Video file / webcam loop (reference demo.py video path)."""
        cap = cv2.VideoCapture(0 if source == "webcam" else source)
        writer = None
        n = 0
        while cap.isOpened():
            ok, frame = cap.read()
            if not ok:
                break
            res = predictor(frame)
            vis = vis_res_fast(
                frame, res["boxes"], res["scores"], res["classes"]
            )
            if writer is None and source != "webcam":
                fourcc = cv2.VideoWriter_fourcc(*"mp4v")
                fps = cap.get(cv2.CAP_PROP_FPS) or 25
                writer = cv2.VideoWriter(
                    os.path.join(args.output, "out_" + os.path.basename(source)),
                    fourcc, fps, (vis.shape[1], vis.shape[0]),
                )
            if writer is not None:
                writer.write(vis)
            n += 1
        cap.release()
        if writer is not None:
            writer.release()
        print(f"{source}: processed {n} frames")

    paths = []
    for pattern in args.input:
        paths.extend(glob.glob(pattern) if "*" in pattern else [pattern])
    for path in paths:
        if path == "webcam" or path.endswith((".mp4", ".avi", ".mov", ".mkv")):
            run_video(path)
            continue
        img = cv2.imread(path)
        if img is None:
            print(f"skip unreadable {path}")
            continue
        t0 = time.time()
        res = predictor(img)
        dt = time.time() - t0
        print(f"{path}: {len(res['boxes'])} dets in {dt*1000:.1f} ms")
        vis = vis_res_fast(img, res["boxes"], res["scores"], res["classes"])
        cv2.imwrite(
            os.path.join(args.output, os.path.basename(path)), vis
        )


if __name__ == "__main__":
    main()
