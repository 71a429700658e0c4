#!/usr/bin/env python
"""K-means anchor clustering with (1 - IoU) distance.

Parity with /root/reference/tools/compute_anchors.py (``Iou_Kmeans:50``):
cluster dataset box shapes into k anchors for the anchor-based YOLO heads.
Works on COCO-format json; prints anchors sorted by area.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def wh_iou(boxes: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """IoU of wh pairs [N, 2] vs [K, 2] as if co-centered."""
    inter = np.minimum(boxes[:, None, 0], anchors[None, :, 0]) * np.minimum(
        boxes[:, None, 1], anchors[None, :, 1]
    )
    union = (
        boxes[:, 0] * boxes[:, 1]
    )[:, None] + (anchors[:, 0] * anchors[:, 1])[None, :] - inter
    return inter / np.maximum(union, 1e-10)


def kmeans_iou(
    boxes_wh: np.ndarray, k: int = 9, iters: int = 300, seed: int = 0
):
    rng = np.random.default_rng(seed)
    anchors = boxes_wh[rng.choice(len(boxes_wh), k, replace=False)].copy()
    assign = np.zeros(len(boxes_wh), np.int64)
    for _ in range(iters):
        d = 1.0 - wh_iou(boxes_wh, anchors)
        new_assign = np.argmin(d, axis=1)
        if np.all(new_assign == assign):
            break
        assign = new_assign
        for j in range(k):
            members = boxes_wh[assign == j]
            if len(members):
                anchors[j] = np.median(members, axis=0)
    mean_iou = float(
        wh_iou(boxes_wh, anchors)[np.arange(len(boxes_wh)), assign].mean()
    )
    order = np.argsort(anchors[:, 0] * anchors[:, 1])
    return anchors[order], mean_iou


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", required=True, help="COCO annotation json")
    p.add_argument("-k", type=int, default=9)
    p.add_argument("--input-size", type=int, default=640)
    args = p.parse_args()

    with open(args.json) as f:
        coco = json.load(f)
    sizes = {im["id"]: (im["height"], im["width"]) for im in coco["images"]}
    whs = []
    for ann in coco["annotations"]:
        h0, w0 = sizes[ann["image_id"]]
        scale = args.input_size / max(h0, w0)
        w, h = ann["bbox"][2] * scale, ann["bbox"][3] * scale
        if w > 2 and h > 2:
            whs.append([w, h])
    anchors, miou = kmeans_iou(np.asarray(whs, np.float64), args.k)
    print(f"mean IoU: {miou:.4f}")
    print("anchors (w, h):")
    for w, h in anchors:
        print(f"  [{w:.0f}, {h:.0f}]")


if __name__ == "__main__":
    main()
