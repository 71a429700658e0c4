#!/usr/bin/env python
"""Dataset sanity checking / cleaning.

Parity with /root/reference/tools/cleandata.py: scan a COCO-format dataset
for unreadable images, degenerate/out-of-bounds boxes, empty annotations and
id mismatches; optionally write a cleaned json.
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", required=True)
    p.add_argument("--image-root", required=True)
    p.add_argument("--output", default="", help="write cleaned json here")
    p.add_argument("--check-images", action="store_true",
                   help="decode every image (slow)")
    args = p.parse_args()

    import cv2

    with open(args.json) as f:
        coco = json.load(f)

    img_by_id = {im["id"]: im for im in coco.get("images", [])}
    problems = {"missing_file": 0, "unreadable": 0, "bad_box": 0,
                "orphan_ann": 0, "size_mismatch": 0}
    keep_images, keep_anns = [], []

    bad_image_ids = set()
    for im in coco.get("images", []):
        path = os.path.join(args.image_root, im["file_name"])
        if not os.path.exists(path):
            problems["missing_file"] += 1
            bad_image_ids.add(im["id"])
            continue
        if args.check_images:
            decoded = cv2.imread(path)
            if decoded is None:
                problems["unreadable"] += 1
                bad_image_ids.add(im["id"])
                continue
            if decoded.shape[0] != im["height"] or decoded.shape[1] != im["width"]:
                problems["size_mismatch"] += 1
                im["height"], im["width"] = decoded.shape[:2]
        keep_images.append(im)

    for ann in coco.get("annotations", []):
        im = img_by_id.get(ann["image_id"])
        if im is None or ann["image_id"] in bad_image_ids:
            problems["orphan_ann"] += 1
            continue
        x, y, w, h = ann["bbox"]
        if w <= 1 or h <= 1 or x < -1 or y < -1 or x + w > im["width"] + 1 \
                or y + h > im["height"] + 1:
            problems["bad_box"] += 1
            continue
        keep_anns.append(ann)

    print(f"images: {len(coco.get('images', []))} -> {len(keep_images)}")
    print(f"annotations: {len(coco.get('annotations', []))} -> {len(keep_anns)}")
    for k, v in problems.items():
        if v:
            print(f"  {k}: {v}")

    if args.output:
        coco["images"] = keep_images
        coco["annotations"] = keep_anns
        with open(args.output, "w") as f:
            json.dump(coco, f)
        print(f"cleaned json -> {args.output}")


if __name__ == "__main__":
    main()
