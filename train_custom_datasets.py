#!/usr/bin/env python
"""Training on custom COCO-format datasets.

Parity with /root/reference/train_custom_datasets.py:23-76 — registers the
reference's five custom datasets (facemask, tl, visdrone, wearmask, voc) by
conventional paths when present, plus any ``--register name json root``
triples, then reuses the train_det machinery.
"""

from __future__ import annotations

import os

from yolov7_d2_tpu.data.catalog import DatasetCatalog, register_coco_instances


def register_custom_datasets(extra=()):
    """Registers datasets whose files exist locally (same names as the
    reference: facemask, tl, visdrone, wearmask, voc)."""
    conventional = {
        "facemask": (
            "./datasets/facemask/annotations/instances_train2017.json",
            "./datasets/facemask/train2017",
        ),
        "tl": (
            "./datasets/tl/annotations/annotations_coco_tls_train.json",
            "./datasets/tl/JPEGImages",
        ),
        "visdrone": (
            "./datasets/visdrone/visdrone_coco/annotations/instances_VisDrone_train.json",
            "./datasets/visdrone/visdrone_coco/images",
        ),
        "wearmask": (
            "./datasets/wearmask/annotations/train.json",
            "./datasets/wearmask/images",
        ),
        "voc": (
            "./datasets/voc/annotations/train.json",
            "./datasets/voc/images",
        ),
    }
    for name, (js, root) in conventional.items():
        if os.path.exists(js) and name not in DatasetCatalog:
            register_coco_instances(name, {}, js, root)
    for name, js, root in extra:
        if name not in DatasetCatalog:
            register_coco_instances(name, {}, js, root)


if __name__ == "__main__":
    import argparse

    from yolov7_d2_tpu.utils.args import default_argument_parser

    parser = default_argument_parser()
    parser.add_argument(
        "--register", nargs=3, action="append", default=[],
        metavar=("NAME", "JSON", "IMAGE_ROOT"),
    )
    args = parser.parse_args()
    register_custom_datasets(tuple(tuple(r) for r in args.register))

    import train_det

    train_det.main(args)
