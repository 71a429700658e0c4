#!/usr/bin/env python
"""Inference from LazyConfig python configs.

Parity with /root/reference/demo_lazyconfig.py (LazyConfig.load +
instantiate + DefaultPredictor-style loop): instantiates ``model`` from a
python config file and runs images through the jitted forward + YOLOX
postprocess.
"""

from __future__ import annotations

import argparse
import glob

import cv2
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True, help="LazyConfig .py")
    p.add_argument("-i", "--input", nargs="+", required=True)
    p.add_argument("--input-size", type=int, default=640)
    p.add_argument("-c", "--confidence-threshold", type=float, default=0.25)
    p.add_argument("--output", default="demo_out")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from yolov7_d2_tpu.config.lazy import LazyConfig, instantiate
    from yolov7_d2_tpu.data.transforms.augment import letterbox
    from yolov7_d2_tpu.models.meta_arch.yolox import yolox_postprocess

    cfg = LazyConfig.load(args.config_file)
    model = instantiate(cfg["model"])
    size = (args.input_size, args.input_size)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)), train=False
    )

    @jax.jit
    def predict(variables, images):
        out = model.apply(variables, images, train=False)
        return yolox_postprocess(
            out, conf_threshold=args.confidence_threshold
        )

    import os

    os.makedirs(args.output, exist_ok=True)
    paths = []
    for pattern in args.input:
        paths.extend(glob.glob(pattern) if "*" in pattern else [pattern])
    from demo import vis_res_fast

    for path in paths:
        img = cv2.imread(path)
        if img is None:
            continue
        x, _, scale = letterbox(img, np.zeros((0, 4), np.float32), size)
        dets = jax.device_get(predict(variables, x[None].astype(np.float32)))
        valid = dets.valid[0]
        vis = vis_res_fast(
            img, dets.boxes[0][valid] / scale, dets.scores[0][valid],
            dets.classes[0][valid],
        )
        out_path = os.path.join(args.output, os.path.basename(path))
        cv2.imwrite(out_path, vis)
        print(f"{path}: {int(valid.sum())} dets -> {out_path}")


if __name__ == "__main__":
    main()
