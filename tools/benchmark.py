#!/usr/bin/env python
"""FPS benchmark for any registered meta-architecture.

Parity with /root/reference/tools/benchmark.py (200 warm iterations of
DefaultPredictor, prints average latency): measures jitted end-to-end
inference (forward + decode + NMS where applicable) on the current device.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--with-postprocess", action="store_true")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.models.build import build_model

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    model = build_model(cfg)
    h, w = cfg.INPUT.INPUT_SIZE
    images = jnp.full((args.batch, h, w, 3), 114.0, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, train=False)

    if args.with_postprocess and cfg.MODEL.META_ARCHITECTURE == "YOLOX":
        from yolov7_d2_tpu.models.meta_arch.yolox import yolox_postprocess

        def fn(v, x):
            return yolox_postprocess(
                model.apply(v, x, train=False),
                conf_threshold=cfg.MODEL.YOLO.CONF_THRESHOLD,
                nms_threshold=cfg.MODEL.YOLO.NMS_THRESHOLD,
            ).scores
    elif args.with_postprocess and cfg.MODEL.META_ARCHITECTURE == "SparseInst":
        from yolov7_d2_tpu.models.meta_arch.sparseinst import (
            sparseinst_postprocess,
        )

        def fn(v, x):
            dets = sparseinst_postprocess(
                model.apply(v, x, train=False),
                cls_threshold=cfg.MODEL.SPARSE_INST.CLS_THRESHOLD,
                mask_threshold=cfg.MODEL.SPARSE_INST.MASK_THRESHOLD,
                max_detections=cfg.MODEL.SPARSE_INST.MAX_DETECTIONS,
            )
            return dets.scores
    else:
        def fn(v, x):
            out = model.apply(v, x, train=False)
            return out["outputs"] if isinstance(out, dict) and "outputs" in out \
                else jax.tree_util.tree_leaves(out)[0]

    fwd = jax.jit(fn)
    out = fwd(variables, images)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # sync

    for _ in range(args.warmup):
        out = fwd(variables, images)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(variables, images)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = time.perf_counter() - t0

    n = args.batch * args.iters
    print(
        f"{cfg.MODEL.META_ARCHITECTURE} @ {h}x{w} bs={args.batch}: "
        f"{n / dt:.1f} img/s  ({dt / args.iters * 1000:.2f} ms/batch)"
    )


if __name__ == "__main__":
    main()
