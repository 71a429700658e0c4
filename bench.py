"""Benchmark: YOLOX-s END-TO-END inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Reference-parity semantics: the reference benchmark times the full
``DefaultPredictor`` including decode + NMS
(/root/reference/tools/benchmark.py:158-170), so the jitted graph here is
backbone + neck + head + decode + confidence filter + class-aware NMS —
everything after host letterboxing. The reference publishes YOLOX-s at
39.3 FPS on an unspecified desktop GPU (readme.md:217, BASELINE.md); the
north-star target is 2000 img/s/chip at 640px on v5e. vs_baseline is
measured/39.3.

The forward-only number (round-1 metric) is printed to stderr for the
record.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 39.3  # reference readme.md:217 (YOLOX-s, unspecified GPU)


def main() -> None:
    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.models.build import build_model
    from yolov7_d2_tpu.models.meta_arch.yolox import yolox_postprocess

    cfg = get_cfg()
    cfg.MODEL.YOLO.DEPTH_MUL = 0.33
    cfg.MODEL.YOLO.WIDTH_MUL = 0.50
    cfg.INPUT.INPUT_SIZE = [640, 640]
    cfg.SOLVER.AMP.ENABLED = True  # bf16 compute

    # bs sweep on v5e (one chip, fwd-only): 32 -> 1160, 64 -> 2020,
    # 128 -> 2740, 256 -> 2150 img/s; 128 is the sweet spot.
    batch = 128
    model = build_model(cfg)
    images = jnp.full((batch, 640, 640, 3), 114.0, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, train=False)

    @jax.jit
    def forward(variables, images):
        return model.apply(variables, images, train=False)["outputs"]

    @jax.jit
    def e2e(variables, images):
        out = model.apply(variables, images, train=False)
        dets = yolox_postprocess(
            out,
            conf_threshold=cfg.MODEL.YOLO.CONF_THRESHOLD,
            nms_threshold=cfg.MODEL.YOLO.NMS_THRESHOLD,
            max_detections=cfg.MODEL.YOLO.MAX_DETECTIONS,
            pre_nms_topk=cfg.MODEL.YOLO.NMS_PRE_TOPK,
        )
        return dets.boxes, dets.scores

    def timed(fn, sync):
        # warmup / compile (scalar fetch: block_until_ready alone returns
        # early on the experimental axon platform)
        out = fn(variables, images)
        sync(out)
        iters = 15
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(variables, images)
        sync(out)  # forces the whole queued sequence to finish
        return batch * iters / (time.perf_counter() - t0)

    fwd_ips = timed(forward, lambda o: float(o[0, 0, 0]))
    e2e_ips = timed(e2e, lambda o: float(o[0][0, 0, 0]) + float(o[1][0, 0]))

    print(
        json.dumps(
            {"metric": "yolox_s_640_fwd_only_images_per_sec_per_chip",
             "value": round(fwd_ips, 2), "unit": "images/sec/chip"}
        ),
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "yolox_s_640_e2e_decode_nms_images_per_sec_per_chip",
                "value": round(e2e_ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(e2e_ips / BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
