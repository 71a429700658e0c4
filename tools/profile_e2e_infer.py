"""E2e inference tail profiling on the real chip (YOLOX-s 640 bs128).

Times forward-only vs e2e (decode + filter + top-k + class-aware NMS,
the bench.py graph) and captures a profiler trace of the e2e step so the
~8 ms/batch tail (fwd 3137 -> e2e ~2600 img/s @bs128) can be attributed
per kernel with tools/analyze_trace.py.
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.models.build import build_model
from yolov7_d2_tpu.models.meta_arch.yolox import yolox_postprocess

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
TRACE = len(sys.argv) > 2 and sys.argv[2] == "trace"

cfg = get_cfg()
cfg.MODEL.YOLO.DEPTH_MUL = 0.33
cfg.MODEL.YOLO.WIDTH_MUL = 0.50
cfg.INPUT.INPUT_SIZE = [640, 640]
cfg.SOLVER.AMP.ENABLED = True

model = build_model(cfg)
images = jnp.full((BS, 640, 640, 3), 114.0, jnp.float32)
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


def timed(fn, sync, iters=15):
    out = fn(variables, images)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, images)
    sync(out)
    return (time.perf_counter() - t0) / iters


fwd = timed(forward, lambda o: float(o[0, 0, 0]))
full = timed(e2e, lambda o: float(o[0][0, 0, 0]) + float(o[1][0, 0]))
print(f"bs={BS}: fwd {fwd*1000:.2f} ms ({BS/fwd:.0f} img/s), "
      f"e2e {full*1000:.2f} ms ({BS/full:.0f} img/s), "
      f"tail {(full-fwd)*1000:.2f} ms")

if TRACE:
    with jax.profiler.trace("/root/repo/docs/traces/e2e_infer"):
        o = None
        for _ in range(3):
            o = e2e(variables, images)
        float(o[0][0, 0, 0])
    print("trace written to docs/traces/e2e_infer")
