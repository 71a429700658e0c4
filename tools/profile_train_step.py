"""Train-step timing + profiler trace on the real chip (YOLOX-s 640 bs128)."""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.engine import build_system, dummy_batch

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
TRACE = len(sys.argv) > 2 and sys.argv[2] == "trace"

cfg = get_cfg()
cfg.MODEL.YOLO.DEPTH_MUL = 0.33
cfg.MODEL.YOLO.WIDTH_MUL = 0.50
cfg.INPUT.INPUT_SIZE = [640, 640]
cfg.SOLVER.AMP.ENABLED = True
if len(sys.argv) > 2 and sys.argv[2].isdigit():
    cfg.MODEL.YOLO.SIMOTA_PREFILTER_TOPK = int(sys.argv[2])

model, state, train_step, _fields = build_system(cfg, batch_size=2)
batch = dummy_batch(cfg, batch_size=BS)
step = jax.jit(train_step, donate_argnums=(0,))

state, metrics = step(state, batch)
float(metrics["total_loss"])  # sync

iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    state, metrics = step(state, batch)
float(metrics["total_loss"])
dt = (time.perf_counter() - t0) / iters
print(f"bs={BS}: {dt*1000:.1f} ms/step, {BS/dt:.0f} img/s")

if TRACE:
    with jax.profiler.trace("/root/repo/docs/traces/train_step"):
        for _ in range(3):
            state, metrics = step(state, batch)
        float(metrics["total_loss"])
    print("trace written to docs/traces/train_step")
