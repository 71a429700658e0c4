"""Steady-state TRAIN throughput for any config on the real chip.

The training counterpart of tools/bench_zoo.py (which is forward-only):
builds the full system from a YAML, runs the jitted train step on a
synthetic batch, and reports ms/step + img/s/chip after warmup
(scalar-fetch synchronized — block_until_ready returns early on the
axon tunnel).

Usage:
  python tools/bench_train_zoo.py <config> [batch] [size] [iters] [CFG.KEY value ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.engine import build_system

config = sys.argv[1]
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
size = int(sys.argv[3]) if len(sys.argv) > 3 else 640
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10

cfg = get_cfg()
cfg.merge_from_file(config)
cfg.merge_from_list([
    "INPUT.INPUT_SIZE", f"[{size},{size}]", "SOLVER.AMP.ENABLED", "True",
] + sys.argv[5:])

model, state, train_step, fields = build_system(cfg, batch_size=2)
g = 16
b = {
    "image": jnp.full((batch, size, size, 3), 114.0, jnp.float32),
    "gt_boxes": jnp.zeros((batch, g, 4))
    .at[:, 0].set(jnp.asarray([10.0, 10.0, 50.0, 50.0]))
    .at[:, 1].set(
        jnp.asarray([size * 0.3, size * 0.3, size * 0.7, size * 0.7])
    ),
    "gt_classes": jnp.zeros((batch, g), jnp.int32).at[:, 1].set(1),
    "gt_valid": jnp.zeros((batch, g), bool).at[:, 0].set(True)
    .at[:, 1].set(True),
}
if "gt_masks" in fields:
    m = np.zeros((batch, g, size, size), np.float32)
    m[:, 0, 10:50, 10:50] = 1.0
    q = int(size * 0.3), int(size * 0.7)
    m[:, 1, q[0]:q[1], q[0]:q[1]] = 1.0
    b["gt_masks"] = jnp.asarray(m)
if "gt_keypoints" in fields:
    k = np.zeros((batch, g, cfg.MODEL.YOLO.KEYPOINTS_NUM, 3), np.float32)
    k[:, 0, :, 0] = 30.0
    k[:, 0, :, 1] = 30.0
    k[:, 0, :5, 2] = 2.0
    b["gt_keypoints"] = jnp.asarray(k)
if "gt_sem_seg" in fields:
    sem = np.zeros((batch, size, size), np.int32)
    sem[:, size // 2:, :] = 1
    b["gt_sem_seg"] = jnp.asarray(sem)
b = {k: v for k, v in b.items() if k in fields}
step = jax.jit(train_step, donate_argnums=(0,))

t0 = time.perf_counter()
state, m = step(state, b)
first = float(m["total_loss"])  # sync
print(f"compile+step1: {time.perf_counter() - t0:.0f}s, loss {first:.4f}",
      flush=True)
for _ in range(3):  # warmup
    state, m = step(state, b)
float(m["total_loss"])

t0 = time.perf_counter()
for _ in range(iters):
    state, m = step(state, b)
float(m["total_loss"])
dt = (time.perf_counter() - t0) / iters
arch = cfg.MODEL.META_ARCHITECTURE
print(f"TRAIN {arch} {os.path.basename(config)} @{size} bs={batch}: "
      f"{dt * 1000:.1f} ms/step, {batch / dt:.0f} img/s/chip", flush=True)
