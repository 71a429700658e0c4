"""Short on-chip training canary for any arch: synthetic batch, N jitted
steps, prints first/last loss. The chip-side counterpart of the CPU-mesh
canary tests (reference parity: configs/canaries/* smoke runs).

Usage: python tools/train_canary_chip.py <config> [steps] [batch] [size] [CFG.KEY value ...]
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
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
size = int(sys.argv[4]) if len(sys.argv) > 4 else 320

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
b = {k: v for k, v in b.items() if k in fields}
step = jax.jit(train_step, donate_argnums=(0,))

t0 = time.perf_counter()
state, m = step(state, b)
first = float(m["total_loss"])
print(f"compile+step1: {time.perf_counter()-t0:.0f}s, loss {first:.4f}",
      flush=True)
for i in range(steps - 1):
    state, m = step(state, b)
last = float(m["total_loss"])
arch = cfg.MODEL.META_ARCHITECTURE
print(f"{arch} @{size} bs={batch}: loss {first:.4f} -> {last:.4f} "
      f"over {steps} steps ({'DECREASED' if last < first else 'NOT DECREASED'})",
      flush=True)
