"""Short on-chip training canary for any arch: synthetic batch, N jitted
steps, prints first/last loss. The chip-side counterpart of the CPU-mesh
canary tests (reference parity: configs/canaries/* smoke runs).

Usage: python tools/train_canary_chip.py <config> [steps] [batch] [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.engine import build_system, dummy_batch

config = sys.argv[1]
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
size = int(sys.argv[4]) if len(sys.argv) > 4 else 320

cfg = get_cfg()
cfg.merge_from_file(config)
cfg.merge_from_list([
    "INPUT.INPUT_SIZE", f"[{size},{size}]", "SOLVER.AMP.ENABLED", "True",
])

model, state, train_step, eval_step = build_system(cfg, batch_size=2)
b = dummy_batch(cfg, batch_size=batch)
# put a couple of learnable boxes in the batch
b["gt_boxes"] = b["gt_boxes"].at[:, 1].set(
    jnp.asarray([size * 0.3, size * 0.3, size * 0.7, size * 0.7])
)
b["gt_valid"] = b["gt_valid"].at[:, 1].set(True)
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
