"""Train-step profiler for ANY config on the real chip: timing + profiler
trace + aggregated per-kernel breakdown (the generic counterpart of
tools/profile_train_step.py, which is YOLOX-specific — VERDICT round-3
item 2 asks for the same trace-justified tax naming for SparseInst/DETR).

Usage:
  python tools/profile_train_zoo.py <config> [batch] [size] [tag] [CFG.KEY value ...]

Writes the trace to docs/traces/<tag> and prints the top-25 device ops by
total duration, aggregated from vm.trace.json.gz.
"""

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.engine import build_system

config = sys.argv[1]
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
size = int(sys.argv[3]) if len(sys.argv) > 3 else 640
tag = sys.argv[4] if len(sys.argv) > 4 else "train_zoo"

cfg = get_cfg()
cfg.merge_from_file(config)
cfg.merge_from_list([
    "INPUT.INPUT_SIZE", f"[{size},{size}]", "SOLVER.AMP.ENABLED", "True",
] + sys.argv[5:])

model, state, train_step, fields = build_system(cfg, batch_size=2)

# synthetic batch identical to tools/bench_train_zoo.py so numbers compare
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
state, metrics = step(state, b)
float(metrics["total_loss"])  # compile + sync

iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    state, metrics = step(state, b)
float(metrics["total_loss"])
dt = (time.perf_counter() - t0) / iters
print(f"{os.path.basename(config)} bs={batch}@{size}: "
      f"{dt*1000:.1f} ms/step, {batch/dt:.0f} img/s/chip")

trace_dir = os.path.join(os.path.dirname(__file__), "..", "docs", "traces",
                         tag)
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        state, metrics = step(state, b)
    float(metrics["total_loss"])

# aggregate device ops from the chrome trace
paths = sorted(glob.glob(
    os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
assert paths, f"no trace written under {trace_dir}"
with gzip.open(paths[-1], "rt") as f:
    events = json.load(f)["traceEvents"]

# device lanes are the pid whose name mentions TPU/device XLA ops
pid_names = {e["pid"]: e["args"].get("name", "")
             for e in events if e.get("ph") == "M"
             and e.get("name") == "process_name" and "args" in e}
dev_pids = {p for p, n in pid_names.items()
            if re.search(r"TPU|/device|XLA Op", n, re.I)}
tot = defaultdict(float)
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        name = e.get("name", "")
        tot[name] += e.get("dur", 0.0)
total_us = sum(tot.values())
print(f"-- top device ops ({len(tot)} distinct, {total_us/1e3:.1f} ms "
      f"total over 3 steps) --")
for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{us/1e3:9.2f} ms  {100*us/max(total_us,1):5.1f}%  {name[:110]}")
print(f"trace: {os.path.relpath(paths[-1])}")
