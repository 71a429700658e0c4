"""On-chip checkpoint/resume canary: train N steps, orbax-save, restart in
a SUBPROCESS (fresh TPU client), restore, continue training — asserts loss
continuity. Validates the failure-recovery story (SURVEY §5) on the real
chip, not just the CPU mesh.

Usage: python tools/resume_canary_chip.py  (phase arg is internal)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CKPT_DIR = "/tmp/resume_canary_ckpt"
STATE_F = "/tmp/resume_canary_state.json"
STEPS = 30


def build():
    import jax
    import jax.numpy as jnp

    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.engine import build_system, dummy_batch

    cfg = get_cfg()
    cfg.MODEL.YOLO.DEPTH_MUL = 0.33
    cfg.MODEL.YOLO.WIDTH_MUL = 0.25
    cfg.INPUT.INPUT_SIZE = [256, 256]
    cfg.SOLVER.AMP.ENABLED = True
    model, state, train_step, _ = build_system(cfg, batch_size=2)
    batch = dummy_batch(cfg, batch_size=8)
    batch["gt_boxes"] = batch["gt_boxes"].at[:, 1].set(
        jnp.asarray([60.0, 60.0, 200.0, 200.0])
    )
    batch["gt_valid"] = batch["gt_valid"].at[:, 1].set(True)
    return jax.jit(train_step), state, batch


def phase1():
    from yolov7_d2_tpu.train.checkpoint import Checkpointer

    step_fn, state, batch = build()
    losses = []
    for _ in range(STEPS):
        state, m = step_fn(state, batch)
        losses.append(float(m["total_loss"]))
    Checkpointer(CKPT_DIR).save(STEPS, state)
    # ground truth for the restored process: the loss of the very next step
    _, m = step_fn(state, batch)
    post_save_loss = float(m["total_loss"])
    json.dump({"losses": losses, "post_save_loss": post_save_loss},
              open(STATE_F, "w"))
    print(f"phase1: loss {losses[0]:.4f} -> {losses[-1]:.4f}, saved @step "
          f"{STEPS}; next-step loss {post_save_loss:.6f}")


def phase2():
    from yolov7_d2_tpu.train.checkpoint import Checkpointer

    step_fn, state, batch = build()
    state, start = Checkpointer(CKPT_DIR).resume_or_load(state)
    assert start == STEPS, f"resumed at {start}, expected {STEPS}"
    rec = json.load(open(STATE_F))
    losses = []
    for _ in range(STEPS):
        state, m = step_fn(state, batch)
        losses.append(float(m["total_loss"]))
    # EXACT continuation: the restored process's first step must reproduce
    # the loss the saving process computed for that same step (full state —
    # params, momentum, EMA, BN stats, step counter/rng — round-tripped)
    expect = rec["post_save_loss"]
    assert abs(losses[0] - expect) <= 1e-3 * max(1.0, abs(expect)), (
        losses[0], expect,
    )
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    print(
        f"phase2 (fresh process): resumed @{start}, first-step loss "
        f"{losses[0]:.6f} == saver's next-step {expect:.6f}; "
        f"continued to {losses[-1]:.4f} — EXACT CONTINUITY OK"
    )


if __name__ == "__main__":
    if len(sys.argv) > 1:
        {"1": phase1, "2": phase2}[sys.argv[1]]()
    else:
        import shutil

        shutil.rmtree(CKPT_DIR, ignore_errors=True)
        t0 = time.perf_counter()
        for ph in ("1", "2"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), ph],
                cwd=os.path.join(os.path.dirname(__file__), ".."),
            )
            assert r.returncode == 0, f"phase {ph} failed"
        print(f"resume canary OK in {time.perf_counter()-t0:.0f}s")
