"""Time the SimOTA loss alone (no model forward) on precomputed head
outputs, sweeping prefilter_topk — isolates the assignment cost that
profile_train_parts.py showed at ~49ms @bs128 (as much as the forward)."""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.engine import build_system, dummy_batch

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
cfg = get_cfg()
cfg.MODEL.YOLO.DEPTH_MUL = 0.33
cfg.MODEL.YOLO.WIDTH_MUL = 0.50
cfg.INPUT.INPUT_SIZE = [640, 640]
cfg.SOLVER.AMP.ENABLED = True

model, state, train_step, _fields = build_system(cfg, batch_size=2)
batch = dummy_batch(cfg, batch_size=BS)

out = jax.jit(
    lambda p, s, im: model.apply(
        {"params": p, "batch_stats": s}, im, train=True, mutable=["batch_stats"]
    )[0]
)(state.params, state.batch_stats, batch["image"])
out = jax.tree.map(jax.device_put, out)
jax.block_until_ready(out)


def timed(fn, *args, iters=20):
    r = fn(*args)
    float(jax.tree.leaves(r)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jax.tree.leaves(r)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1000


from yolov7_d2_tpu.models.heads.yolox_head import yolox_losses

G = batch["gt_boxes"].shape[1]
print(f"A=8400 G={G} bs={BS}")
for k in [None, 4096, 2048, 1024, 512]:
    fn = jax.jit(
        lambda o, b, kk=k: yolox_losses(
            o, b["gt_boxes"], b["gt_classes"], b["gt_valid"],
            cfg.MODEL.YOLO.CLASSES, use_l1=False, prefilter_topk=kk,
        )["total_loss"]
    )
    print(f"prefilter_topk={k}: {timed(fn, out, batch):.2f} ms")
