"""Split train-step cost: fwd / fwd+SimOTA-loss / full step (bs128 @640)."""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.engine import build_system, dummy_batch, make_yolox_loss_adapter

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
cfg = get_cfg()
cfg.MODEL.YOLO.DEPTH_MUL = 0.33
cfg.MODEL.YOLO.WIDTH_MUL = 0.50
cfg.INPUT.INPUT_SIZE = [640, 640]
cfg.SOLVER.AMP.ENABLED = True

model, state, train_step, _fields = build_system(cfg, batch_size=2)
batch = dummy_batch(cfg, batch_size=BS)
loss_fn = make_yolox_loss_adapter(cfg.MODEL.YOLO.CLASSES)


def timed(fn, *args, iters=10):
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters * 1000


@jax.jit
def fwd(params, stats, images):
    out, mut = model.apply(
        {"params": params, "batch_stats": stats}, images, train=True,
        mutable=["batch_stats"],
    )
    return out["outputs"], mut


@jax.jit
def fwd_loss(params, stats, batch):
    out, mut = model.apply(
        {"params": params, "batch_stats": stats}, batch["image"], train=True,
        mutable=["batch_stats"],
    )
    return loss_fn(out, batch, True)["total_loss"]


step = jax.jit(train_step)

print("fwd(train)      :", timed(fwd, state.params, state.batch_stats, batch["image"]), "ms")
print("fwd+loss        :", timed(fwd_loss, state.params, state.batch_stats, batch), "ms")
print("full step       :", timed(step, state, batch), "ms")
