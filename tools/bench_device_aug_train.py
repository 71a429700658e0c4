"""On-chip benchmark of the DEVICE-side aug path (data/device_aug.py).

Three numbers (SURVEY §7 north star, VERDICT r3 missing #2):
  1. device-aug-only throughput (fused mosaic+mixup+HSV+flip, jitted)
  2. fused aug+train-step throughput on dummy uint8 tiles (chip ceiling)
  3. fused aug+train-step fed by the REAL TileDatasetMapper loader
     (host does decode + one resize only)

Compare with tools/bench_real_loader_train.py (host mosaic path; ~40
img/s/core loader ceiling).

Usage: python tools/bench_device_aug_train.py [steps] [batch] [size] [workers]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 640
WORKERS = int(sys.argv[4]) if len(sys.argv) > 4 else 4


def main():
    from bench_real_loader_train import make_dataset

    ann, imroot = make_dataset("/tmp/realloader_ds")

    import jax
    import jax.numpy as jnp

    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.data.coco import load_coco_json
    from yolov7_d2_tpu.data.device_aug import DeviceAug
    from yolov7_d2_tpu.data.mp_loader import MultiProcessDataLoader
    from yolov7_d2_tpu.engine import build_yolox_system

    cfg = get_cfg()
    cfg.MODEL.YOLO.DEPTH_MUL = 0.33
    cfg.MODEL.YOLO.WIDTH_MUL = 0.50
    cfg.INPUT.INPUT_SIZE = [SIZE, SIZE]
    cfg.INPUT.MOSAIC_AND_MIXUP.ENABLED = True
    cfg.INPUT.DISTORTION.ENABLED = True
    cfg.SOLVER.AMP.ENABLED = True
    cfg.freeze()

    aug = DeviceAug(cfg)
    rng = np.random.default_rng(0)
    dummy_tiles = {
        "image": jnp.asarray(
            rng.integers(0, 255, (BATCH, SIZE, SIZE, 3), np.uint8)
        ),
        "gt_boxes": jnp.asarray(
            np.tile([[10.0, 10.0, 60.0, 60.0]], (BATCH, 120, 1)).astype(
                np.float32
            )
        ),
        "gt_classes": jnp.zeros((BATCH, 120), jnp.int32),
        "gt_valid": jnp.asarray(rng.random((BATCH, 120)) < 0.1),
        "orig_hw": jnp.asarray(
            rng.uniform(480, 640, (BATCH, 2)).astype(np.float32)
        ),
    }

    # ---- 1. aug-only
    aug_j = jax.jit(lambda k, t: aug(k, t))
    out = aug_j(jax.random.PRNGKey(0), dummy_tiles)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 30
    for i in range(iters):
        out = aug_j(jax.random.PRNGKey(i), dummy_tiles)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(
        f"device-aug only @bs{BATCH} {SIZE}px: "
        f"{dt / iters * 1000:.2f} ms/batch, {BATCH * iters / dt:.1f} img/s",
        flush=True,
    )

    # ---- 2. fused aug + train step, dummy tiles
    model, state, train_step, _ = build_yolox_system(cfg, batch_size=2)

    @jax.jit
    def fused(state, key, tiles):
        key = jax.random.fold_in(key, state.step)
        return train_step(state, aug(key, tiles))

    state, m = fused(state, jax.random.PRNGKey(1), dummy_tiles)
    print(f"compiled; first loss {float(m['total_loss']):.3f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = fused(state, jax.random.PRNGKey(1), dummy_tiles)
    float(m["total_loss"])
    dt = (time.perf_counter() - t0) / STEPS
    print(
        f"fused aug+train dummy-tiles @bs{BATCH}: {dt * 1000:.1f} ms/step, "
        f"{BATCH / dt:.1f} img/s/chip",
        flush=True,
    )

    # ---- 3. fused aug + train step fed by the REAL tile loader
    records = load_coco_json(ann, imroot)

    from yolov7_d2_tpu.data.mappers import MapperFactory, TileDatasetMapper

    loader = MultiProcessDataLoader(
        records, MapperFactory(TileDatasetMapper, cfg), BATCH,
        num_workers=WORKERS, seed=0,
    )
    it = iter(loader)

    def to_tiles(b):
        return {
            "image": jnp.asarray(b["image"]),
            "gt_boxes": jnp.asarray(b["gt_boxes"]),
            "gt_classes": jnp.asarray(b["gt_classes"]),
            "gt_valid": jnp.asarray(b["gt_valid"]),
            "orig_hw": jnp.asarray(b["orig_hw"]),
        }

    b0 = to_tiles(next(it))
    t0 = time.perf_counter()
    n_warm = 10
    for _ in range(n_warm):
        last = next(it)
    tile_rate = n_warm * BATCH / (time.perf_counter() - t0)
    print(
        f"tile-loader only: {tile_rate:.1f} img/s ({WORKERS} worker(s))",
        flush=True,
    )

    state, m = fused(state, jax.random.PRNGKey(2), b0)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = fused(state, jax.random.PRNGKey(2), to_tiles(next(it)))
    float(m["total_loss"])
    dt = (time.perf_counter() - t0) / STEPS
    print(
        f"REAL-TILE-LOADER fused train @bs{BATCH} {SIZE}px {WORKERS}w: "
        f"{dt * 1000:.1f} ms/step, {BATCH / dt:.1f} img/s/chip "
        f"(tile loader ceiling {tile_rate:.1f} img/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
