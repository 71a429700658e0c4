"""Real-loader on-chip training measurement (VERDICT r2 item 10).

Measures the steady-state train-step time when the mosaic `mp_loader`
FEEDS the chip (vs the dummy-batch numbers in docs/PERF.md), plus the
loader-alone rate, so the host-bound gap and the worker-scaling
extrapolation are recorded from the same run.

Generates a synthetic on-disk COCO dataset (the container has no COCO),
builds MyDatasetMapper2 (mosaic+mixup) per worker, and runs the YOLOX-s
train step on whatever the loader delivers.

Usage: python tools/bench_real_loader_train.py [steps] [batch] [size] [workers]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 640
WORKERS = int(sys.argv[4]) if len(sys.argv) > 4 else 1


def make_dataset(root: str, n: int = 64, hw: int = 640):
    import cv2

    os.makedirs(f"{root}/images", exist_ok=True)
    images, anns = [], []
    aid = 1
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (hw, hw, 3), np.uint8)
        cv2.imwrite(f"{root}/images/{i}.jpg", img)
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "width": hw, "height": hw})
        for _ in range(8):
            x, y = rng.uniform(0, hw - 80, 2)
            w, h = rng.uniform(20, 80, 2)
            anns.append({"id": aid, "image_id": i,
                         "category_id": int(rng.integers(1, 10)),
                         "bbox": [float(x), float(y), float(w), float(h)],
                         "area": float(w * h), "iscrowd": 0})
            aid += 1
    json.dump({"images": images, "annotations": anns,
               "categories": [{"id": c, "name": str(c)}
                              for c in range(1, 11)]},
              open(f"{root}/ann.json", "w"))
    return f"{root}/ann.json", f"{root}/images"


def main():
    root = "/tmp/realloader_ds"
    ann, imroot = make_dataset(root)

    import jax
    import jax.numpy as jnp

    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.data.coco import load_coco_json
    from yolov7_d2_tpu.data.mp_loader import MultiProcessDataLoader
    from yolov7_d2_tpu.engine import build_yolox_system

    cfg = get_cfg()
    cfg.MODEL.YOLO.DEPTH_MUL = 0.33
    cfg.MODEL.YOLO.WIDTH_MUL = 0.50
    cfg.INPUT.INPUT_SIZE = [SIZE, SIZE]
    cfg.SOLVER.AMP.ENABLED = True
    cfg.freeze()

    records = load_coco_json(ann, imroot)

    from yolov7_d2_tpu.data.mappers import MapperFactory, YOLOXDatasetMapper

    mapper_factory = MapperFactory(YOLOXDatasetMapper, cfg)

    # ---- loader-alone rate (no chip)
    loader = MultiProcessDataLoader(
        records, mapper_factory, BATCH, num_workers=WORKERS, seed=0
    )
    it = iter(loader)
    b0 = next(it)  # warm up workers
    t0 = time.perf_counter()
    n_warm = 5
    for _ in range(n_warm):
        b0 = next(it)
    loader_rate = n_warm * BATCH / (time.perf_counter() - t0)
    print(f"loader-only: {loader_rate:.1f} img/s ({WORKERS} worker(s))",
          flush=True)

    # ---- chip train step fed by the loader
    model, state, train_step, eval_step = build_yolox_system(
        cfg, batch_size=2
    )
    step = jax.jit(train_step, donate_argnums=(0,))

    def to_batch(b):
        return {
            "image": jnp.asarray(b["image"]),
            "gt_boxes": jnp.asarray(b["gt_boxes"]),
            "gt_classes": jnp.asarray(b["gt_classes"]),
            "gt_valid": jnp.asarray(b["gt_valid"]),
        }

    state, m = step(state, to_batch(b0))
    print(f"compiled; first loss {float(m['total_loss']):.3f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, to_batch(next(it)))
    float(m["total_loss"])  # sync
    dt = (time.perf_counter() - t0) / STEPS
    print(
        f"REAL-LOADER TRAIN @bs{BATCH} {SIZE}px {WORKERS}w: "
        f"{dt * 1000:.1f} ms/step, {BATCH / dt:.1f} img/s/chip "
        f"(loader ceiling {loader_rate:.1f} img/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
