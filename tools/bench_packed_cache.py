"""Packed-shard cache benchmark: offline write rate, loader-alone rate,
and the chip train step fed by the cache (SURVEY §7 / VERDICT r3 item 8 —
the weak-host fallback measured on this 1-core host).

Usage: python tools/bench_packed_cache.py [steps] [batch] [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 640


def main():
    from bench_real_loader_train import make_dataset

    ann, imroot = make_dataset("/tmp/realloader_ds")

    import jax
    import jax.numpy as jnp

    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.data.coco import load_coco_json
    from yolov7_d2_tpu.data.mappers import YOLOXDatasetMapper
    from yolov7_d2_tpu.data.packed_cache import (
        PackedShardLoader,
        write_packed_shards,
    )
    from yolov7_d2_tpu.engine import build_yolox_system

    cfg = get_cfg()
    cfg.MODEL.YOLO.DEPTH_MUL = 0.33
    cfg.MODEL.YOLO.WIDTH_MUL = 0.50
    cfg.INPUT.INPUT_SIZE = [SIZE, SIZE]
    cfg.INPUT.MOSAIC_AND_MIXUP.ENABLED = True
    cfg.INPUT.DISTORTION.ENABLED = True
    cfg.SOLVER.AMP.ENABLED = True
    cfg.freeze()

    records = load_coco_json(ann, imroot)
    shard_dir = "/tmp/packed_cache_bench"
    mapper = YOLOXDatasetMapper(cfg, is_train=True, seed=0)

    t0 = time.perf_counter()
    n = write_packed_shards(
        records, mapper, shard_dir, epochs=4, shard_size=64
    )
    dt = time.perf_counter() - t0
    print(f"offline write: {n} samples in {dt:.1f}s = {n / dt:.1f} img/s "
          f"(full mosaic mapper, 1 core)", flush=True)

    loader = PackedShardLoader(shard_dir, BATCH, seed=0)
    it = iter(loader)
    b0 = next(it)
    t0 = time.perf_counter()
    n_meas = 12
    for _ in range(n_meas):
        b0 = next(it)
    rate = n_meas * BATCH / (time.perf_counter() - t0)
    print(f"packed-loader only: {rate:.1f} img/s (1 core)", flush=True)

    model, state, train_step, _ = build_yolox_system(cfg, batch_size=2)
    step = jax.jit(train_step, donate_argnums=(0,))

    def to_batch(b):
        return {k: jnp.asarray(v) for k, v in b.items()}

    state, m = step(state, to_batch(b0))
    print(f"compiled; first loss {float(m['total_loss']):.3f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, to_batch(next(it)))
    float(m["total_loss"])
    dt = (time.perf_counter() - t0) / STEPS
    print(
        f"PACKED-CACHE TRAIN @bs{BATCH} {SIZE}px: {dt * 1000:.1f} ms/step, "
        f"{BATCH / dt:.1f} img/s/chip (loader ceiling {rate:.1f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
