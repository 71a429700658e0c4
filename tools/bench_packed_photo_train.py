"""The production feed-the-chip recipe, measured end to end: uint8
packed shards (offline geometry) -> device photometric aug (mixup blend
+ HSV + flip) fused into the jitted train step.

Reports (a) the graph-only ceiling (device-resident uint8 batch —
what the recipe costs once data is on-chip), (b) the uint8 fed rate
through the tunnel (bounded by tools/bench_h2d.py), (c) the packed
loader's host rate. Compare tools/bench_packed_cache.py (f32 feed, no
device aug) and tools/bench_real_loader_train.py (live host mosaic).

Usage: python tools/bench_packed_photo_train.py [steps] [batch] [size]
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
    from yolov7_d2_tpu.data.device_aug import make_packed_photo_step
    from yolov7_d2_tpu.data.packed_cache import (
        PackedShardLoader,
        write_geometry_shards,
    )
    from yolov7_d2_tpu.engine import build_yolox_system

    cfg = get_cfg()
    cfg.MODEL.YOLO.DEPTH_MUL = 0.33
    cfg.MODEL.YOLO.WIDTH_MUL = 0.50
    cfg.INPUT.INPUT_SIZE = [SIZE, SIZE]
    cfg.INPUT.MOSAIC_AND_MIXUP.ENABLED = True
    cfg.INPUT.MOSAIC_AND_MIXUP.ENABLE_MIXUP = True
    cfg.INPUT.DISTORTION.ENABLED = True
    cfg.SOLVER.AMP.ENABLED = True
    cfg.freeze()

    shard_dir = "/tmp/packed_shards_photo"
    if not os.path.exists(os.path.join(shard_dir, "meta.json")):
        records = load_coco_json(ann, imroot)
        # geometry-only writer: the device photometric step re-applies
        # mixup/HSV/flip, so the shards must not bake them a first time
        t0 = time.perf_counter()
        n = write_geometry_shards(records, cfg, shard_dir, epochs=4,
                                  shard_size=64)
        print(f"offline write: {n} samples in {time.perf_counter()-t0:.1f}s",
              flush=True)

    loader = PackedShardLoader(shard_dir, BATCH, image_dtype=np.uint8)
    it = iter(loader)
    b0 = next(it)
    t0 = time.perf_counter()
    for _ in range(5):
        last = next(it)
    rate = 5 * BATCH / (time.perf_counter() - t0)
    print(f"packed-u8 loader only: {rate:.1f} img/s (1 core)", flush=True)

    model, state, train_step, _ = build_yolox_system(cfg, batch_size=2)
    step = jax.jit(make_packed_photo_step(cfg, train_step, seed=0))

    def dev(b):
        return {k: jnp.asarray(v) for k, v in b.items()}

    # (a) graph-only ceiling: device-resident batch
    db = dev(b0)
    state, m = step(state, db)
    print(f"compiled; first loss {float(m['total_loss']):.3f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, db)
    float(m["total_loss"])
    dt = (time.perf_counter() - t0) / STEPS
    print(
        f"GRAPH-ONLY photometric+train @bs{BATCH} {SIZE}px: "
        f"{dt*1000:.1f} ms/step, {BATCH/dt:.1f} img/s/chip",
        flush=True,
    )

    # (b) fed through the tunnel
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, dev(next(it)))
    float(m["total_loss"])
    dt = (time.perf_counter() - t0) / STEPS
    print(
        f"PACKED-U8+PHOTO fed train @bs{BATCH} {SIZE}px: "
        f"{dt*1000:.1f} ms/step, {BATCH/dt:.1f} img/s/chip "
        f"(loader {rate:.1f} img/s, tunnel-bounded — see bench_h2d)",
        flush=True,
    )


if __name__ == "__main__":
    main()
