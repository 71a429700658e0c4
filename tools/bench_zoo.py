"""On-chip inference sweep across meta-arch families (one line per model).

Extends bench.py's YOLOX-s headline to the zoo — each entry runs the jitted
forward (plus in-graph postprocess where the family has one) at its
config's input size. Run serialized on the single chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.models.build import build_model

ENTRIES = [
    # (label, config, batch, opts)
    ("yolox_m", "configs/coco/yolox_m.yaml", 64, []),
    ("yolox_l", "configs/coco/yolox_l.yaml", 32, []),
    ("yolov7_darknet53", "configs/coco/yolov7.yaml", 64, []),
    ("yolov6_s", "configs/coco/yolov6/yolov6_s.yaml", 64, []),
    ("yolof_r50", "configs/coco/yolof_r50.yaml", 32, []),
    ("solov2_r50", "configs/coco/solov2/solov2_r50.yaml", 16, []),
    ("detr_r50", "configs/coco/detr/detr_256_6_6_r50.yaml", 32, []),
]


def bench_one(label, config, batch, opts):
    cfg = get_cfg()
    cfg.merge_from_file(config)
    cfg.merge_from_list(["SOLVER.AMP.ENABLED", "True"] + opts)
    cfg.freeze()
    model = build_model(cfg)
    h, w = cfg.INPUT.INPUT_SIZE
    images = jnp.full((batch, h, w, 3), 114.0, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, train=False)

    @jax.jit
    def fwd(v, x):
        out = model.apply(v, x, train=False)
        # pick a leaf that DEPENDS ON THE FULL NETWORK for the host sync.
        # tree_leaves order is alphabetical: YOLOF's dict sorts "anchors"
        # (a constant grid) first, and syncing a constant lets XLA
        # dead-code-eliminate the entire model (measured 8838 "img/s").
        if isinstance(out, dict):
            for k in ("outputs", "logits", "pred_logits", "cls_logits"):
                if k in out:
                    return out[k]
        # generic: one element from EVERY leaf — forces all branches
        # without the compile cost of full-tensor reductions
        return jnp.stack(
            [l.reshape(-1)[0].astype(jnp.float32)
             for l in jax.tree.leaves(out)]
        )

    out = fwd(variables, images)
    float(jnp.asarray(out).reshape(-1)[0])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, images)
    float(jnp.asarray(out).reshape(-1)[0])
    ips = batch * iters / (time.perf_counter() - t0)
    print(f"{label} @{h} bs={batch}: {ips:.0f} img/s/chip", flush=True)


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for label, config, batch, opts in ENTRIES:
        if only and only != label:
            continue
        try:
            bench_one(label, config, batch, opts)
        except Exception as e:  # keep sweeping
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)
