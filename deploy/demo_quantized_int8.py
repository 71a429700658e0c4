#!/usr/bin/env python
"""Quantized-inference demo.

Parity with /root/reference/deploy/demo_quantized_int8.py (wanwu TRT int8
demo): run YOLOX with weight-only int8 parameters (4x smaller HBM footprint)
and report the output drift vs full precision — the TPU deployment recipe
from yolov7_d2_tpu/deploy/quantize.py.
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.deploy.quantize import (
        dequantize_weights,
        quantize_weights_int8,
    )
    from yolov7_d2_tpu.models.build import build_model

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    model = build_model(cfg)
    h, w = cfg.INPUT.INPUT_SIZE
    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (args.batch, h, w, 3)),
        jnp.float32,
    )
    variables = model.init(jax.random.PRNGKey(0), images, train=False)

    qparams, scales = quantize_weights_int8(variables["params"])
    int8_bytes = sum(
        x.size for x in jax.tree_util.tree_leaves(qparams)
        if x.dtype == jnp.int8
    )
    f32_bytes = sum(
        x.size * 4 for x in jax.tree_util.tree_leaves(variables["params"])
    )
    print(f"param bytes: f32 {f32_bytes/1e6:.1f} MB -> int8+scales "
          f"~{int8_bytes/1e6:.1f} MB")

    deq = dequantize_weights(qparams, scales, dtype=jnp.float32)
    v_q = dict(variables)
    v_q["params"] = deq

    @jax.jit
    def forward(v, x):
        return model.apply(v, x, train=False)["outputs"]

    ref = forward(variables, images)
    out = forward(v_q, images)
    drift = float(jnp.max(jnp.abs(ref - out)))
    rel = drift / (float(jnp.max(jnp.abs(ref))) + 1e-9)
    print(f"max output drift int8-weights vs f32: {drift:.4f} "
          f"(relative {rel:.4%})")


if __name__ == "__main__":
    main()
