#!/usr/bin/env python
"""Model export CLI.

Parity with /root/reference/export.py (ONNX/torchscript driver): exports the
jitted inference graph (optionally with decode+NMS fused in, the counterpart
of the reference's in-graph ``onnx_export`` decode branches, yolox.py:211-224)
as a StableHLO artifact consumable by any PJRT runtime.
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("--output", default="export_out")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument(
        "--fuse-postprocess", action="store_true",
        help="bake decode+NMS into the exported graph",
    )
    parser.add_argument("--weights", default="")
    parser.add_argument(
        "--emit-mlir", action="store_true",
        help="also emit model.mlir + compile_options.pb for the C++ PJRT "
             "serving client (deploy/cc/pjrt_infer)",
    )
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.deploy.export import export_inference_fn
    from yolov7_d2_tpu.models.build import build_model
    from yolov7_d2_tpu.models.meta_arch.yolox import yolox_postprocess

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    model = build_model(cfg)
    h, w = cfg.INPUT.INPUT_SIZE
    images = jnp.zeros((args.batch, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    if args.weights:
        from yolov7_d2_tpu.utils.weight_port import (
            load_torch_checkpoint,
            port_torch_state_dict,
        )

        sd = load_torch_checkpoint(args.weights)
        variables, report = port_torch_state_dict(sd, variables)
        print(f"ported {len(report['ported'])} tensors, "
              f"{len(report['unused'])} unmatched")

    post = None
    if args.fuse_postprocess:
        def post(out):
            d = yolox_postprocess(
                out,
                conf_threshold=cfg.MODEL.YOLO.CONF_THRESHOLD,
                nms_threshold=cfg.MODEL.YOLO.NMS_THRESHOLD,
                max_detections=cfg.MODEL.YOLO.MAX_DETECTIONS,
                pre_nms_topk=cfg.MODEL.YOLO.NMS_PRE_TOPK,
            )
            return d.boxes, d.scores, d.classes, d.valid

    paths = export_inference_fn(
        model, variables, (args.batch, h, w, 3), args.output, postprocess=post
    )
    if args.emit_mlir:
        from yolov7_d2_tpu.deploy.export import export_mlir

        frozen = jax.tree.map(jnp.asarray, variables)

        def infer(images):
            out = model.apply(frozen, images, train=False)
            return post(out) if post is not None else out

        paths.update(
            export_mlir(
                infer, (jnp.zeros((args.batch, h, w, 3), jnp.float32),),
                args.output,
            )
        )
    print(f"exported: {paths}")


if __name__ == "__main__":
    main()
