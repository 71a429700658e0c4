#!/usr/bin/env python
"""Port a reference PyTorch checkpoint into an orbax checkpoint.

Parity with /root/reference/tools/convert_{detr,anchordetr,smcadetr}_to_d2.py
(upstream-checkpoint key remapping shims) generalized: load .pth/.pkl,
translate names + layouts through the weight-porting shim, save flax
variables for direct consumption by demo.py / eval_coco.py.
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="")
    p.add_argument("--weights", required=True, help=".pth/.pkl checkpoint")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--strict", action="store_true")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.models.build import build_model
    from yolov7_d2_tpu.utils.weight_port import (
        load_torch_checkpoint,
        port_torch_state_dict,
    )

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    model = build_model(cfg)
    h, w = cfg.INPUT.INPUT_SIZE
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), train=False
    )
    sd = load_torch_checkpoint(args.weights)
    variables, report = port_torch_state_dict(
        sd, variables, strict=args.strict
    )
    print(f"ported: {len(report['ported'])} tensors")
    if report["unused"]:
        print(f"unmatched torch keys ({len(report['unused'])}):")
        for k in report["unused"][:20]:
            print(f"  {k}")

    import os

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.output), variables, force=True)
    ckptr.wait_until_finished()
    print(f"saved flax variables to {args.output}")


if __name__ == "__main__":
    main()
