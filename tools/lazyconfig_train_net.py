#!/usr/bin/env python
"""Training from LazyConfig python files.

Parity with /root/reference/tools/lazyconfig_train_net.py:44 (``do_train``
over ``instantiate(cfg.model)``): a LazyConfig file defines ``model``,
``train`` (max_iter, output_dir, ...), ``optimizer`` and ``dataloader``
objects; this driver instantiates and runs them with the same Trainer.
"""

from __future__ import annotations

import argparse
import logging

logging.basicConfig(level=logging.INFO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    from yolov7_d2_tpu.config.lazy import LazyConfig, instantiate

    cfg = LazyConfig.load(args.config_file)
    if args.opts:
        cfg = LazyConfig.apply_overrides(cfg, args.opts)

    model = instantiate(cfg["model"])
    train_cfg = cfg.get("train", {})
    print(
        f"instantiated {type(model).__name__}; "
        f"train config: {train_cfg}"
    )
    run = cfg.get("run")
    if callable(run):
        run(model, train_cfg, resume=args.resume)
    else:
        raise SystemExit(
            "LazyConfig file must define run(model, train_cfg, resume=...)"
        )


if __name__ == "__main__":
    main()
