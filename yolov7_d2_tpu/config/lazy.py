"""LazyConfig — the reference's second config universe.

The reference ships python-object configs under ``configs/common/`` and
``configs/new_baselines/`` built from detectron2's ``LazyCall`` /
``LazyConfig.load`` / ``instantiate`` (consumed by
/root/reference/tools/lazyconfig_train_net.py:44 and demo_lazyconfig.py).
This module provides the same three primitives on plain dicts.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import uuid
from typing import Any, Callable, Dict

_TARGET_KEY = "_target_"


class LazyCall:
    """Defer a call: ``LazyCall(MyModule)(channels=64)`` -> config dict.

    The result is a plain dict with ``_target_`` holding the callable, so it
    can be inspected/overridden before :func:`instantiate` builds the object.
    """

    def __init__(self, target: Callable) -> None:
        if not callable(target):
            raise TypeError(f"LazyCall target must be callable, got {target!r}")
        self._target = target

    def __call__(self, **kwargs: Any) -> Dict[str, Any]:
        out: Dict[str, Any] = {_TARGET_KEY: self._target}
        out.update(kwargs)
        return out


def instantiate(node: Any) -> Any:
    """Recursively build objects from LazyCall dicts."""
    if isinstance(node, dict):
        built = {k: instantiate(v) for k, v in node.items() if k != _TARGET_KEY}
        if _TARGET_KEY in node:
            target = node[_TARGET_KEY]
            if isinstance(target, str):
                mod, _, attr = target.rpartition(".")
                target = getattr(importlib.import_module(mod), attr)
            return target(**built)
        return built
    if isinstance(node, (list, tuple)):
        return type(node)(instantiate(v) for v in node)
    return node


class LazyConfig:
    """Load/save python-file configs (module globals become the config)."""

    @staticmethod
    def load(filename: str) -> Dict[str, Any]:
        filename = os.path.abspath(filename)
        spec = importlib.util.spec_from_file_location(
            f"_lazycfg_{uuid.uuid4().hex}", filename
        )
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)  # type: ignore[union-attr]
        return {
            k: v
            for k, v in vars(module).items()
            if not k.startswith("_") and not callable(v) or isinstance(v, type)
        }

    @staticmethod
    def apply_overrides(cfg: Dict[str, Any], overrides: list[str]) -> Dict[str, Any]:
        """``["model.backbone.depth=50", "train.max_iter=1000"]``."""
        import ast

        for ov in overrides:
            key, _, raw = ov.partition("=")
            try:
                value = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                value = raw
            node: Any = cfg
            parts = key.strip().split(".")
            for p in parts[:-1]:
                node = node[p] if isinstance(node, dict) else getattr(node, p)
            if isinstance(node, dict):
                node[parts[-1]] = value
            else:
                setattr(node, parts[-1], value)
        return cfg
