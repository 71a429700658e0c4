"""Top-level model builder (the counterpart of d2 ``build_model(cfg)``)."""

from __future__ import annotations

from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY


def build_model(cfg):
    """Resolve MODEL.META_ARCHITECTURE through the registry and build."""
    name = cfg.MODEL.META_ARCHITECTURE
    return META_ARCH_REGISTRY.get(name)(cfg)
