"""Name -> builder registries.

The reference framework wires models together through detectron2's registries
(``META_ARCH_REGISTRY``, ``BACKBONE_REGISTRY``; see SURVEY.md §1 L0 and the
per-subsystem registries in /root/reference/yolov7/modeling). We provide the
same decoupling — a config names a component, the registry resolves it — as a
tiny dependency-free primitive.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional, Tuple


class Registry:
    """A string -> object registry supporting decorator or call registration.

    >>> BACKBONE_REGISTRY = Registry("BACKBONE")
    >>> @BACKBONE_REGISTRY.register()
    ... def build_cspdarknetx_backbone(cfg):
    ...     ...
    >>> builder = BACKBONE_REGISTRY.get("build_cspdarknetx_backbone")
    """

    def __init__(self, name: str) -> None:
        self._name = name
        self._map: Dict[str, Any] = {}

    @property
    def name(self) -> str:
        return self._name

    def _do_register(self, name: str, obj: Any) -> None:
        if name in self._map:
            raise KeyError(
                f"'{name}' already registered in {self._name} registry"
            )
        self._map[name] = obj

    def register(self, obj: Optional[Any] = None, name: Optional[str] = None):
        if obj is None:
            # Decorator usage: @registry.register() or @registry.register(name="X")
            def deco(fn_or_class: Any) -> Any:
                self._do_register(name or fn_or_class.__name__, fn_or_class)
                return fn_or_class

            return deco
        self._do_register(name or obj.__name__, obj)
        return obj

    def get(self, name: str) -> Any:
        if name not in self._map:
            raise KeyError(
                f"'{name}' not found in {self._name} registry. "
                f"Available: {sorted(self._map)}"
            )
        return self._map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._map

    def __iter__(self) -> Iterator[Tuple[str, Any]]:
        return iter(self._map.items())

    def keys(self):
        return self._map.keys()

    def __len__(self) -> int:
        return len(self._map)

    def __repr__(self) -> str:
        return f"Registry({self._name}, {sorted(self._map)})"


# The registry set mirrors the reference's decoupling points:
# META_ARCH / BACKBONE (d2), SPARSE_INST_{ENCODER,DECODER} + matcher/criterion
# (sparseinst), D2GO_OPTIM_MAPPER (optimizer/build.py:16).
META_ARCH_REGISTRY = Registry("META_ARCH")
BACKBONE_REGISTRY = Registry("BACKBONE")
NECK_REGISTRY = Registry("NECK")
HEAD_REGISTRY = Registry("HEAD")
MATCHER_REGISTRY = Registry("MATCHER")
CRITERION_REGISTRY = Registry("CRITERION")
OPTIMIZER_REGISTRY = Registry("OPTIMIZER")
DATASET_REGISTRY = Registry("DATASET")
