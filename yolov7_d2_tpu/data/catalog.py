"""Dataset + metadata catalogs.

The counterpart of detectron2's ``DatasetCatalog`` / ``MetadataCatalog`` that
the reference relies on for every dataset
(/root/reference/train_custom_datasets.py:23-76 registers five custom COCO
datasets through ``register_coco_instances``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List


class _DatasetCatalog:
    def __init__(self) -> None:
        self._loaders: Dict[str, Callable[[], List[dict]]] = {}

    def register(self, name: str, loader: Callable[[], List[dict]]) -> None:
        if name in self._loaders:
            raise KeyError(f"Dataset '{name}' already registered")
        self._loaders[name] = loader

    def get(self, name: str) -> List[dict]:
        if name not in self._loaders:
            raise KeyError(
                f"Dataset '{name}' not registered. Available: {sorted(self._loaders)}"
            )
        return self._loaders[name]()

    def list(self) -> List[str]:
        return sorted(self._loaders)

    def remove(self, name: str) -> None:
        self._loaders.pop(name, None)

    def __contains__(self, name: str) -> bool:
        return name in self._loaders


class _Metadata:
    def __init__(self, name: str) -> None:
        self.name = name

    def set(self, **kwargs: Any) -> "_Metadata":
        for k, v in kwargs.items():
            setattr(self, k, v)
        return self

    def get(self, key: str, default: Any = None) -> Any:
        return getattr(self, key, default)


class _MetadataCatalog:
    def __init__(self) -> None:
        self._meta: Dict[str, _Metadata] = {}

    def get(self, name: str) -> _Metadata:
        if name not in self._meta:
            self._meta[name] = _Metadata(name)
        return self._meta[name]


DatasetCatalog = _DatasetCatalog()
MetadataCatalog = _MetadataCatalog()


def register_coco_instances(
    name: str, metadata: dict, json_file: str, image_root: str
) -> None:
    """Register a COCO-format dataset (reference uses d2's function of the
    same name for facemask/tl/visdrone/wearmask/voc)."""
    from yolov7_d2_tpu.data.coco import load_coco_json

    DatasetCatalog.register(
        name, lambda: load_coco_json(json_file, image_root, name)
    )
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="coco",
        **metadata,
    )
