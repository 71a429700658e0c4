import os

import pytest
import yaml

from yolov7_d2_tpu.config import CfgNode, LazyCall, get_cfg, instantiate


def test_default_cfg_has_reference_keys():
    cfg = get_cfg()
    # spot-check the reference key surface (yolov7/config.py)
    assert cfg.MODEL.NMS_TYPE == "normal"
    assert cfg.MODEL.PADDED_VALUE == 114.0
    assert cfg.MODEL.YOLO.CLASSES == 80
    assert cfg.MODEL.YOLO.MAX_BOXES_NUM == 100
    assert cfg.MODEL.SPARSE_INST.MATCHER.ALPHA == 0.8
    assert cfg.MODEL.DETR.NUM_OBJECT_QUERIES == 100
    assert cfg.INPUT.MOSAIC_AND_MIXUP.DISABLE_AT_ITER == 120000
    assert cfg.MODEL.SOLOV2.NMS_TYPE == "matrix"


def test_merge_from_list_and_coercion():
    cfg = get_cfg()
    cfg.merge_from_list(
        ["SOLVER.BASE_LR", "0.02", "MODEL.YOLO.CLASSES", "20",
         "SOLVER.AMP.ENABLED", "False"]
    )
    assert cfg.SOLVER.BASE_LR == 0.02
    assert cfg.MODEL.YOLO.CLASSES == 20
    assert cfg.SOLVER.AMP.ENABLED is False
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOT.A.KEY", "1"])


def test_freeze_blocks_writes():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    cfg.defrost()
    cfg.SOLVER.BASE_LR = 1.0
    assert cfg.SOLVER.BASE_LR == 1.0


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    child = tmp_path / "child.yaml"
    base.write_text(yaml.safe_dump(
        {"MODEL": {"YOLO": {"CLASSES": 3, "CONF_THRESHOLD": 0.1}}}
    ))
    child.write_text(yaml.safe_dump(
        {"_BASE_": "base.yaml", "MODEL": {"YOLO": {"CLASSES": 7}}}
    ))
    cfg = get_cfg()
    cfg.merge_from_file(str(child))
    assert cfg.MODEL.YOLO.CLASSES == 7          # overridden
    assert cfg.MODEL.YOLO.CONF_THRESHOLD == 0.1  # inherited
    assert cfg.MODEL.YOLO.MAX_BOXES_NUM == 100   # default preserved


def test_clone_is_deep():
    cfg = get_cfg()
    c2 = cfg.clone()
    c2.MODEL.YOLO.CLASSES = 5
    assert cfg.MODEL.YOLO.CLASSES == 80


def test_lazy_call_instantiate():
    class Dummy:
        def __init__(self, a, b):
            self.a, self.b = a, b

    node = LazyCall(Dummy)(a=1, b=LazyCall(dict)(x=2))
    obj = instantiate(node)
    assert obj.a == 1 and obj.b == {"x": 2}


def test_pickle_roundtrip_preserves_values_and_freeze():
    """Spawn dataloader workers unpickle their cfg (mp_loader MapperFactory);
    dict-subclass default unpickling bypassed __init__ and broke on
    __frozen__."""
    import pickle

    from yolov7_d2_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.YOLO.CLASSES = 17
    cfg.freeze()
    cfg2 = pickle.loads(pickle.dumps(cfg))
    assert cfg2.MODEL.YOLO.CLASSES == 17
    assert cfg2.is_frozen() and cfg2.MODEL.is_frozen()
    cfg3 = pickle.loads(pickle.dumps(get_cfg()))
    assert not cfg3.is_frozen()
    cfg3.MODEL.YOLO.CLASSES = 3  # writable after round-trip
