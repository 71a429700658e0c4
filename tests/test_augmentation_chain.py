"""The config-driven augmentation chain (VERDICT round-1 item 3).

Every ``INPUT.*`` toggle must change the emitted sample
(ref build_augmentation, detection_utils.py:18-155), the darknet blend
mosaic must blend 4 pool records (ref dataset_mapper.py:288-336), and the
DETR mapper must exercise its 50% crop branch (ref :847-855).
"""

import cv2
import numpy as np
import pytest

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.data.detection_utils import build_augmentation
from yolov7_d2_tpu.data.mappers import (
    DarknetMosaicDatasetMapper,
    DetrDatasetMapper,
    SimpleDatasetMapper,
)


@pytest.fixture(scope="module")
def records(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(3)
    recs = []
    for i in range(8):
        img = rng.integers(0, 255, (96, 128, 3), np.uint8)
        cv2.rectangle(img, (30, 20), (70, 60), (255, 0, 0), -1)
        p = str(root / f"{i}.png")
        cv2.imwrite(p, img)
        recs.append(
            {
                "file_name": p,
                "height": 96,
                "width": 128,
                "image_id": i,
                "annotations": [
                    {
                        "bbox": [30, 20, 40, 40],
                        "bbox_mode": 5,  # XYWH_CORNER_ABS (COCO)
                        "category_id": 0,
                        "segmentation": [
                            [30.0, 20.0, 70.0, 20.0, 70.0, 60.0, 30.0, 60.0]
                        ],
                    }
                ],
            }
        )
    return recs


def _base_cfg():
    cfg = get_cfg()
    cfg.INPUT.INPUT_SIZE = [96, 96]
    cfg.INPUT.MIN_SIZE_TRAIN = [96]
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.MODEL.YOLO.MAX_BOXES_NUM = 10
    # all stochastic toggles off for the deterministic baseline
    cfg.INPUT.RANDOM_FLIP_HORIZONTAL.ENABLED = False
    cfg.INPUT.RANDOM_FLIP_VERTICAL.ENABLED = False
    return cfg


def _sample(cfg, record, seed=0, **kw):
    return SimpleDatasetMapper(cfg, is_train=True, seed=seed, **kw)(record)


def test_baseline_deterministic(records):
    cfg = _base_cfg()
    a = _sample(cfg, records[0], seed=5)
    b = _sample(cfg, records[0], seed=5)
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])


TOGGLES = [
    ("GRID_MASK", lambda c: c.INPUT.GRID_MASK.update(ENABLED=True, PROB=1.0)),
    ("DISTORTION", lambda c: c.INPUT.DISTORTION.update(ENABLED=True)),
    ("SHIFT", lambda c: c.INPUT.SHIFT.update(ENABLED=True, SHIFT_PIXELS=16)),
    ("FLIP_H", lambda c: c.INPUT.RANDOM_FLIP_HORIZONTAL.update(
        ENABLED=True, PROB=1.0)),
    ("FLIP_V", lambda c: c.INPUT.RANDOM_FLIP_VERTICAL.update(
        ENABLED=True, PROB=1.0)),
    ("BRIGHTNESS", lambda c: c.INPUT.COLOR_JITTER.update(BRIGHTNESS=True)),
    ("SATURATION", lambda c: c.INPUT.COLOR_JITTER.update(SATURATION=True)),
    ("JITTER_CROP", lambda c: (
        c.INPUT.RESIZE.update(ENABLED=True, SHAPE=[96, 96]),
        c.INPUT.JITTER_CROP.update(ENABLED=True, JITTER_RATIO=0.3),
    )),
    ("FORCED_RESIZE", lambda c: (
        c.INPUT.RESIZE.update(ENABLED=True, SHAPE=[96, 96],
                              SCALE_JITTER=[0.6, 0.9]),
        c.INPUT.MOSAIC.update(ENABLED=True),
    )),
]


@pytest.mark.parametrize("name,setter", TOGGLES, ids=[t[0] for t in TOGGLES])
def test_every_input_toggle_changes_the_sample(records, name, setter):
    base = _base_cfg()
    ref = _sample(base, records[0], seed=7)

    cfg = _base_cfg()
    setter(cfg)
    out = _sample(cfg, records[0], seed=7)
    assert not np.array_equal(ref["image"], out["image"]), (
        f"INPUT.{name} toggle produced an identical image — not wired"
    )


def test_chain_structure_matches_reference_selection():
    """RESIZE.ENABLED selects the yolov7 path; SHIFT appends to either."""
    cfg = _base_cfg()
    cfg.INPUT.SHIFT.ENABLED = True
    names = [type(a).__name__ for a in build_augmentation(cfg, True)]
    assert names[0] == "ResizeShortestEdge" and names[-1] == "RandomShift"

    cfg2 = _base_cfg()
    cfg2.INPUT.RESIZE.ENABLED = True
    cfg2.INPUT.JITTER_CROP.ENABLED = True
    cfg2.INPUT.MOSAIC.ENABLED = True
    names2 = [type(a).__name__ for a in build_augmentation(cfg2, True)]
    assert "JitterCrop" in names2 and "ForcedResize" in names2

    # eval path: resize only, no stochastic ops
    cfg3 = _base_cfg()
    cfg3.INPUT.GRID_MASK.ENABLED = True
    names3 = [type(a).__name__ for a in build_augmentation(cfg3, False)]
    assert names3 == ["ResizeShortestEdge"]


def test_flip_keeps_boxes_on_object(records):
    """Geometric consistency: the red block at x=[30,70] of a 128-wide image
    must come back mirrored (after shortest-edge resize + letterbox)."""
    cfg = _base_cfg()
    cfg.INPUT.RANDOM_FLIP_HORIZONTAL.ENABLED = True
    cfg.INPUT.RANDOM_FLIP_HORIZONTAL.PROB = 1.0
    s = _sample(cfg, records[0], seed=1)
    box = s["gt_boxes"][0] / float(s["scale"])
    np.testing.assert_allclose(box, [128 - 70, 20, 128 - 30, 60], atol=1.5)


def test_masks_track_geometry(records):
    cfg = _base_cfg()
    cfg.INPUT.RANDOM_FLIP_HORIZONTAL.ENABLED = True
    cfg.INPUT.RANDOM_FLIP_HORIZONTAL.PROB = 1.0
    s = _sample(cfg, records[0], seed=1, with_masks=True)
    m = s["gt_masks"][0]
    b = s["gt_boxes"][0]
    ys, xs = np.nonzero(m)
    assert len(xs) > 0
    # mask support must sit inside the (flipped) box, within a pixel or two
    assert abs(xs.min() - b[0]) < 3 and abs(xs.max() - b[2]) < 3
    assert abs(ys.min() - b[1]) < 3 and abs(ys.max() - b[3]) < 3


def test_blend_mosaic_mapper(records):
    cfg = _base_cfg()
    cfg.INPUT.MOSAIC.ENABLED = True
    cfg.INPUT.MOSAIC.MOSAIC_WIDTH = 96
    cfg.INPUT.MOSAIC.MOSAIC_HEIGHT = 96
    cfg.INPUT.MOSAIC.MIN_OFFSET = 0.3
    mapper = DarknetMosaicDatasetMapper(
        cfg, is_train=True, seed=11, with_masks=True
    )
    mosaic_seen, plain = 0, 0
    for _ in range(6):  # fill the pool past NUM_IMAGES
        for r in records:
            s = mapper(r)
            if s["gt_valid"].sum() > 1:
                mosaic_seen += 1
            else:
                plain += 1
    assert mosaic_seen > 0, "blend mosaic never produced a multi-tile sample"
    # masks stay aligned with boxes
    assert s["gt_masks"].shape == (10, 96, 96)
    # aug-disable switch falls back to the plain path deterministically
    mapper.enable_aug = False
    s1 = mapper(records[0])
    assert s1["gt_valid"].sum() == 1


def test_detr_mapper_crop_branch(records):
    cfg = _base_cfg()
    cfg.INPUT.CROP.ENABLED = True
    cfg.INPUT.CROP.TYPE = "relative_range"
    cfg.INPUT.CROP.SIZE = [0.5, 0.5]
    m_crop = DetrDatasetMapper(cfg, is_train=True, seed=3)
    cfg2 = _base_cfg()
    m_plain = DetrDatasetMapper(cfg2, is_train=True, seed=3)
    crop_differs = False
    for _ in range(8):
        a = m_crop(records[0])
        b = m_plain(records[0])
        if not np.array_equal(a["image"], b["image"]):
            crop_differs = True
    assert crop_differs, "DETR 50% crop branch never fired"
