"""Packed-shard cache (data/packed_cache.py): write -> load round-trip,
epoch coverage, carry-across-shards batching."""

import numpy as np
import pytest

from yolov7_d2_tpu.data.packed_cache import (
    PackedShardLoader,
    write_packed_shards,
)


def _mapper(record):
    rng = np.random.default_rng(record["image_id"])
    return {
        "image": rng.integers(0, 255, (32, 32, 3)).astype(np.float32),
        "gt_boxes": np.full((8, 4), float(record["image_id"]), np.float32),
        "gt_classes": np.full((8,), record["image_id"], np.int32),
        "gt_valid": np.arange(8) < 3,
    }


def _records(n):
    return [{"image_id": i} for i in range(n)]


def test_roundtrip_and_shapes(tmp_path):
    n = write_packed_shards(
        _records(10), _mapper, str(tmp_path), epochs=2, shard_size=8
    )
    assert n == 20
    loader = PackedShardLoader(str(tmp_path), batch_size=4, shuffle=False,
                               infinite=False, seed=0)
    batches = list(loader)
    total = sum(len(b["image"]) for b in batches)
    assert total == 20
    b = batches[0]
    assert b["image"].shape == (4, 32, 32, 3) and b["image"].dtype == np.float32
    assert b["gt_boxes"].shape == (4, 8, 4)
    # labels stay consistent with their image (shard round-trip)
    for bb in batches:
        for i in range(len(bb["image"])):
            iid = int(bb["gt_classes"][i, 0])
            np.testing.assert_allclose(bb["gt_boxes"][i], float(iid))
            ref = _mapper({"image_id": iid})["image"]
            np.testing.assert_allclose(bb["image"][i], np.round(ref))


def test_epoch_coverage_with_shuffle(tmp_path):
    write_packed_shards(
        _records(12), _mapper, str(tmp_path), epochs=1, shard_size=5
    )
    loader = PackedShardLoader(str(tmp_path), batch_size=3, shuffle=True,
                               infinite=False, seed=1)
    ids = [int(b["gt_classes"][i, 0]) for b in loader
           for i in range(len(b["image"]))]
    assert sorted(ids) == sorted(range(12))


def test_infinite_stream(tmp_path):
    write_packed_shards(
        _records(6), _mapper, str(tmp_path), epochs=1, shard_size=4
    )
    it = iter(PackedShardLoader(str(tmp_path), batch_size=4, infinite=True,
                                seed=2))
    seen = 0
    for _ in range(5):
        b = next(it)
        assert len(b["image"]) == 4
        seen += 4
    assert seen == 20  # keeps yielding past one epoch


def test_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        PackedShardLoader(str(tmp_path / "nope"), batch_size=2)


def test_switching_loader_disable_at_iter(tmp_path):
    """DISABLE_AT_ITER semantics: exactly ``switch_after`` batches come
    from the augmented shards, everything after from the plain shards."""
    from yolov7_d2_tpu.data.packed_cache import SwitchingPackedLoader

    aug_dir, plain_dir = str(tmp_path / "aug"), str(tmp_path / "plain")

    def tagged(tag):
        def m(record):
            s = _mapper(record)
            s["image"] = np.full((32, 32, 3), tag, np.float32)
            return s
        return m

    write_packed_shards(_records(8), tagged(10.0), aug_dir, shard_size=4)
    write_packed_shards(_records(8), tagged(200.0), plain_dir, shard_size=4)
    loader = SwitchingPackedLoader(
        PackedShardLoader(aug_dir, 4, infinite=True, seed=0),
        PackedShardLoader(plain_dir, 4, infinite=True, seed=0),
        switch_after=3,
    )
    it = iter(loader)
    vals = [float(next(it)["image"][0, 0, 0, 0]) for _ in range(6)]
    assert vals == [10.0, 10.0, 10.0, 200.0, 200.0, 200.0]

    # switch_after=0 -> plain from the first batch (resume past the iter)
    loader0 = SwitchingPackedLoader(
        PackedShardLoader(aug_dir, 4, infinite=True, seed=0),
        PackedShardLoader(plain_dir, 4, infinite=True, seed=0),
        switch_after=0,
    )
    assert float(next(iter(loader0))["image"][0, 0, 0, 0]) == 200.0


def test_writer_cfg_clones_strip_the_right_aug(tmp_path):
    """PACKED_CACHE_DIR shards must exclude photometrics (the device aug
    re-applies them); PACKED_CACHE_PLAIN_DIR shards must exclude ALL
    augmentation (the reference's post-DISABLE_AT_ITER plain phase)."""
    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.data.packed_cache import geometry_only_cfg, plain_cfg

    cfg = get_cfg()
    cfg.INPUT.MOSAIC_AND_MIXUP.ENABLED = True
    cfg.INPUT.MOSAIC_AND_MIXUP.ENABLE_MIXUP = True
    cfg.INPUT.DISTORTION.ENABLED = True
    cfg.INPUT.RANDOM_FLIP_HORIZONTAL.ENABLED = True
    cfg.freeze()

    geo = geometry_only_cfg(cfg)
    assert geo.INPUT.MOSAIC_AND_MIXUP.ENABLED          # geometry kept
    assert not geo.INPUT.MOSAIC_AND_MIXUP.ENABLE_MIXUP
    assert not geo.INPUT.DISTORTION.ENABLED
    assert not geo.INPUT.RANDOM_FLIP_HORIZONTAL.ENABLED

    pl = plain_cfg(cfg)
    assert not pl.INPUT.MOSAIC_AND_MIXUP.ENABLED       # no mosaic at all
    assert not pl.INPUT.MOSAIC_AND_MIXUP.ENABLE_MIXUP
    assert not pl.INPUT.DISTORTION.ENABLED
    # the source cfg is untouched
    assert cfg.INPUT.MOSAIC_AND_MIXUP.ENABLED


def test_plain_shards_are_unmosaicked(tmp_path):
    """Post-switch batches contain plain letterboxed images: the plain
    writer's mapper is deterministic (no stochastic geometry), so two
    differently-seeded mappers agree exactly on a record — while the
    geometry writer (mosaic on) produces differing composites."""
    import cv2

    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.data.mappers import YOLOXDatasetMapper
    from yolov7_d2_tpu.data.packed_cache import geometry_only_cfg, plain_cfg

    cfg = get_cfg()
    cfg.INPUT.INPUT_SIZE = [64, 64]
    cfg.INPUT.MOSAIC_AND_MIXUP.ENABLED = True
    cfg.INPUT.MOSAIC_AND_MIXUP.ENABLE_MIXUP = True
    cfg.INPUT.MOSAIC_AND_MIXUP.MOSAIC_WIDTH_RANGE = [64, 64]
    cfg.INPUT.MOSAIC_AND_MIXUP.MOSAIC_HEIGHT_RANGE = [64, 64]
    cfg.INPUT.DISTORTION.ENABLED = True
    cfg.freeze()

    rng = np.random.default_rng(3)
    records = []
    for i in range(6):
        img = rng.integers(0, 255, (48, 56, 3), np.uint8)
        path = str(tmp_path / f"im{i}.png")
        cv2.imwrite(path, img)
        records.append({
            "file_name": path, "height": 48, "width": 56, "image_id": i,
            "annotations": [{
                "bbox": [5.0, 5.0, 30.0, 30.0], "bbox_mode": 0,
                "category_id": 0, "iscrowd": 0,
            }],
        })

    a = YOLOXDatasetMapper(plain_cfg(cfg), is_train=True, seed=0)(
        dict(records[0]))
    b = YOLOXDatasetMapper(plain_cfg(cfg), is_train=True, seed=99)(
        dict(records[0]))
    np.testing.assert_array_equal(a["image"], b["image"])  # deterministic

    def run_geo(seed):
        m = YOLOXDatasetMapper(geometry_only_cfg(cfg), is_train=True,
                               seed=seed)
        out = None
        for r in records:        # fills the mosaic pool, then composites
            out = m(dict(r))
        return out["image"]

    assert not np.array_equal(run_geo(0), run_geo(99))     # stochastic
