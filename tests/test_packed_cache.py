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
