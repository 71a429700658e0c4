import time

import cv2
import numpy as np
import pytest

from yolov7_d2_tpu.native import (
    letterbox_batch_u8,
    letterbox_u8,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_letterbox_matches_cv2_geometry():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (50, 100, 3), np.uint8)
    out, scale = letterbox_u8(img, (64, 64))
    assert out.shape == (64, 64, 3)
    assert scale == pytest.approx(0.64)
    # pad region gray
    assert out[40, 0].tolist() == [114, 114, 114]
    # resized content close to cv2 INTER_LINEAR
    ref = cv2.resize(img, (64, 32), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(
        out[:32, :64].astype(np.int32) - ref.astype(np.int32)
    )
    assert diff.mean() < 2.0
    assert np.percentile(diff, 99) <= 3


def test_batch_letterbox_consistent_with_single():
    rng = np.random.default_rng(1)
    imgs = [
        rng.integers(0, 255, (40 + 7 * i, 60 + 5 * i, 3), np.uint8)
        for i in range(6)
    ]
    batch, scales = letterbox_batch_u8(imgs, (64, 64), num_threads=4)
    assert batch.shape == (6, 64, 64, 3)
    for i, im in enumerate(imgs):
        single, s = letterbox_u8(im, (64, 64))
        np.testing.assert_array_equal(batch[i], single)
        assert scales[i] == pytest.approx(s)


def test_batch_letterbox_faster_than_python_loop():
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 255, (480, 640, 3), np.uint8) for _ in range(16)]
    # warm
    letterbox_batch_u8(imgs, (640, 640), num_threads=8)
    t0 = time.perf_counter()
    letterbox_batch_u8(imgs, (640, 640), num_threads=8)
    t_native = time.perf_counter() - t0
    # sanity bound: 16 VGA->640 letterboxes under 250 ms
    assert t_native < 0.25
