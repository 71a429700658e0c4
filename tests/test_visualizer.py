import numpy as np

from yolov7_d2_tpu.utils.visualizer import (
    draw_detections,
    draw_keypoints,
    draw_masks,
    vis_annos,
)


def test_draw_detections_modifies_pixels():
    img = np.zeros((64, 64, 3), np.uint8)
    out = draw_detections(
        img, np.array([[10, 10, 40, 40]]), np.array([0.9]), np.array([1])
    )
    assert out.shape == img.shape
    assert out.sum() > 0
    assert img.sum() == 0  # input untouched


def test_draw_masks_blends():
    img = np.full((32, 32, 3), 100, np.uint8)
    m = np.zeros((1, 32, 32), np.float32)
    m[0, 5:20, 5:20] = 1.0
    out = draw_masks(img, m)
    assert (out[10, 10] != img[10, 10]).any()
    np.testing.assert_array_equal(out[30, 30], img[30, 30])


def test_draw_keypoints():
    img = np.zeros((64, 64, 3), np.uint8)
    k = np.zeros((1, 17, 3), np.float32)
    k[0, :, 0] = 32; k[0, :, 1] = 32; k[0, :, 2] = 1.0
    out = draw_keypoints(img, k)
    assert out.sum() > 0


def test_vis_annos_sample():
    sample = {
        "image": np.full((64, 64, 3), 50, np.float32),
        "gt_boxes": np.array([[5, 5, 30, 30]], np.float32),
        "gt_classes": np.array([0], np.int32),
        "gt_valid": np.array([True]),
    }
    out = vis_annos(sample)
    assert out.shape == (64, 64, 3)
