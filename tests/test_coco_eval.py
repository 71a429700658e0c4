import numpy as np
import pytest

from yolov7_d2_tpu.evaluation.coco_eval import (
    COCOEvaluator,
    COCOMaskEvaluator,
    box_iou_matrix,
    polygons_to_mask,
)


def test_box_iou_matrix_crowd_semantics():
    dets = np.array([[0, 0, 10, 10]], float)
    gts = np.array([[0, 0, 20, 20]], float)
    plain = box_iou_matrix(dets, gts, np.array([False]))
    crowd = box_iou_matrix(dets, gts, np.array([True]))
    assert plain[0, 0] == pytest.approx(100 / 400)
    assert crowd[0, 0] == pytest.approx(1.0)  # fully inside crowd region


def test_perfect_predictions_give_ap_one():
    ev = COCOEvaluator(num_classes=2)
    rng = np.random.default_rng(0)
    for img in range(4):
        boxes = rng.uniform(0, 80, (3, 2))
        boxes = np.concatenate([boxes, boxes + 40], axis=1)
        classes = rng.integers(0, 2, 3)
        ev.add_gt(img, boxes, classes)
        ev.add_predictions(img, boxes, np.full(3, 0.9), classes)
    res = ev.evaluate()
    assert res["AP"] == pytest.approx(1.0, abs=1e-6)
    assert res["AP50"] == pytest.approx(1.0, abs=1e-6)


def test_no_predictions_gives_zero_ap():
    ev = COCOEvaluator(num_classes=1)
    ev.add_gt(0, np.array([[0, 0, 50, 50.0]]), np.array([0]))
    res = ev.evaluate()
    assert res["AP"] == 0.0


def test_false_positives_reduce_precision():
    ev = COCOEvaluator(num_classes=1)
    gt = np.array([[0, 0, 50, 50.0]])
    ev.add_gt(0, gt, np.array([0]))
    # one perfect hit + one high-scored false positive
    ev.add_predictions(
        0,
        np.array([[0, 0, 50, 50.0], [200, 200, 260, 260.0]]),
        np.array([0.8, 0.9]),
        np.array([0, 0]),
    )
    res = ev.evaluate()
    # FP ranked above TP: precision at recall=1 is 0.5
    assert res["AP50"] == pytest.approx(0.5, abs=0.02)


def test_localization_quality_affects_high_ious():
    ev = COCOEvaluator(num_classes=1)
    ev.add_gt(0, np.array([[0, 0, 100, 100.0]]), np.array([0]))
    # IoU ≈ 0.68 vs gt: counts at 0.5/0.65, misses at 0.75+
    ev.add_predictions(
        0, np.array([[0, 0, 100, 68.0]]), np.array([0.9]), np.array([0])
    )
    res = ev.evaluate()
    assert res["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert res["AP75"] == 0.0
    assert 0.2 < res["AP"] < 0.5


def test_area_binning():
    ev = COCOEvaluator(num_classes=1)
    small = np.array([[0, 0, 10, 10.0]])        # area 100 < 32²
    large = np.array([[0, 0, 200, 200.0]])      # area 40000 > 96²
    ev.add_gt(0, np.concatenate([small, large]), np.array([0, 0]))
    ev.add_predictions(
        0, np.concatenate([small, large]), np.array([0.9, 0.9]),
        np.array([0, 0]),
    )
    res = ev.evaluate()
    assert res["APs"] == pytest.approx(1.0, abs=1e-6)
    assert res["APl"] == pytest.approx(1.0, abs=1e-6)
    assert np.isnan(res["APm"])  # no medium gt anywhere


def test_crowd_gt_not_counted_as_fp_sink():
    ev = COCOEvaluator(num_classes=1)
    ev.add_gt(
        0,
        np.array([[0, 0, 50, 50.0], [100, 100, 300, 300.0]]),
        np.array([0, 0]),
        iscrowd=np.array([False, True]),
    )
    # det inside the crowd region is ignored, not a false positive
    ev.add_predictions(
        0,
        np.array([[0, 0, 50, 50.0], [120, 120, 180, 180.0]]),
        np.array([0.8, 0.9]),
        np.array([0, 0]),
    )
    res = ev.evaluate()
    assert res["AP50"] == pytest.approx(1.0, abs=1e-6)


def test_mask_evaluator_simple():
    ev = COCOMaskEvaluator(num_classes=1)
    m = np.zeros((64, 64), bool)
    m[10:40, 10:40] = True
    box = np.array([[10, 10, 40, 40.0]])
    ev.add_gt(0, box, np.array([0]), masks=[m])
    ev.add_predictions(0, box, np.array([0.9]), np.array([0]), masks=[m])
    res = ev.evaluate()
    assert res["AP"] == pytest.approx(1.0, abs=1e-6)


def test_polygons_to_mask():
    mask = polygons_to_mask([[0, 0, 20, 0, 20, 20, 0, 20]], 32, 32)
    assert mask.shape == (32, 32)
    assert mask[10, 10] and not mask[30, 30]
    assert 400 <= mask.sum() <= 450


def test_oks_matrix_perfect_and_offset():
    from yolov7_d2_tpu.evaluation.coco_eval import oks_matrix

    g = np.zeros((1, 17, 3))
    g[0, :, 0] = 50.0
    g[0, :, 1] = 50.0
    g[0, :5, 2] = 2.0  # 5 visible
    d_perfect = g.copy()
    d_off = g.copy()
    d_off[0, :, 0] += 30.0
    areas = np.array([1000.0])
    m = oks_matrix(np.concatenate([d_perfect, d_off]), g, areas)
    assert m.shape == (2, 1)
    assert m[0, 0] == pytest.approx(1.0)
    assert m[1, 0] < 0.5


def test_keypoint_evaluator_perfect_ap():
    from yolov7_d2_tpu.evaluation.coco_eval import COCOKeypointEvaluator

    ev = COCOKeypointEvaluator()
    kpts = np.zeros((2, 17, 3))
    kpts[:, :, 0] = np.array([[30.0], [90.0]])
    kpts[:, :, 1] = 40.0
    kpts[:, :, 2] = 2.0
    ev.add_gt_keypoints(0, kpts, areas=np.array([900.0, 900.0]))
    ev.add_pred_keypoints(0, kpts, scores=np.array([0.9, 0.8]))
    res = ev.evaluate()
    assert res["AP"] == pytest.approx(1.0, abs=1e-6)
