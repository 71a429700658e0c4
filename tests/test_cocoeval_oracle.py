"""Differential test: clean-room COCO evaluator vs a literal pycocotools
port (VERDICT round-2 item 2).

tests/_cocoeval_oracle.py transcribes pycocotools COCOeval's
evaluateImg/accumulate/summarize exactly; randomized scenes exercise
crowds, area-based ignores, score ties, area boundaries, and detections
without gts. Any semantic drift in evaluation/coco_eval.py fails here.
"""

import numpy as np
import pytest

from _cocoeval_oracle import COCOevalOracle

from yolov7_d2_tpu.evaluation.coco_eval import (
    COCOEvaluator,
    COCOMaskEvaluator,
)

METRICS = ("AP", "AP50", "AP75", "APs", "APm", "APl", "AR100")


def _random_scene(rng, num_images=4, num_classes=3, crowd_prob=0.2,
                  tie_scores=True, max_gt=6, max_det=10, img_size=200.0):
    """Random boxes clustered so dets actually overlap gts; areas span the
    small/medium/large boundaries; scores drawn from a tiny discrete set to
    force ties."""
    gts, dts = [], []
    gid, did = 1, 1
    for img in range(num_images):
        n_gt = rng.integers(0, max_gt + 1)
        gt_boxes = []
        for _ in range(n_gt):
            # log-uniform sizes crossing 32^2 / 96^2 area boundaries
            w = float(np.exp(rng.uniform(np.log(8), np.log(150))))
            h = float(np.exp(rng.uniform(np.log(8), np.log(150))))
            x = float(rng.uniform(0, img_size - 10))
            y = float(rng.uniform(0, img_size - 10))
            box = [x, y, w, h]
            gt_boxes.append(box)
            gts.append({
                "id": gid, "image_id": img,
                "category_id": int(rng.integers(0, num_classes)),
                "bbox": box, "area": w * h,
                "iscrowd": int(rng.random() < crowd_prob),
            })
            gid += 1
        n_det = rng.integers(0, max_det + 1)
        for d in range(n_det):
            if gt_boxes and rng.random() < 0.7:
                # jittered copy of a gt box (overlap-rich)
                bx = gt_boxes[rng.integers(0, len(gt_boxes))]
                jitter = rng.normal(0, 0.15, 4)
                box = [bx[0] + jitter[0] * bx[2], bx[1] + jitter[1] * bx[3],
                       max(bx[2] * (1 + jitter[2]), 2.0),
                       max(bx[3] * (1 + jitter[3]), 2.0)]
            else:
                box = [float(rng.uniform(0, img_size - 10)),
                       float(rng.uniform(0, img_size - 10)),
                       float(rng.uniform(4, 120)),
                       float(rng.uniform(4, 120))]
            score = (
                float(rng.choice([0.3, 0.5, 0.7, 0.9]))   # forced ties
                if tie_scores else float(rng.random())
            )
            dts.append({
                "id": did, "image_id": img,
                "category_id": int(rng.integers(0, num_classes)),
                "bbox": [float(v) for v in box], "score": score,
            })
            did += 1
    return gts, dts


def _xywh_to_xyxy(b):
    return np.array([b[0], b[1], b[0] + b[2], b[1] + b[3]])


def _run_ours_bbox(gts, dts, num_images, num_classes):
    ev = COCOEvaluator(num_classes, iou_type="bbox")
    for img in range(num_images):
        g = [x for x in gts if x["image_id"] == img]
        d = [x for x in dts if x["image_id"] == img]
        ev.add_gt(
            img,
            np.stack([_xywh_to_xyxy(x["bbox"]) for x in g])
            if g else np.zeros((0, 4)),
            np.array([x["category_id"] for x in g], np.int64),
            iscrowd=np.array([x["iscrowd"] for x in g], bool),
            areas=np.array([x["area"] for x in g]),
        )
        ev.add_predictions(
            img,
            np.stack([_xywh_to_xyxy(x["bbox"]) for x in d])
            if d else np.zeros((0, 4)),
            np.array([x["score"] for x in d]),
            np.array([x["category_id"] for x in d], np.int64),
        )
    return ev.evaluate()


@pytest.mark.parametrize("seed", range(6))
def test_bbox_metrics_match_pycocotools_semantics(seed):
    rng = np.random.default_rng(seed)
    num_images, num_classes = 4, 3
    gts, dts = _random_scene(rng, num_images, num_classes)
    oracle = COCOevalOracle(gts, dts, range(num_images), range(num_classes),
                            iouType="bbox").summarize()
    ours = _run_ours_bbox(gts, dts, num_images, num_classes)
    for m in METRICS:
        if np.isnan(oracle[m]):
            assert np.isnan(ours[m]), (m, oracle[m], ours[m])
        else:
            np.testing.assert_allclose(
                ours[m], oracle[m], atol=1e-9,
                err_msg=f"seed {seed}: metric {m} diverges from "
                        f"pycocotools semantics")


def test_bbox_edge_cases_match():
    """Dets with no gts in their class, images with only crowds, exact
    area-boundary gts, and all-tied scores."""
    gts = [
        # exact small/medium boundary (area == 1024)
        {"id": 1, "image_id": 0, "category_id": 0,
         "bbox": [10, 10, 32, 32], "area": 1024.0, "iscrowd": 0},
        # exact medium/large boundary (area == 9216)
        {"id": 2, "image_id": 0, "category_id": 0,
         "bbox": [60, 60, 96, 96], "area": 9216.0, "iscrowd": 0},
        # crowd-only image
        {"id": 3, "image_id": 1, "category_id": 1,
         "bbox": [0, 0, 50, 50], "area": 2500.0, "iscrowd": 1},
    ]
    dts = [
        {"id": 1, "image_id": 0, "category_id": 0,
         "bbox": [11, 11, 31, 31], "score": 0.5},
        {"id": 2, "image_id": 0, "category_id": 0,
         "bbox": [61, 59, 95, 97], "score": 0.5},   # tie
        {"id": 3, "image_id": 1, "category_id": 1,
         "bbox": [5, 5, 40, 40], "score": 0.9},     # matches crowd only
        {"id": 4, "image_id": 1, "category_id": 2,
         "bbox": [100, 100, 20, 20], "score": 0.8},  # class with no gt
    ]
    oracle = COCOevalOracle(gts, dts, range(2), range(3),
                            iouType="bbox").summarize()
    ours = _run_ours_bbox(gts, dts, 2, 3)
    for m in METRICS:
        if np.isnan(oracle[m]):
            assert np.isnan(ours[m]), (m, oracle[m], ours[m])
        else:
            np.testing.assert_allclose(ours[m], oracle[m], atol=1e-9,
                                       err_msg=m)


def _rect_mask(h, w, box):
    m = np.zeros((h, w), bool)
    x0, y0, bw, bh = [int(round(v)) for v in box]
    m[max(y0, 0): y0 + bh, max(x0, 0): x0 + bw] = True
    return m


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_segm_metrics_match_pycocotools_semantics(seed):
    """Mask IoU path incl. the det-area-from-mask ignore rule."""
    rng = np.random.default_rng(100 + seed)
    num_images, num_classes = 3, 2
    H = W = 160
    gts, dts = _random_scene(rng, num_images, num_classes, max_gt=4,
                             max_det=6, img_size=120.0)
    for g in gts:
        g["segmentation"] = _rect_mask(H, W, g["bbox"])
        g["area"] = float(np.count_nonzero(g["segmentation"]))
    for d in dts:
        d["segmentation"] = _rect_mask(H, W, d["bbox"])

    oracle = COCOevalOracle(gts, dts, range(num_images), range(num_classes),
                            iouType="segm").summarize()

    ev = COCOMaskEvaluator(num_classes)
    for img in range(num_images):
        g = [x for x in gts if x["image_id"] == img]
        d = [x for x in dts if x["image_id"] == img]
        ev.add_gt(
            img,
            np.stack([_xywh_to_xyxy(x["bbox"]) for x in g])
            if g else np.zeros((0, 4)),
            np.array([x["category_id"] for x in g], np.int64),
            iscrowd=np.array([x["iscrowd"] for x in g], bool),
            areas=np.array([x["area"] for x in g]),
            masks=[x["segmentation"] for x in g],
        )
        ev.add_predictions(
            img,
            np.stack([_xywh_to_xyxy(x["bbox"]) for x in d])
            if d else np.zeros((0, 4)),
            np.array([x["score"] for x in d]),
            np.array([x["category_id"] for x in d], np.int64),
            masks=[x["segmentation"] for x in d],
        )
    ours = ev.evaluate()
    for m in METRICS:
        if np.isnan(oracle[m]):
            assert np.isnan(ours[m]), (m, oracle[m], ours[m])
        else:
            np.testing.assert_allclose(
                ours[m], oracle[m], atol=1e-9,
                err_msg=f"seed {seed}: segm metric {m} diverges")


# ---------------------------------------------------------------------------
# segm (mask IoU) differential
# ---------------------------------------------------------------------------

def _random_mask_scene(rng, num_images=3, num_classes=2, hw=96):
    """Random blob masks; gt mask/bbox consistent; some crowds."""
    gts, dts = [], []
    gid = did = 1
    for img in range(num_images):
        for _ in range(int(rng.integers(1, 5))):
            x, y = rng.integers(0, hw - 40, 2)
            w, h = rng.integers(8, 40, 2)
            m = np.zeros((hw, hw), bool)
            m[y:y + h, x:x + w] = True
            gts.append({
                "id": gid, "image_id": img,
                "category_id": int(rng.integers(0, num_classes)),
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(m.sum()),
                "iscrowd": int(rng.random() < 0.2),
                "segmentation": m,
            })
            gid += 1
        for _ in range(int(rng.integers(1, 7))):
            x, y = rng.integers(0, hw - 40, 2)
            w, h = rng.integers(8, 40, 2)
            m = np.zeros((hw, hw), bool)
            m[y:y + h, x:x + w] = True
            dts.append({
                "id": did, "image_id": img,
                "category_id": int(rng.integers(0, num_classes)),
                "bbox": [float(x), float(y), float(w), float(h)],
                "score": float(rng.random()),
                "segmentation": m,
            })
            did += 1
    return gts, dts


@pytest.mark.parametrize("seed", range(4))
def test_segm_metrics_match_pycocotools_semantics(seed):
    from yolov7_d2_tpu.evaluation.coco_eval import COCOMaskEvaluator

    rng = np.random.default_rng(100 + seed)
    num_images, num_classes = 3, 2
    gts, dts = _random_mask_scene(rng, num_images, num_classes)
    oracle = COCOevalOracle(gts, dts, range(num_images), range(num_classes),
                            iouType="segm").summarize()
    ev = COCOMaskEvaluator(num_classes)
    for img in range(num_images):
        g = [x for x in gts if x["image_id"] == img]
        d = [x for x in dts if x["image_id"] == img]
        ev.add_gt(
            img,
            np.stack([_xywh_to_xyxy(x["bbox"]) for x in g])
            if g else np.zeros((0, 4)),
            np.array([x["category_id"] for x in g], np.int64),
            iscrowd=np.array([x["iscrowd"] for x in g], bool),
            areas=np.array([x["area"] for x in g]),
            masks=[x["segmentation"] for x in g],
        )
        ev.add_predictions(
            img,
            np.stack([_xywh_to_xyxy(x["bbox"]) for x in d])
            if d else np.zeros((0, 4)),
            np.array([x["score"] for x in d]),
            np.array([x["category_id"] for x in d], np.int64),
            masks=[x["segmentation"] for x in d],
        )
    ours = ev.evaluate()
    for m in METRICS:
        if np.isnan(oracle[m]):
            assert np.isnan(ours[m]), (m, oracle[m], ours[m])
        else:
            np.testing.assert_allclose(
                ours[m], oracle[m], atol=1e-9,
                err_msg=f"seed {seed}: segm metric {m} diverges")


# ---------------------------------------------------------------------------
# keypoints (OKS) differential
# ---------------------------------------------------------------------------

def _random_kpt_scene(rng, num_images=3, P=17):
    """Person keypoints: GT kpts near a box, some fully-invisible GTs
    (exercising the vicinity-box OKS fallback), crowd flags, det kpts as
    jittered GT or random noise."""
    gts, dts = [], []
    gid = did = 1
    for img in range(num_images):
        boxes = []
        for _ in range(int(rng.integers(1, 4))):
            x, y = rng.uniform(10, 200, 2)
            w, h = rng.uniform(30, 120, 2)
            kp = np.zeros((P, 3))
            kp[:, 0] = rng.uniform(x, x + w, P)
            kp[:, 1] = rng.uniform(y, y + h, P)
            vis = (rng.random(P) < 0.7).astype(float) * 2
            if rng.random() < 0.25:
                vis[:] = 0.0           # fully unannotated person
            kp[:, 2] = vis
            boxes.append((x, y, w, h, kp))
            gts.append({
                "id": gid, "image_id": img, "category_id": 0,
                "bbox": [x, y, w, h], "area": float(w * h),
                "iscrowd": int(rng.random() < 0.15),
                "keypoints": [float(v) for v in kp.reshape(-1)],
            })
            gid += 1
        for _ in range(int(rng.integers(1, 6))):
            if boxes and rng.random() < 0.7:
                x, y, w, h, kp0 = boxes[int(rng.integers(0, len(boxes)))]
                kp = kp0.copy()
                kp[:, 0] += rng.normal(0, 0.05 * w, P)
                kp[:, 1] += rng.normal(0, 0.05 * h, P)
            else:
                kp = np.zeros((P, 3))
                kp[:, 0] = rng.uniform(0, 300, P)
                kp[:, 1] = rng.uniform(0, 300, P)
            kp[:, 2] = rng.random(P)
            dts.append({
                "id": did, "image_id": img, "category_id": 0,
                "score": float(rng.random()),
                "keypoints": [float(v) for v in kp.reshape(-1)],
            })
            did += 1
    return gts, dts


@pytest.mark.parametrize("seed", range(4))
def test_keypoint_metrics_match_pycocotools_semantics(seed):
    from yolov7_d2_tpu.evaluation.coco_eval import COCOKeypointEvaluator

    rng = np.random.default_rng(200 + seed)
    num_images = 3
    gts, dts = _random_kpt_scene(rng, num_images)
    oracle = COCOevalOracle(gts, dts, range(num_images), [0],
                            iouType="keypoints").summarize()
    ev = COCOKeypointEvaluator(num_classes=1)
    for img in range(num_images):
        g = [x for x in gts if x["image_id"] == img]
        d = [x for x in dts if x["image_id"] == img]
        if g:
            ev.add_gt_keypoints(
                img,
                np.stack(
                    [np.array(x["keypoints"]).reshape(-1, 3) for x in g]
                ),
                areas=np.array([x["area"] for x in g]),
                boxes=np.stack([np.array(x["bbox"]) for x in g]),
                iscrowd=np.array([x["iscrowd"] for x in g], bool),
            )
        if d:
            ev.add_pred_keypoints(
                img,
                np.stack(
                    [np.array(x["keypoints"]).reshape(-1, 3) for x in d]
                ),
                scores=np.array([x["score"] for x in d]),
            )
    ours = ev.evaluate()
    for m in ("AP", "AP50", "AP75", "APm", "APl", "AR100"):
        if np.isnan(oracle[m]):
            assert np.isnan(ours[m]), (m, oracle[m], ours[m])
        else:
            np.testing.assert_allclose(
                ours[m], oracle[m], atol=1e-9,
                err_msg=f"seed {seed}: keypoint metric {m} diverges")
