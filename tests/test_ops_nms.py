import jax
import jax.numpy as jnp
import numpy as np

from yolov7_d2_tpu.ops.nms import (
    batched_nms,
    cluster_nms,
    generalized_batched_nms,
    matrix_nms_masks,
    nms,
    soft_nms,
    weighted_boxes_fusion,
)


def _toy():
    # three clusters: two overlapping pairs + one isolated; padded to 8
    boxes = jnp.array(
        [
            [0, 0, 10, 10],
            [1, 1, 11, 11],     # overlaps box 0 heavily
            [50, 50, 60, 60],
            [51, 51, 61, 61],   # overlaps box 2 heavily
            [100, 100, 110, 110],
            [0, 0, 0, 0],
            [0, 0, 0, 0],
            [0, 0, 0, 0],
        ],
        jnp.float32,
    )
    scores = jnp.array([0.9, 0.8, 0.7, 0.95, 0.6, 0.0, 0.0, 0.0])
    return boxes, scores


def test_greedy_nms_suppresses_overlaps():
    boxes, scores = _toy()
    idx, valid = nms(boxes, scores, iou_threshold=0.5, max_outputs=8)
    kept = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == [0, 3, 4]  # one survivor per cluster, padding ignored


def test_nms_respects_score_order():
    boxes, scores = _toy()
    idx, valid = nms(boxes, scores, iou_threshold=0.5, max_outputs=8)
    kept = np.asarray(idx)[np.asarray(valid)]
    assert kept[0] == 3  # highest score first


def test_nms_is_jittable_static():
    boxes, scores = _toy()
    fn = jax.jit(lambda b, s: nms(b, s, 0.5, 8))
    idx, valid = fn(boxes, scores)
    assert idx.shape == (8,) and valid.shape == (8,)


def test_batched_nms_keeps_cross_class_overlaps():
    boxes = jnp.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 0, 0], [0, 0, 0, 0]], jnp.float32
    )
    scores = jnp.array([0.9, 0.8, 0.0, 0.0])
    same = jnp.array([0, 0, 0, 0])
    diff = jnp.array([0, 1, 0, 0])
    _, v_same = batched_nms(boxes, scores, same, 0.5, 4)
    _, v_diff = batched_nms(boxes, scores, diff, 0.5, 4)
    assert int(v_same.sum()) == 1
    assert int(v_diff.sum()) == 2  # different classes never suppress each other


def test_soft_nms_decays_rather_than_removes():
    boxes, scores = _toy()
    idx, valid, new_scores = soft_nms(
        boxes, scores, iou_threshold=0.5, max_outputs=8, method="gaussian",
        score_threshold=0.01,
    )
    kept = np.asarray(idx)[np.asarray(valid)]
    # overlapping boxes survive with decayed scores
    assert {0, 1, 2, 3, 4} <= set(kept.tolist())
    s = np.asarray(new_scores)[np.asarray(valid)]
    by_idx = dict(zip(kept.tolist(), s.tolist()))
    assert by_idx[1] < 0.8  # decayed below its raw score
    assert by_idx[2] < 0.7


def test_cluster_nms_matches_greedy_on_toy():
    boxes, scores = _toy()
    idx_c, valid_c = cluster_nms(boxes, scores, 0.5, 8)
    kept_c = sorted(np.asarray(idx_c)[np.asarray(valid_c)].tolist())
    assert kept_c == [0, 3, 4]


def test_generalized_dispatch():
    boxes, scores = _toy()
    classes = jnp.zeros((8,), jnp.int32)
    for t in ["normal", "softnms-linear", "softnms-gaussian", "cluster"]:
        idx, valid, out_scores = generalized_batched_nms(
            boxes, scores, classes, 0.5, 8, nms_type=t
        )
        assert idx.shape == (8,)
        assert int(valid.sum()) >= 3


def test_matrix_nms_decay_monotonic():
    # box 1 heavily overlaps higher-scored box 0 of same class -> decayed
    ious = jnp.array(
        [[1.0, 0.9, 0.0], [0.9, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    labels = jnp.array([1, 1, 2])
    scores = jnp.array([0.9, 0.8, 0.7])
    out = matrix_nms_masks(ious, labels, scores)
    out = np.asarray(out)
    assert out[0] == scores[0]          # top box untouched
    assert out[1] < 0.2                 # heavy same-class overlap decayed
    np.testing.assert_allclose(out[2], 0.7, rtol=1e-6)  # other class untouched


def test_wbf_fuses_cluster():
    boxes = jnp.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 0, 0], [0, 0, 0, 0]], jnp.float32
    )
    scores = jnp.array([0.6, 0.6, 0.0, 0.0])
    fused, fscores, valid = weighted_boxes_fusion(boxes, scores, 0.5, 4)
    assert int(valid.sum()) == 1
    np.testing.assert_allclose(np.asarray(fused[0]), [0.5, 0.5, 10.5, 10.5], atol=1e-4)
