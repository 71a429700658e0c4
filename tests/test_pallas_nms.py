import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov7_d2_tpu.ops.nms import nms as xla_nms
from yolov7_d2_tpu.ops.pallas_nms import pallas_batched_nms, pallas_nms


def _toy():
    boxes = jnp.array(
        [
            [0, 0, 10, 10], [1, 1, 11, 11],
            [50, 50, 60, 60], [51, 51, 61, 61],
            [100, 100, 110, 110],
            [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0],
        ],
        jnp.float32,
    )
    scores = jnp.array([0.9, 0.8, 0.7, 0.95, 0.6, 0.0, 0.0, 0.0])
    return boxes, scores


def test_pallas_nms_matches_xla():
    boxes, scores = _toy()
    pi, pv = pallas_nms(boxes, scores, 0.5, 8)
    xi, xv = xla_nms(boxes, scores, 0.5, 8)
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(xv))
    np.testing.assert_array_equal(
        np.asarray(pi)[np.asarray(pv)], np.asarray(xi)[np.asarray(xv)]
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_nms_random_agreement(seed):
    rng = np.random.default_rng(seed)
    n = 128
    centers = rng.uniform(20, 200, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1)
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
    pi, pv = pallas_nms(jnp.asarray(boxes, jnp.float32),
                        jnp.asarray(scores), 0.5, 32)
    xi, xv = xla_nms(jnp.asarray(boxes, jnp.float32),
                     jnp.asarray(scores), 0.5, 32)
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(xv))
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))


def test_pallas_batched_nms_class_aware():
    boxes = jnp.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 0, 0], [0, 0, 0, 0]],
        jnp.float32,
    )
    scores = jnp.array([0.9, 0.8, 0.0, 0.0])
    _, v_same = pallas_batched_nms(boxes, scores, jnp.array([0, 0, 0, 0]),
                                   0.5, 4)
    _, v_diff = pallas_batched_nms(boxes, scores, jnp.array([0, 1, 0, 0]),
                                   0.5, 4)
    assert int(v_same.sum()) == 1
    assert int(v_diff.sum()) == 2
