"""Semantics of the optimizer param-group machinery (ADVICE round-1 items).

The reference applies SOLVER.BACKBONE_MULTIPLIER as a per-param-group
LEARNING RATE (/root/reference/yolov7/optimizer/build.py:24-203 and
tools/train_detr.py:54-68). A gradient-side scale is normalized away by
adam — the multiplier must scale the final update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from yolov7_d2_tpu.config import get_cfg
from yolov7_d2_tpu.train.optimizer import build_optimizer


def _params():
    return {
        "backbone": {"kernel": jnp.ones((4, 4))},
        "head": {"kernel": jnp.ones((4, 4))},
    }


def _one_update(cfg, params, grads):
    tx = build_optimizer(cfg, params, lr_schedule=lambda s: 0.1)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    return updates


def test_backbone_multiplier_scales_update_under_adamw():
    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZER = "adamw"
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.BACKBONE_MULTIPLIER = 0.1
    params = _params()
    grads = jax.tree.map(jnp.ones_like, params)
    up = _one_update(cfg, params, grads)
    b = np.asarray(up["backbone"]["kernel"])[0, 0]
    h = np.asarray(up["head"]["kernel"])[0, 0]
    # identical grads -> adam yields identical magnitude; backbone must be
    # 0.1x the head update (would be 1.0x if scaled pre-adam)
    assert np.isclose(b / h, 0.1, atol=1e-5), (b, h)


def test_backbone_multiplier_scales_update_under_sgd():
    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZER = "sgd"
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.BACKBONE_MULTIPLIER = 0.5
    params = _params()
    grads = jax.tree.map(jnp.ones_like, params)
    up = _one_update(cfg, params, grads)
    b = np.asarray(up["backbone"]["kernel"])[0, 0]
    h = np.asarray(up["head"]["kernel"])[0, 0]
    assert np.isclose(b / h, 0.5, atol=1e-6)


def test_sgd_weight_decay_coupled_into_momentum():
    """torch.optim.SGD: buf = mom*buf + (grad + wd*param); update = -lr*buf.
    Run two steps with zero grads and nonzero params — with coupled decay the
    second step's update includes mom*wd*param carried in the buffer."""
    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZER = "sgd"
    cfg.SOLVER.WEIGHT_DECAY = 0.01
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.NESTEROV = False
    cfg.SOLVER.BACKBONE_MULTIPLIER = 1.0
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = False
    params = {"head": {"kernel": jnp.ones((2, 2))}}
    grads = jax.tree.map(jnp.zeros_like, params)
    tx = build_optimizer(cfg, params, lr_schedule=lambda s: 1.0)
    state = tx.init(params)
    up1, state = tx.update(grads, state, params)
    up2, state = tx.update(grads, state, params)
    u1 = float(np.asarray(up1["head"]["kernel"])[0, 0])
    u2 = float(np.asarray(up2["head"]["kernel"])[0, 0])
    # step1: buf = wd*p = .01 -> u1 = -.01
    assert np.isclose(u1, -0.01, atol=1e-8)
    # step2 coupled: buf = .9*.01 + .01 = .019 (decoupled SGDW would be -.01)
    assert np.isclose(u2, -0.019, atol=1e-8), u2


def test_train_step_rngs_seeded_and_distinct():
    """dropout/droppath streams derive from cfg.SEED and differ."""
    seed = 7
    k = jax.random.fold_in(jax.random.PRNGKey(seed), 3)
    k_do, k_dp = jax.random.split(k)
    assert not np.array_equal(np.asarray(k_do), np.asarray(k_dp))


def test_keypoint_hflip_indices_coco17():
    from yolov7_d2_tpu.data.mappers import keypoint_hflip_indices

    idx = keypoint_hflip_indices(17)
    # involution, identity on nose, swaps left/right eye
    assert np.array_equal(idx[idx], np.arange(17))
    assert idx[0] == 0 and idx[1] == 2 and idx[2] == 1
    assert idx[15] == 16 and idx[16] == 15
    # non-COCO skeleton: identity
    assert np.array_equal(keypoint_hflip_indices(5), np.arange(5))


def test_mapper_keypoint_flip_swaps_left_right(tmp_path):
    """A visible left-eye keypoint must land in the right-eye slot after a
    horizontal flip (and be mirrored in x)."""
    import cv2

    from yolov7_d2_tpu.config import get_cfg as gc
    from yolov7_d2_tpu.data.mappers import SimpleDatasetMapper

    cfg = gc()
    cfg.INPUT.INPUT_SIZE = [64, 64]
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.YOLO.KEYPOINTS_NUM = 17
    cfg.INPUT.RANDOM_FLIP_HORIZONTAL.ENABLED = True
    cfg.INPUT.RANDOM_FLIP_HORIZONTAL.PROB = 1.0

    img_path = str(tmp_path / "im.png")
    cv2.imwrite(img_path, np.zeros((64, 64, 3), np.uint8))
    kp = [0.0] * 51
    kp[3 * 1 : 3 * 1 + 3] = [10.0, 20.0, 2.0]  # left_eye at x=10
    record = {
        "file_name": img_path,
        "height": 64,
        "width": 64,
        "image_id": 0,
        "annotations": [
            {
                "bbox": [5, 5, 20, 20],
                "bbox_mode": 1,
                "category_id": 0,
                "keypoints": kp,
            }
        ],
    }
    mapper = SimpleDatasetMapper(cfg, is_train=True, with_keypoints=True)
    sample = mapper(record)
    k = sample["gt_keypoints"][0]
    assert k[1, 2] == 0.0  # left_eye slot now empty
    assert k[2, 2] == 2.0  # right_eye slot holds the flipped point
    assert np.isclose(k[2, 0], 64 - 10), k[2]
