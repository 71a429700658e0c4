"""Differential test: the vectorized SimOTA against an independent NumPy
oracle that follows the reference algorithm literally (per-gt loops,
argsort dynamic-k, min-cost conflict resolution — yolox_head.py
get_assignments:451/dynamic_k_matching:635)."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolov7_d2_tpu.models.heads.yolox_head import simota_assign


def simota_oracle(
    pred_xyxy, obj_logits, cls_logits, grids, strides,
    gt_xyxy, gt_classes, gt_valid,
    topk=10, center_radius=2.5,
):
    """Literal reference implementation in NumPy (slow, loopy, independent)."""

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    A = len(pred_xyxy)
    G = len(gt_xyxy)
    C = cls_logits.shape[1]
    centers = (grids + 0.5) * strides[:, None]

    in_box = np.zeros((G, A), bool)
    in_center = np.zeros((G, A), bool)
    for g in range(G):
        x0, y0, x1, y1 = gt_xyxy[g]
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        for a in range(A):
            px, py = centers[a]
            in_box[g, a] = x0 <= px <= x1 and y0 <= py <= y1
            r = center_radius * strides[a]
            in_center[g, a] = (
                cx - r <= px <= cx + r and cy - r <= py <= cy + r
            )
    candidate = (in_box | in_center) & gt_valid[:, None]
    both = in_box & in_center

    def iou(b1, b2):
        ix0, iy0 = max(b1[0], b2[0]), max(b1[1], b2[1])
        ix1, iy1 = min(b1[2], b2[2]), min(b1[3], b2[3])
        inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
        a1 = max(b1[2] - b1[0], 0) * max(b1[3] - b1[1], 0)
        a2 = max(b2[2] - b2[0], 0) * max(b2[3] - b2[1], 0)
        return inter / (a1 + a2 - inter + 1e-9)

    pair_iou = np.zeros((G, A))
    for g in range(G):
        if not gt_valid[g]:
            continue
        for a in range(A):
            pair_iou[g, a] = iou(gt_xyxy[g], pred_xyxy[a])

    joint = np.sqrt(sigmoid(cls_logits) * sigmoid(obj_logits)[:, None])
    joint = np.clip(joint, 1e-8, 1 - 1e-8)
    cost = np.zeros((G, A))
    for g in range(G):
        onehot = np.zeros(C)
        onehot[gt_classes[g]] = 1.0
        for a in range(A):
            bce = -(
                onehot * np.log(joint[a]) + (1 - onehot) * np.log(1 - joint[a])
            ).sum()
            cost[g, a] = (
                bce
                - 3.0 * np.log(pair_iou[g, a] + 1e-8)
                + 1e5 * (not both[g, a])
                + 1e6 * (not candidate[g, a])
            )

    matching = np.zeros((G, A), bool)
    for g in range(G):
        if not gt_valid[g]:
            continue
        cand_ious = np.where(candidate[g], pair_iou[g], 0.0)
        top = np.sort(cand_ious)[::-1][:topk]
        k = int(np.clip(int(top.sum()), 1, topk))
        order = np.argsort(cost[g])
        for a in order[:k]:
            if candidate[g, a]:
                matching[g, a] = True
    # conflict resolution: anchor keeps min-cost gt
    for a in range(A):
        gs = np.where(matching[:, a])[0]
        if len(gs) > 1:
            best = gs[np.argmin(cost[gs, a])]
            matching[:, a] = False
            matching[best, a] = True

    fg = matching.any(axis=0)
    matched = matching.argmax(axis=0)
    return fg, matched


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_vectorized_simota_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    # 4x4 stride-8 grid
    ys, xs = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    grids = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    strides = np.full(16, 8.0, np.float32)
    A, C, G = 16, 3, 4

    centers = (grids + 0.5) * 8 + rng.normal(0, 2, (A, 2))
    wh = rng.uniform(6, 14, (A, 2))
    pred = np.concatenate([centers - wh / 2, centers + wh / 2], 1)
    obj = rng.normal(0, 1, A).astype(np.float32)
    cls = rng.normal(0, 1, (A, C)).astype(np.float32)
    gt = np.zeros((G, 4), np.float32)
    gt_valid = np.zeros(G, bool)
    for g in range(2 + seed % 2):
        x0, y0 = rng.uniform(0, 16, 2)
        w, h = rng.uniform(6, 14, 2)
        gt[g] = [x0, y0, x0 + w, y0 + h]
        gt_valid[g] = True
    gt_cls = rng.integers(0, C, G).astype(np.int32)

    fg_o, matched_o = simota_oracle(
        pred, obj, cls, grids, strides, gt, gt_cls, gt_valid
    )
    pred_cxcywh = np.concatenate(
        [(pred[:, :2] + pred[:, 2:]) / 2, pred[:, 2:] - pred[:, :2]], axis=1
    )
    out = simota_assign(
        jnp.asarray(pred_cxcywh),
        jnp.asarray(obj), jnp.asarray(cls),
        jnp.asarray(grids), jnp.asarray(strides),
        jnp.asarray(gt), jnp.asarray(gt_cls), jnp.asarray(gt_valid),
    )
    fg_v = np.asarray(out["fg_mask"])
    matched_v = np.asarray(out["matched_gt"])
    np.testing.assert_array_equal(fg_v, fg_o, err_msg=f"seed {seed}")
    np.testing.assert_array_equal(
        matched_v[fg_v], matched_o[fg_o], err_msg=f"seed {seed}"
    )
