"""YOLOMask / OrienMask — detection + orientation-field instance masks.

Parity with /root/reference/yolov7/modeling/meta_arch/yolomask.py:52
(``OrienHead:334``, ``OrienMaskYOLOLoss:431``, multi-scale loss :855,
``postprocess_yolomask`` utils/boxes.py:307-378): an anchor-based YOLO
detector plus a dense 2D *orientation field* at 1/4 resolution — each pixel
predicts an offset vector toward the center of the instance it belongs to;
a detection's mask is the set of pixels whose pointed-at location falls
inside its box.

TPU redesign: the mask-recovery test (pixel + vector inside box?) is one
broadcasted comparison per detection — [D, H/4, W/4] boolean tensor ops, no
per-instance loops. The orientation head consumes the detector's own neck
pyramid (P3/P4/P5), matching the reference's shared-FPN layout.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY
from yolov7_d2_tpu.models.layers.blocks import BaseConv
from yolov7_d2_tpu.models.meta_arch.yolov7 import AnchorYOLO
from yolov7_d2_tpu.models.necks.yolo_pafpn import upsample2x_nearest
from yolov7_d2_tpu.ops.losses import (
    masked_mean,
    sigmoid_binary_cross_entropy,
)
from yolov7_d2_tpu.structures.instances import Detections


class OrienHead(nn.Module):
    """Fuse the FPN pyramid up to 1/4 resolution -> per-scale, per-anchor
    offset fields (reference OrienHead:334: ``orien_m`` emits
    ``orien_dim = num_levels * na * 2`` channels at 1/4 input resolution,
    split per detection scale; each detection uses the field of ITS OWN
    anchor channel — yolomask.py:425-428, :526-533)."""

    up_channels: int = 64
    num_levels: int = 3
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        # feats: (P3 s8, P4 s16, P5 s32) -> all to s8, sum, then up to s4
        p3, p4, p5 = feats
        p4 = upsample2x_nearest(
            BaseConv(p3.shape[-1], 1, 1, dtype=self.dtype, name="lat4")(
                p4, train
            )
        )
        p5 = upsample2x_nearest(upsample2x_nearest(
            BaseConv(p3.shape[-1], 1, 1, dtype=self.dtype, name="lat5")(
                p5, train
            )
        ))
        x = p3 + p4 + p5
        x = BaseConv(self.up_channels, 3, 1, dtype=self.dtype, name="conv1")(
            x, train
        )
        x = upsample2x_nearest(x)
        x = BaseConv(self.up_channels, 3, 1, dtype=self.dtype, name="conv2")(
            x, train
        )
        # offset fields in units of the 1/4-res grid:
        # [B, Hq, Wq, L, na, 2], level order matching the detector levels
        dim = self.num_levels * self.num_anchors * 2
        y = nn.Conv(dim, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="orien_pred")(x).astype(jnp.float32)
        b, hq, wq, _ = y.shape
        return y.reshape(b, hq, wq, self.num_levels, self.num_anchors, 2)


class YOLOMask(nn.Module):
    """AnchorYOLO detector + OrienHead. Returns det outputs + orien field."""

    num_classes: int = 80
    up_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, jnp.ndarray]:
        det = AnchorYOLO(
            num_classes=self.num_classes, backbone_type="cspdarknet53",
            neck_type="pafpn", act="silu", return_pyramid=True,
            dtype=self.dtype, name="detector",
        )
        flat = det(images, train)
        # OrienHead taps the DETECTOR'S OWN neck pyramid (P3/P4/P5), as the
        # reference does (yolomask.py:52 feeds the YOLO FPN levels into
        # OrienHead:334) — shared features, no parallel stem.
        pyramid = flat.pop("pyramid")
        orien = OrienHead(self.up_channels, dtype=self.dtype, name="orien")(
            list(pyramid), train
        )
        flat["orien"] = orien   # [B, H/4, W/4, L, na, 2]
        return flat


def orien_loss(
    orien: jnp.ndarray,        # [B, Hq, Wq, 2] offset field (grid units)
    gt_masks: jnp.ndarray,     # [B, G, H, W] binary at input res
    gt_boxes: jnp.ndarray,     # [B, G, 4] xyxy input pixels
    gt_valid: jnp.ndarray,     # [B, G]
) -> jnp.ndarray:
    """Orientation loss (OrienMaskYOLOLoss flavor): inside each instance
    mask the field must point at the instance center; scale 4 = stride."""
    b, hq, wq, _ = orien.shape
    g = gt_masks.shape[1]
    masks_q = (
        jax.image.resize(gt_masks.astype(jnp.float32), (b, g, hq, wq),
                         "bilinear") > 0.5
    ).astype(jnp.float32)
    ys = (jnp.arange(hq, dtype=jnp.float32) + 0.5)
    xs = (jnp.arange(wq, dtype=jnp.float32) + 0.5)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    cx = (gt_boxes[..., 0] + gt_boxes[..., 2]) * 0.5 / 4.0  # grid units
    cy = (gt_boxes[..., 1] + gt_boxes[..., 3]) * 0.5 / 4.0
    # target offset for pixels of instance g: center - pixel
    tx = cx[:, :, None, None] - gx[None, None]
    ty = cy[:, :, None, None] - gy[None, None]
    pred = orien[:, None]                                   # [B, 1, Hq, Wq, 2]
    err = jnp.abs(pred[..., 0] - tx) + jnp.abs(pred[..., 1] - ty)
    w = masks_q * gt_valid[:, :, None, None].astype(jnp.float32)
    return masked_mean(err, w > 0)


def yolomask_recover_masks(
    dets: Detections, orien: jnp.ndarray, stride: int = 4
) -> jnp.ndarray:
    """Mask recovery: pixel p belongs to detection d iff p + offset(p)
    lands inside d's box (postprocess_yolomask semantics). Returns
    [B, D, Hq, Wq] float masks."""
    b, hq, wq, _ = orien.shape
    ys = (jnp.arange(hq, dtype=jnp.float32) + 0.5)
    xs = (jnp.arange(wq, dtype=jnp.float32) + 0.5)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    px = (gx[None] + orien[..., 0]) * stride               # [B, Hq, Wq]
    py = (gy[None] + orien[..., 1]) * stride
    boxes = dets.boxes                                      # [B, D, 4]
    inside = (
        (px[:, None] >= boxes[..., 0, None, None])
        & (px[:, None] <= boxes[..., 2, None, None])
        & (py[:, None] >= boxes[..., 1, None, None])
        & (py[:, None] <= boxes[..., 3, None, None])
    )
    return inside.astype(jnp.float32) * dets.valid[..., None, None]


@META_ARCH_REGISTRY.register(name="YOLOMask")
def build_yolomask(cfg, dtype: Optional[Any] = None):
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    return YOLOMask(
        num_classes=cfg.MODEL.YOLO.CLASSES,
        up_channels=cfg.MODEL.YOLO.ORIEN_HEAD.UP_CHANNELS,
        dtype=dtype,
    )


# ---------------------------------------------------------------------------
# Reference OrienMaskYOLOLoss (yolomask.py:431-851), TPU-native
# ---------------------------------------------------------------------------

def _smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def _ciou_loss_cxcywh(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """1 - CIoU on cxcywh boxes (Zheng et al. 2019), elementwise over the
    leading dims. NOTE: the reference imports ``ciou`` from the external
    ``alfred`` package, which is not importable in this environment (its
    own stubs set it to None) — this is the standard CIoU formula the
    alfred helper implements; the differential test mirrors the same
    formula into the alfred stub, so the box term is formula-pinned while
    every other term is a true differential. The reference also feeds this
    with OFFSET-SPACE 'boxes' (sigmoid-xy in [0,1], RAW wh that can be
    negative, yolomask.py:605-612) — kept verbatim."""
    eps = 1e-9
    px1, py1 = p[..., 0] - p[..., 2] / 2, p[..., 1] - p[..., 3] / 2
    px2, py2 = p[..., 0] + p[..., 2] / 2, p[..., 1] + p[..., 3] / 2
    tx1, ty1 = t[..., 0] - t[..., 2] / 2, t[..., 1] - t[..., 3] / 2
    tx2, ty2 = t[..., 0] + t[..., 2] / 2, t[..., 1] + t[..., 3] / 2
    iw = jnp.clip(jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1), min=0.0)
    ih = jnp.clip(jnp.minimum(py2, ty2) - jnp.maximum(py1, ty1), min=0.0)
    inter = iw * ih
    union = (p[..., 2] * p[..., 3] + t[..., 2] * t[..., 3] - inter)
    iou = inter / (union + eps)
    cw = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
    ch = jnp.maximum(py2, ty2) - jnp.minimum(py1, ty1)
    c2 = cw * cw + ch * ch + eps
    rho2 = ((t[..., 0] - p[..., 0]) ** 2 + (t[..., 1] - p[..., 1]) ** 2)
    v = (4.0 / jnp.pi**2) * (
        jnp.arctan(t[..., 2] / (t[..., 3] + eps))
        - jnp.arctan(p[..., 2] / (p[..., 3] + eps))
    ) ** 2
    alpha = jax.lax.stop_gradient(v / (1.0 - iou + v + eps))
    return 1.0 - (iou - rho2 / c2 - alpha * v)


def _yolomask_level_targets(
    raw_lvl: jnp.ndarray,       # [na, nH, nW, 5+C] raw head outputs, 1 image
    gt_cxcywh_px: jnp.ndarray,  # [G, 4] pixel cxcywh
    gt_classes: jnp.ndarray,    # [G]
    gt_valid: jnp.ndarray,      # [G]
    gt_masks: jnp.ndarray,      # [G, H, W] binary at input res
    anchors_all_px: jnp.ndarray,    # [LA, 2] all anchors, pixels
    anchor_mask: jnp.ndarray,       # [na] indices into anchors_all_px
    image_hw,
    center_region: float,
    valid_region: float,
    obj_ignore_threshold: float,
    label_smooth: float,
    num_classes: int,
):
    """build_targets (yolomask.py:675-851) for one image + one scale, on
    static shapes. Overlapping cell claims resolve last-gt-wins (the
    reference's sequential indexed writes); the orientation state is a
    lax.scan over gts in order, reproducing the overwrite (-1/target) and
    accumulate (+1/sum) semantics exactly."""
    na, nH, nW, _ = raw_lvl.shape
    img_h, img_w = image_hw
    G = gt_cxcywh_px.shape[0]
    scale_w, scale_h = img_w / nW, img_h / nH
    grid_anchors_all = anchors_all_px / jnp.asarray(
        [scale_w, scale_h], jnp.float32)
    grid_anchors = grid_anchors_all[anchor_mask]            # [na, 2]
    pixel_anchors = anchors_all_px[anchor_mask]

    # gt in grid units
    gxy = gt_cxcywh_px[:, 0:2] / jnp.asarray([scale_w, scale_h])
    gwh = gt_cxcywh_px[:, 2:4] / jnp.asarray([scale_w, scale_h])

    # anchor match over ALL anchors (anchor_ious, utils/boxes.py:420),
    # kept only when the argmax falls in this scale's anchor_mask
    inter = (jnp.minimum(gwh[:, None, 0], grid_anchors_all[None, :, 0])
             * jnp.minimum(gwh[:, None, 1], grid_anchors_all[None, :, 1]))
    union = (gwh[:, 0:1] * gwh[:, 1:2]
             + grid_anchors_all[None, :, 0] * grid_anchors_all[None, :, 1]
             - inter)
    match_index = jnp.argmax(inter / union, axis=1)         # [G]
    in_mask = jnp.any(match_index[:, None] == anchor_mask[None, :], axis=1)
    ok = in_mask & gt_valid
    match_anchor = jnp.argmax(
        (match_index[:, None] == anchor_mask[None, :]).astype(jnp.int32),
        axis=1)                                             # [G] in [0, na)

    gx_i = jnp.clip(jnp.floor(gxy[:, 0]), 0, nW - 1).astype(jnp.int32)
    gy_i = jnp.clip(jnp.floor(gxy[:, 1]), 0, nH - 1).astype(jnp.int32)

    # --- bbox target maps, winner = last gt in order (sequential writes)
    slot = (match_anchor * nH + gy_i) * nW + gx_i           # [G]
    S = na * nH * nW
    slot = jnp.where(ok, slot, S)
    winner = jnp.zeros((S + 1,), jnp.int32).at[slot].max(
        jnp.arange(1, G + 1, dtype=jnp.int32), mode="drop")[:S]
    w_gt = jnp.maximum(winner - 1, 0)                       # gt idx per slot
    pos = (winner > 0)
    txy_g = (gxy - jnp.stack([gx_i, gy_i], -1).astype(jnp.float32))  # [G,2]
    twh_g = jnp.log(gwh / grid_anchors[match_anchor] + 1e-16)
    scale_g = 2.0 - gwh[:, 0] * gwh[:, 1] / (nW * nH)

    pos_map = pos.reshape(na, nH, nW)
    txy = jnp.where(pos[..., None], txy_g[w_gt], 0.0).reshape(na, nH, nW, 2)
    twh = jnp.where(pos[..., None], twh_g[w_gt], 0.0).reshape(na, nH, nW, 2)
    tscale = jnp.where(pos, scale_g[w_gt], 0.0).reshape(na, nH, nW)
    tcls = jnp.full((S, num_classes), label_smooth)
    tcls = jnp.where(
        pos[:, None]
        & (jax.nn.one_hot(gt_classes[w_gt], num_classes) > 0),
        1.0 - label_smooth, tcls,
    ).reshape(na, nH, nW, num_classes)

    # --- neg/ignore mask: pred grid boxes vs gt grid boxes (bbox_ious2)
    pxy = jax.nn.sigmoid(raw_lvl[..., 0:2])
    pwh = raw_lvl[..., 2:4]
    mesh_y, mesh_x = jnp.meshgrid(
        jnp.arange(nH, dtype=jnp.float32),
        jnp.arange(nW, dtype=jnp.float32), indexing="ij")
    mesh = jnp.stack([mesh_x, mesh_y], -1)                  # [nH, nW, 2]
    pred_grid = jnp.concatenate([
        jax.lax.stop_gradient(pxy) + mesh[None],
        jnp.exp(jax.lax.stop_gradient(pwh)) * grid_anchors[:, None, None, :],
    ], -1)                                                   # [na,nH,nW,4]
    gt_grid = jnp.concatenate([gxy, gwh], -1)               # [G, 4]
    pg = pred_grid.reshape(-1, 4)
    ix1 = jnp.maximum(pg[:, None, 0] - pg[:, None, 2] / 2,
                      gt_grid[None, :, 0] - gt_grid[None, :, 2] / 2)
    ix2 = jnp.minimum(pg[:, None, 0] + pg[:, None, 2] / 2,
                      gt_grid[None, :, 0] + gt_grid[None, :, 2] / 2)
    iy1 = jnp.maximum(pg[:, None, 1] - pg[:, None, 3] / 2,
                      gt_grid[None, :, 1] - gt_grid[None, :, 3] / 2)
    iy2 = jnp.minimum(pg[:, None, 1] + pg[:, None, 3] / 2,
                      gt_grid[None, :, 1] + gt_grid[None, :, 3] / 2)
    inter2 = jnp.clip(ix2 - ix1, min=0) * jnp.clip(iy2 - iy1, min=0)
    union2 = (pg[:, 2] * pg[:, 3])[:, None] + (
        gt_grid[:, 2] * gt_grid[:, 3])[None] - inter2
    iou_pg = jnp.where(gt_valid[None, :], inter2 / union2, 0.0)
    is_ignore = jnp.any(iou_pg > obj_ignore_threshold, axis=1)
    neg_map = (~is_ignore.reshape(na, nH, nW)) & ~pos_map

    # --- orientation targets at full image res, lax.scan over gts in order
    H, W = int(img_h), int(img_w)
    mesh_py, mesh_px = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    mesh_pix = jnp.stack([mesh_px, mesh_py], -1)            # [H, W, 2]

    px_center = gxy * jnp.asarray([scale_w, scale_h])       # [G, 2] pixels
    valid_wh = (gwh * valid_region + 0.5) * jnp.asarray([scale_w, scale_h])
    center_wh = valid_wh / valid_region * center_region

    def body(state, inp):
        count, tsum = state
        ok_g, a_g, p_g, vwh_g, cwh_g, mask_g = inp
        offset = mesh_pix - p_g                             # [H, W, 2]
        x1 = jnp.round(jnp.clip(p_g[0] - vwh_g[0], 0, W - 1))
        x2 = jnp.round(jnp.clip(p_g[0] + vwh_g[0], 0, W - 1)) + 1
        y1 = jnp.round(jnp.clip(p_g[1] - vwh_g[1], 0, H - 1))
        y2 = jnp.round(jnp.clip(p_g[1] + vwh_g[1], 0, H - 1)) + 1
        is_roi = ((mesh_px >= x1) & (mesh_px < x2)
                  & (mesh_py >= y1) & (mesh_py < y2))
        a1h = (jnp.arange(count.shape[0]) == a_g)           # [na]
        upd_inst = (a1h[:, None, None]
                    & (is_roi & (mask_g > 0) & ok_g)[None])
        count = jnp.where(upd_inst, -1, count)
        tsum = jnp.where(upd_inst[..., None], offset[None], tsum)
        not_inst = (a1h[:, None, None]
                    & (is_roi & (mask_g == 0) & ok_g)[None]
                    & (count >= 0))
        count = count + not_inst.astype(jnp.int32)
        off_len = jnp.clip(jnp.abs(offset), min=1e-8)
        neg_scale = jnp.min(
            jnp.clip(cwh_g / off_len, min=1.0), axis=-1) - 1.0
        neg_off = neg_scale[..., None] * jnp.sign(offset) * off_len
        tsum = tsum + not_inst[..., None] * neg_off[None]
        return (count, tsum), None

    count0 = jnp.zeros((na, H, W), jnp.int32)
    tsum0 = jnp.zeros((na, H, W, 2), jnp.float32)
    (count, tsum), _ = jax.lax.scan(
        body, (count0, tsum0),
        (ok, match_anchor, px_center, valid_wh, center_wh,
         gt_masks.astype(jnp.float32)),
    )
    orien_pos = (count < 0)
    orien_neg = (count > 0)
    divisor = jnp.where(count == 0, 1000, count).astype(jnp.float32)
    torien = tsum / (pixel_anchors[:, None, None, :] / 2.0)
    torien = torien / divisor[..., None]

    return {
        "pos": pos_map, "neg": neg_map, "txy": txy, "twh": twh,
        "tscale": tscale, "tcls": tcls,
        "orien_pos": orien_pos, "orien_neg": orien_neg, "torien": torien,
    }


def yolomask_losses(
    flat: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    num_classes: int,
    anchors: "np.ndarray",          # [L, na, 2] pixel anchors, level order
    image_hw: Tuple[int, int],
    center_region: float = 0.6,
    valid_region: float = 0.6,
    obj_ignore_threshold: float = 0.5,
    label_smooth: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    """OrienMaskYOLOLoss summed over scales (yolomask.py:579-651 +
    the meta-arch's per-key sum :263-271): offset-space ciou box term
    (x1.2), split pos/neg objectness BCE, class BCE at positives, and
    smooth-l1 orientation terms normalized by their own pixel counts and
    rescaled by the scale's positive-box count (pos term x1.1); every sum
    is divided by the batch size, matching the reference exactly."""
    import numpy as np

    level_hw = flat["level_hw"]
    L = len(level_hw)
    na = np.asarray(anchors).shape[1]
    anchors_flat = jnp.asarray(
        np.asarray(anchors, np.float32).reshape(-1, 2))
    gt_boxes = batch["gt_boxes"]
    gt_cxcywh = jnp.concatenate(
        [(gt_boxes[..., 0:2] + gt_boxes[..., 2:4]) / 2,
         gt_boxes[..., 2:4] - gt_boxes[..., 0:2]], -1)
    B = gt_boxes.shape[0]
    nB = float(B)

    totals: Dict[str, jnp.ndarray] = {}
    off = 0
    for lvl, (nH, nW) in enumerate(level_hw):
        n_lvl = nH * nW * na
        raw = flat["outputs"][:, off:off + n_lvl].reshape(
            B, nH, nW, na, -1).transpose(0, 3, 1, 2, 4)     # [B,na,nH,nW,·]
        off += n_lvl
        anchor_mask = jnp.arange(lvl * na, (lvl + 1) * na)

        t = jax.vmap(
            lambda r, gb, gc, gv, gm: _yolomask_level_targets(
                r, gb, gc, gv, gm, anchors_flat, anchor_mask, image_hw,
                center_region, valid_region, obj_ignore_threshold,
                label_smooth, num_classes)
        )(raw, gt_cxcywh, batch["gt_classes"], batch["gt_valid"],
          batch["gt_masks"])

        pos = t["pos"].astype(jnp.float32)
        neg = t["neg"].astype(jnp.float32)
        pxy = jax.nn.sigmoid(raw[..., 0:2])
        pwh = raw[..., 2:4]
        pobj = raw[..., 4]
        pcls = raw[..., 5:]

        # box: offset-space ciou weighted by tgt_scale (yolomask.py:600-620)
        pboxes = jnp.concatenate([pxy, pwh], -1)
        tboxes = jnp.concatenate([t["txy"], t["twh"]], -1)
        lbox_map = _ciou_loss_cxcywh(pboxes, tboxes) * t["tscale"] * pos
        lbox_sum = jnp.sum(lbox_map)
        lbox = jnp.where(jnp.sum(pos) > 0, lbox_sum, 1e-8)

        obj_all = sigmoid_binary_cross_entropy(pobj, pos)
        cls_all = sigmoid_binary_cross_entropy(pcls, t["tcls"])

        pred_orien = flat["orien"][:, :, :, lvl]            # [B,Hq,Wq,na,2]
        b_, hq, wq = pred_orien.shape[:3]
        H, W = image_hw
        pred_full = jax.image.resize(
            pred_orien, (b_, H, W, na, 2), method="bilinear"
        ).transpose(0, 3, 1, 2, 4)                          # [B,na,H,W,2]
        l_or = _smooth_l1(pred_full - t["torien"])
        n_or_pos = jnp.sum(t["orien_pos"].astype(jnp.float32))
        n_or_neg = jnp.sum(t["orien_neg"].astype(jnp.float32))
        n_box_pos = jnp.sum(pos)
        l_or_pos = jnp.where(
            n_or_pos > 0,
            jnp.sum(l_or * t["orien_pos"][..., None].astype(jnp.float32))
            / jnp.maximum(n_or_pos, 1.0) * n_box_pos / nB, 0.0)
        l_or_neg = jnp.where(
            n_or_neg > 0,
            jnp.sum(l_or * t["orien_neg"][..., None].astype(jnp.float32))
            / jnp.maximum(n_or_neg, 1.0) * n_box_pos / nB, 0.0)

        items = {
            "loss_box": (lbox / nB) * 1.2,
            "loss_obj_pos": jnp.sum(obj_all * pos) / nB,
            "loss_obj_neg": jnp.sum(obj_all * neg) / nB,
            "loss_cls": jnp.sum(cls_all * pos[..., None]) / nB,
            "loss_orien_pos": l_or_pos * 1.1,
            "loss_orien_neg": l_or_neg,
        }
        for k, v in items.items():
            totals[k] = totals.get(k, 0.0) + v

    totals["total_loss"] = sum(
        v for k, v in totals.items() if k.startswith("loss_"))
    return totals
