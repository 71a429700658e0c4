"""SOLOv2 — grid-cell kernel-prediction instance segmentation.

Parity with /root/reference/yolov7/modeling/meta_arch/solov2.py:32,
head/solov2_head.py (``SOLOv2InsHead:21`` category+kernel towers with
coord-conv, ``SOLOv2MaskHead:161`` unified mask features), GT grid
assignment (``get_ground_truth:225``), dice loss (``loss:342``), and
matrix-NMS inference (:432-647 + utils/solov2_utils.py:142-232).

TPU redesign of the GT assignment: instead of per-gt python loops building
variable-length index lists, every (gt, grid-cell-in-center-region) pair
maps to one of a static ``G x 9`` candidate slots per level (the center
region at sigma=0.2 spans at most 3x3 cells), and kernels for those slots
are gathered + applied in one einsum.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY
from yolov7_d2_tpu.models.backbones.resnet import ResNet
from yolov7_d2_tpu.models.meta_arch.sparseinst import coord_features
from yolov7_d2_tpu.models.necks.fpn import FPN
from yolov7_d2_tpu.ops.losses import dice_loss, sigmoid_focal_loss
from yolov7_d2_tpu.ops.nms import matrix_nms_masks
from yolov7_d2_tpu.structures.instances import Detections


class SOLOv2InsHead(nn.Module):
    num_classes: int = 80
    num_kernels: int = 256
    channels: int = 512
    num_convs: int = 4
    use_dcn: bool = False   # USE_DCN_IN_INSTANCE (last tower conv is a DCN)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, grid: int, train: bool = False):
        """x: one FPN level; resized to (grid, grid) with coord channels."""
        b = x.shape[0]
        # reference solov2_head.py:132-143 APPENDS the coord channels (the
        # category tower then strips the LAST two channels after the resize)
        x = _coord_append(x)
        # antialias=False: torch F.interpolate(bilinear) does not antialias
        # on downscale (jax.image.resize does by default)
        x = jax.image.resize(
            x, (b, grid, grid, x.shape[-1]), "bilinear", antialias=False
        ).astype(self.dtype)
        cate = x[..., :-2]  # category tower runs without coords (reference)
        kernel = x
        for i in range(self.num_convs):
            last = i == self.num_convs - 1
            if self.use_dcn and last:
                from yolov7_d2_tpu.ops.deform_conv import DeformConv

                cate = DeformConv(self.channels, dtype=self.dtype,
                                  name=f"cate_dcn_{i}")(cate)
                kernel = DeformConv(self.channels, dtype=self.dtype,
                                    name=f"kernel_dcn_{i}")(kernel)
            else:
                cate = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name=f"cate_conv_{i}")(cate)
                kernel = nn.Conv(self.channels, (3, 3),
                                 padding=[(1, 1), (1, 1)],
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name=f"kernel_conv_{i}")(kernel)
            cate = nn.relu(
                nn.GroupNorm(num_groups=min(32, self.channels), epsilon=1e-5, dtype=jnp.float32,
                             name=f"cate_gn_{i}")(cate)
            ).astype(self.dtype)
            kernel = nn.relu(
                nn.GroupNorm(num_groups=min(32, self.channels), epsilon=1e-5, dtype=jnp.float32,
                             name=f"kernel_gn_{i}")(kernel)
            ).astype(self.dtype)
        cate_pred = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            bias_init=nn.initializers.constant(-4.6),  # prior_prob 0.01
            dtype=self.dtype, param_dtype=jnp.float32, name="cate_pred",
        )(cate)
        kernel_pred = nn.Conv(
            self.num_kernels, (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.dtype, param_dtype=jnp.float32, name="kernel_pred",
        )(kernel)
        return cate_pred.astype(jnp.float32), kernel_pred.astype(jnp.float32)


def _coord_append(x: jnp.ndarray) -> jnp.ndarray:
    """APPEND normalized (x, y) coordinate channels — the SOLOv2 order
    (reference solov2_head.py:142 ``cat([feat, cat([x, y], 1)], 1)``;
    SparseInst PREPENDS instead, see sparseinst.coord_features)."""
    b, h, w, _ = x.shape
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.broadcast_to(
        jnp.stack([xx, yy], axis=-1)[None], (b, h, w, 2)
    ).astype(x.dtype)
    return jnp.concatenate([x, coords], axis=-1)


class SOLOv2MaskHead(nn.Module):
    """Reference solov2_head.py:161: level i runs i conv-GN-relu +
    2x-bilinear-upsample stages (level 0: one conv, no upsample; level 3
    gets appended coords), the per-level outputs SUM at P2 resolution, and
    the prediction is 1x1 conv -> GN -> relu."""

    channels: int = 128
    num_masks: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        def conv_gn_relu(y, name):
            y = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"{name}_conv")(y)
            return nn.relu(
                nn.GroupNorm(num_groups=min(32, self.channels),
                             epsilon=1e-5, dtype=jnp.float32, name=f"{name}_gn")(y)
            ).astype(self.dtype)

        acc = conv_gn_relu(feats[0], "l0_c0")
        for i in range(1, len(feats)):
            y = feats[i] if i != 3 else _coord_append(feats[i])
            for j in range(i):
                y = conv_gn_relu(y, f"l{i}_c{j}")
                b_, h_, w_, c_ = y.shape
                y = jax.image.resize(
                    y, (b_, h_ * 2, w_ * 2, c_), "bilinear"
                ).astype(self.dtype)
            acc = acc + y
        x = nn.Conv(self.num_masks, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="pred_conv")(acc)
        x = nn.GroupNorm(num_groups=min(32, self.num_masks),
                         epsilon=1e-5, dtype=jnp.float32, name="pred_gn")(x)
        return nn.relu(x).astype(jnp.float32)


class SOLOv2(nn.Module):
    num_classes: int = 80
    num_grids: Sequence[int] = (40, 36, 24, 16, 12)
    num_kernels: int = 256
    instance_channels: int = 512
    mask_channels: int = 128
    resnet_depth: int = 50
    use_dcn_in_instance: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> Dict[str, Any]:
        mean = jnp.asarray([103.53, 116.28, 123.675])
        std = jnp.asarray([57.375, 57.12, 58.395])
        x = ((images - mean) / std).astype(self.dtype)
        feats = ResNet(
            depth=self.resnet_depth,
            out_features=("res2", "res3", "res4", "res5"),
            dtype=self.dtype, name="backbone",
        )(x, train)
        pyramid = FPN(out_channels=256, top_block="maxpool", dtype=self.dtype,
                      name="fpn")(
            [feats["res2"], feats["res3"], feats["res4"], feats["res5"]],
            train,
        )  # {p2..p6}
        pyramid = [pyramid[f"p{i}"] for i in range(2, 7)]
        ins_head = SOLOv2InsHead(
            num_classes=self.num_classes, num_kernels=self.num_kernels,
            channels=self.instance_channels,
            use_dcn=self.use_dcn_in_instance, dtype=self.dtype,
            name="ins_head",
        )
        cate_preds, kernel_preds = [], []
        for lvl, grid in enumerate(self.num_grids):
            c, k = ins_head(pyramid[lvl], grid, train)
            cate_preds.append(c)
            kernel_preds.append(k)
        mask_feats = SOLOv2MaskHead(
            channels=self.mask_channels, num_masks=self.num_kernels,
            dtype=self.dtype, name="mask_head",
        )(pyramid[:4], train)
        return {
            "cate_preds": cate_preds,       # per level [B, S, S, C]
            "kernel_preds": kernel_preds,   # per level [B, S, S, E]
            "mask_feats": mask_feats,       # [B, H/4, W/4, E]
        }


SCALE_RANGES = ((1, 96), (48, 192), (96, 384), (192, 768), (384, 2048))


def _level_targets(
    grid: int,
    scale_range: Tuple[int, int],
    input_hw: Tuple[int, int],
    gt_boxes: jnp.ndarray,    # [G, 4] xyxy input pixels
    gt_classes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    gt_centers: jnp.ndarray,  # [G, 2] (cx, cy) MASS centers, input pixels
    mask_valid: jnp.ndarray,  # [G] mask has any foreground
    sigma: float = 0.2,
):
    """Static targets for one level (get_ground_truth_single, solov2.py:238).

    Reference semantics kept exactly: the grid cell is chosen from the
    mask's MASS center (center_of_mass, utils/solov2_utils.py:128), the
    center region is mass-center +- sigma * box half-extents clipped to
    the 3x3 neighborhood of the center cell (:305-318), empty masks are
    skipped (:297 valid_mask_flag), and overlapping regions resolve
    last-gt-wins (sequential cate_label writes, :320)."""
    h, w = input_hw
    gw = gt_boxes[:, 2] - gt_boxes[:, 0]
    gh = gt_boxes[:, 3] - gt_boxes[:, 1]
    scale = jnp.sqrt(jnp.clip(gw * gh, min=0.0))
    in_range = (
        (scale >= scale_range[0]) & (scale <= scale_range[1])
        & gt_valid & mask_valid
    )
    cx, cy = gt_centers[:, 0], gt_centers[:, 1]
    half_w = 0.5 * gw * sigma
    half_h = 0.5 * gh * sigma

    # reference coordinate quantization: int((v / size) // (1. / grid))
    def _q(v, size):
        return jnp.floor((v / size) / (1.0 / grid)).astype(jnp.int32)

    ccx = _q(cx, w)
    ccy = _q(cy, h)
    top = jnp.maximum(jnp.maximum(0, _q(cy - half_h, h)), ccy - 1)
    down = jnp.minimum(jnp.minimum(grid - 1, _q(cy + half_h, h)), ccy + 1)
    left = jnp.maximum(jnp.maximum(0, _q(cx - half_w, w)), ccx - 1)
    right = jnp.minimum(jnp.minimum(grid - 1, _q(cx + half_w, w)), ccx + 1)

    G = gt_boxes.shape[0]
    offs = jnp.array([-1, 0, 1])
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    cand_y = ccy[:, None] + oy.reshape(-1)[None]      # [G, 9]
    cand_x = ccx[:, None] + ox.reshape(-1)[None]
    ok = (
        in_range[:, None]
        & (cand_y >= top[:, None]) & (cand_y <= down[:, None])
        & (cand_x >= left[:, None]) & (cand_x <= right[:, None])
    )
    flat = cand_y * grid + cand_x                      # [G, 9]
    S2 = grid * grid
    flat = jnp.where(ok, flat, S2)
    # last-write-wins over gt order == max gt index among writers
    winner = jnp.zeros((S2 + 1,), jnp.int32).at[flat.reshape(-1)].max(
        jnp.broadcast_to(
            jnp.arange(1, G + 1, dtype=jnp.int32)[:, None], (G, 9)
        ).reshape(-1),
        mode="drop",
    )[:S2]
    cate = jnp.where(
        winner > 0, gt_classes[jnp.maximum(winner - 1, 0)] + 1, 0)
    return {
        "cate_target": cate.reshape(grid, grid),       # 0 = bg, c+1 = class
        "pos_cell": flat.reshape(-1),                  # [G*9] (S2 = invalid)
        "pos_gt": jnp.broadcast_to(
            jnp.arange(G, dtype=jnp.int32)[:, None], (G, 9)
        ).reshape(-1),
        "pos_ok": ok.reshape(-1),
    }


def solov2_losses(
    out: Dict[str, Any],
    gt_masks: jnp.ndarray,      # [B, G, H, W] binary at input res
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    input_hw: Tuple[int, int],
    num_classes: int,
    num_grids: Sequence[int] = (40, 36, 24, 16, 12),
    focal_weight: float = 1.0,
    dice_weight: float = 3.0,
) -> Dict[str, jnp.ndarray]:
    mask_feats = out["mask_feats"]                      # [B, Hm, Wm, E]
    b, hm, wm, e = mask_feats.shape
    g = gt_masks.shape[1]
    # reference mask target (get_ground_truth_single:291-295): imrescale
    # to 1/output_stride with cv2 INTER_LINEAR on uint8 — for a binary
    # mask at exact 1/4 scale that is "value 1 iff >= 2 of the 2x2 taps
    # at offset (1,1) of each 4x4 block are 1" (cv2's fixed-point
    # round-half-up of the 4-tap average; verified against cv2 in
    # tests/test_torch_parity_losses.py)
    gm = gt_masks[:, :, : 4 * hm, : 4 * wm]
    taps = (
        gm[..., 1::4, 1::4] + gm[..., 1::4, 2::4]
        + gm[..., 2::4, 1::4] + gm[..., 2::4, 2::4]
    )
    gt_small = (taps >= 2).astype(jnp.float32)          # [B, G, Hm, Wm]

    # mass centers + empty-mask flags at the gt mask's own resolution
    # (center_of_mass, utils/solov2_utils.py:128)
    gmf = gt_masks.astype(jnp.float32)
    m00 = jnp.clip(jnp.sum(gmf, axis=(-2, -1)), min=1e-6)
    ys = jnp.arange(gt_masks.shape[2], dtype=jnp.float32)
    xs = jnp.arange(gt_masks.shape[3], dtype=jnp.float32)
    cx = jnp.sum(gmf * xs, axis=(-2, -1)) / m00
    cy = jnp.sum(gmf * ys[:, None], axis=(-2, -1)) / m00
    centers = jnp.stack([cx, cy], axis=-1)              # [B, G, 2]
    mask_valid = jnp.sum(gmf, axis=(-2, -1)) > 0

    # reference upsampled_size = mask_feat_size * 4 (:303)
    up_hw = (4 * hm, 4 * wm)

    total_pos = 0.0                       # positive CELLS (ins_ind flags)
    loss_cate_terms = []
    loss_dice_sum = 0.0
    pair_count = 0.0                      # dice samples = (gt, cell) pairs
    for lvl, grid in enumerate(num_grids):
        t = jax.vmap(
            lambda gb, gc, gv, ce, mv: _level_targets(
                grid, SCALE_RANGES[lvl], up_hw, gb, gc, gv, ce, mv
            )
        )(gt_boxes, gt_classes, gt_valid, centers, mask_valid)
        cate_pred = out["cate_preds"][lvl]              # [B, S, S, C]
        onehot = jax.nn.one_hot(
            t["cate_target"] - 1, num_classes
        ) * (t["cate_target"] > 0)[..., None]
        loss_cate_terms.append(
            jnp.sum(sigmoid_focal_loss(cate_pred, onehot))
        )
        total_pos = total_pos + jnp.sum(
            (t["cate_target"] > 0).astype(jnp.float32))

        # gather kernels for candidate cells, predict masks, dice vs gt
        kernels = out["kernel_preds"][lvl].reshape(b, grid * grid, e)
        cell = jnp.clip(t["pos_cell"], 0, grid * grid - 1)  # [B, G*9]
        sel_k = jnp.take_along_axis(kernels, cell[..., None], axis=1)
        pred_masks = jax.nn.sigmoid(
            jnp.einsum("bpe,bhwe->bphw", sel_k, mask_feats)
        )                                               # [B, G*9, Hm, Wm]
        tgt = jnp.take_along_axis(
            gt_small, t["pos_gt"][..., None, None], axis=1
        )
        okf = t["pos_ok"].astype(jnp.float32)
        # reference dice (loss/loss.py:7): 1 - 2a / (sum(p^2)+1e-3 +
        # sum(t^2)+1e-3), then a global MEAN over every (gt, cell) pair
        # across levels and images (solov2.py:385-393)
        p2 = pred_masks.reshape(b, -1, hm * wm)
        t2 = tgt.reshape(b, -1, hm * wm)
        a = jnp.sum(p2 * t2, -1)
        den = jnp.sum(p2 * p2, -1) + 0.001 + jnp.sum(t2 * t2, -1) + 0.001
        d = 1.0 - 2.0 * a / den
        loss_dice_sum = loss_dice_sum + jnp.sum(d * okf)
        pair_count = pair_count + jnp.sum(okf)

    num_pos = total_pos
    # cate normalizer is num_ins + 1 (solov2.py:418), NOT max(num_ins, 1)
    loss_cate = focal_weight * sum(loss_cate_terms) / (num_pos + 1.0)
    loss_mask = dice_weight * loss_dice_sum / jnp.maximum(pair_count, 1.0)
    return {
        "loss_cate": loss_cate,
        "loss_mask": loss_mask,
        "num_pos": num_pos,
        "total_loss": loss_cate + loss_mask,
    }


def _point_nms(heat: jnp.ndarray) -> jnp.ndarray:
    """point_nms (utils/solov2_utils.py:142): keep a cell's score iff it
    equals the max of the 2x2 window anchored one cell up-left (the torch
    max_pool2d(kernel=2, stride=1, padding=1)[:, :, :-1, :-1] slice).
    heat: [B, S, S, C] sigmoid scores."""
    hm = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 1, 1, 1),
        padding=((0, 0), (1, 0), (1, 0), (0, 0)))
    return heat * (hm == heat).astype(heat.dtype)


def solov2_postprocess(
    out: Dict[str, Any],
    score_thr: float = 0.1,
    mask_thr: float = 0.5,
    update_thr: float = 0.05,
    max_per_img: int = 100,
    nms_pre: int = 500,
    kernel: str = "gaussian",
    sigma: float = 2.0,
    instance_strides: Sequence[int] = (8, 8, 16, 32, 32),
) -> Detections:
    """Matrix-NMS inference, reference semantics (solov2.py:432-647 +
    the forward's point_nms, :188-197): per-level 2x2 point NMS on the
    sigmoided category maps; candidates are every (cell, CLASS) pair
    above score_thr (a cell can carry several classes); dynamic-conv
    masks; the sum_masks > stride area filter (:561); maskness
    rescoring; re-sort by the rescored score; matrix NMS; update_thr
    cut; final top-k. Static-shape deviation (documented): the
    candidate set is the top ``nms_pre`` (cell, class) pairs by point-
    NMS'd category score — the reference truncates to NMS_PRE only
    after maskness rescoring, so rankings can differ when more than
    nms_pre candidates clear score_thr. Masks return at mask-feature
    resolution; use ``solov2_upsample_masks`` for original-resolution
    binary masks + mask-derived boxes (the reference's two-stage
    interpolate + threshold, :624-647)."""
    mask_feats = out["mask_feats"]
    b, hm, wm, e = mask_feats.shape
    flat_scores, flat_kernels, stride_vec = [], [], []
    for lvl, (cate, kern) in enumerate(
            zip(out["cate_preds"], out["kernel_preds"])):
        s = _point_nms(jax.nn.sigmoid(cate))
        flat_scores.append(s.reshape(b, -1, s.shape[-1]))
        flat_kernels.append(kern.reshape(b, -1, e))
        n_cells = flat_scores[-1].shape[1]
        stride_vec.append(
            jnp.full((n_cells,), instance_strides[lvl], jnp.float32))
    scores = jnp.concatenate(flat_scores, axis=1)       # [B, A, C]
    kernels = jnp.concatenate(flat_kernels, axis=1)     # [B, A, E]
    strides_all = jnp.concatenate(stride_vec)           # [A]
    a_total, num_classes = scores.shape[1], scores.shape[2]

    # every (cell, class) pair is a candidate (reference inds nonzero)
    flat = jnp.where(scores > score_thr, scores, 0.0).reshape(b, -1)
    top_scores, top_idx = jax.lax.top_k(flat, nms_pre)  # [B, P]
    top_cell = top_idx // num_classes
    top_class = (top_idx % num_classes).astype(jnp.int32)
    top_kern = jnp.take_along_axis(kernels, top_cell[..., None], axis=1)
    masks = jax.nn.sigmoid(
        jnp.einsum("bpe,bhwe->bphw", top_kern, mask_feats)
    )
    binm = masks > mask_thr
    area = jnp.sum(binm, axis=(-2, -1)).astype(jnp.float32)
    # area filter: sum_masks > stride (solov2.py:561)
    cand_stride = strides_all[top_cell]
    top_scores = jnp.where(area > cand_stride, top_scores, 0.0)
    # maskness rescoring
    maskness = jnp.sum(masks * binm, axis=(-2, -1)) / jnp.maximum(area, 1.0)
    top_scores = top_scores * maskness

    def _one(m, bm, lbl, sc):
        # matrix NMS consumes candidates sorted by the RESCALED score
        # (the reference sorts after rescoring, :581-589)
        order = jax.lax.top_k(sc, sc.shape[0])[1]
        m, bm, lbl, sc = m[order], bm[order], lbl[order], sc[order]
        inter = jnp.einsum("phw,qhw->pq", bm.astype(jnp.float32),
                           bm.astype(jnp.float32))
        a = jnp.sum(bm, axis=(-2, -1)).astype(jnp.float32)
        union = a[:, None] + a[None, :] - inter
        ious = inter / jnp.maximum(union, 1.0)
        new_scores = matrix_nms_masks(ious, lbl, sc, kernel, sigma)
        new_scores = jnp.where(sc > 0, new_scores, 0.0)
        keep_scores, keep_idx = jax.lax.top_k(new_scores, max_per_img)
        return (
            m[keep_idx], lbl[keep_idx], keep_scores,
            keep_scores >= update_thr,
        )

    masks_out, classes_out, scores_out, valid = jax.vmap(_one)(
        masks, binm, top_class, top_scores
    )
    # mask-derived boxes at mask-feature resolution
    ys = jnp.arange(hm, dtype=jnp.float32)[None, None, :, None]
    xs = jnp.arange(wm, dtype=jnp.float32)[None, None, None, :]
    bm = masks_out > mask_thr
    big = 1e9
    x0 = jnp.min(jnp.where(bm, xs, big), axis=(-2, -1))
    y0 = jnp.min(jnp.where(bm, ys, big), axis=(-2, -1))
    x1 = jnp.max(jnp.where(bm, xs, -big), axis=(-2, -1)) + 1
    y1 = jnp.max(jnp.where(bm, ys, -big), axis=(-2, -1)) + 1
    any_px = jnp.any(bm, axis=(-2, -1))
    boxes = jnp.where(
        any_px[..., None], jnp.stack([x0, y0, x1, y1], -1), 0.0
    )
    return Detections(
        boxes=boxes,
        scores=jnp.where(valid & any_px, scores_out, 0.0),
        classes=classes_out.astype(jnp.int32),
        valid=valid & any_px,
        masks=masks_out,
    )


def solov2_upsample_masks(
    masks: jnp.ndarray,          # [P, Hm, Wm] sigmoid probabilities
    cur_hw: Tuple[int, int],     # network input size (h, w)
    ori_hw: Tuple[int, int],     # original image size
    mask_thr: float = 0.5,
):
    """Reference final resize chain (solov2.py:624-647): bilinear to
    (Hm*ratio, Wm*ratio) with ratio = ceil(h / Hm), crop to the current
    image size, bilinear to the original size, threshold. Returns
    (binary masks [P, oh, ow], mask-derived boxes xyxy [P, 4] — the
    reference's min/max WITHOUT +1)."""
    import math

    p, fh, fw = masks.shape
    h, w = cur_hw
    oh, ow = ori_hw
    ratio = math.ceil(h / fh)
    # antialias=False: torch F.interpolate(bilinear) does not antialias,
    # and the second stage is a DOWNSCALE where jax's default antialias
    # filter diverges from torch
    up = jax.image.resize(
        masks, (p, fh * ratio, fw * ratio), method="bilinear",
        antialias=False)[:, :h, :w]
    seg = jax.image.resize(up, (p, oh, ow), method="bilinear",
                           antialias=False)
    bm = seg > mask_thr
    ys = jnp.arange(oh, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(ow, dtype=jnp.float32)[None, None, :]
    big = 1e9
    x0 = jnp.min(jnp.where(bm, xs, big), axis=(-2, -1))
    y0 = jnp.min(jnp.where(bm, ys, big), axis=(-2, -1))
    x1 = jnp.max(jnp.where(bm, xs, -big), axis=(-2, -1))
    y1 = jnp.max(jnp.where(bm, ys, -big), axis=(-2, -1))
    any_px = jnp.any(bm, axis=(-2, -1))
    boxes = jnp.where(
        any_px[:, None], jnp.stack([x0, y0, x1, y1], -1), 0.0)
    return bm, boxes


@META_ARCH_REGISTRY.register(name="SOLOv2")
def build_solov2(cfg, dtype: Optional[Any] = None):
    dtype = dtype or (jnp.bfloat16 if cfg.SOLVER.AMP.ENABLED else jnp.float32)
    s = cfg.MODEL.SOLOV2
    return SOLOv2(
        num_classes=s.NUM_CLASSES,
        num_grids=tuple(s.NUM_GRIDS),
        num_kernels=s.NUM_KERNELS,
        instance_channels=s.INSTANCE_CHANNELS,
        mask_channels=s.MASK_CHANNELS,
        resnet_depth=cfg.MODEL.RESNETS.DEPTH,
        use_dcn_in_instance=s.USE_DCN_IN_INSTANCE,
        dtype=dtype,
    )
