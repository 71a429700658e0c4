"""Device-side mosaic + perspective + mixup + HSV augmentation (fused).

TPU-native replacement for the host worker aug chain of the reference's
``MyDatasetMapper2`` (/root/reference/yolov7/data/dataset_mapper.py:339-597):
mosaic4 -> random_perspective (data_augment.py:31) -> MixUp
(dataset_mapper.py:686-767) -> HSV distortion
(transforms/transform.py:250) -> hflip. The host pipeline tops out at
~40 img/s/core doing this in numpy/cv2 (docs/PERF.md "Host input
pipeline"); here the host only decodes + aspect-resizes each image once
(``TileDatasetMapper``) and ships uint8 tiles; every geometric/photometric
op runs inside the jitted train step on device.

Design (no 2S x 2S canvas is ever materialized): the mosaic paste and the
perspective warp compose into ONE gather. For each output pixel p the
inverse warp M^-1 p gives canvas coordinates; the mosaic center (xc, yc)
selects which of the four source tiles owns that canvas point; the tile's
paste offset + scale map canvas coords into the tile, and a single
bilinear gather from the (uint8, device-resident) tile pool produces the
pixel. Boxes ride the same transforms analytically. Everything is
static-shape: box lists live in fixed [M] slots with validity masks, and
the 4M mosaic + M mixup slots are packed valid-first into the final [K]
slots (the host path's ``densify`` truncation semantics).

Known deviations from the host/cv2 chain (documented, tested to
tolerance in tests/test_device_aug.py):
  * tiles are pre-resized once to fit (S, S) on the host, then rescaled
    to the (random) mosaic canvas size on device -> two bilinear
    resamples where the host does one;
  * mixup/mosaic sub-image sizes stay float (host truncates to int after
    cv2.resize);
  * HSV runs in float (host round-trips through uint8 HSV).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

GRAY = 114.0


# ---------------------------------------------------------------------------
# parameter sampling (separated from the deterministic kernels so tests can
# drive the kernels with hand-built params)
# ---------------------------------------------------------------------------


class AugParams(NamedTuple):
    """Per-sample random draws, each shaped [B] (or [B, k])."""

    tile_idx: jnp.ndarray  # [B, 4] int32 indices into the batch pool
    canvas_hw: jnp.ndarray  # [B, 2] float (ch, cw) HALF canvas dims
    center_yx: jnp.ndarray  # [B, 2] float mosaic center in canvas coords
    angle: jnp.ndarray  # [B] degrees
    pscale: jnp.ndarray  # [B] perspective scale
    shear: jnp.ndarray  # [B, 2] shear degrees (x, y)
    translate: jnp.ndarray  # [B, 2] T fractions (tx, ty) of out size
    persp: jnp.ndarray  # [B, 2] perspective terms (px, py)
    do_mixup: jnp.ndarray  # [B] bool
    mix_idx: jnp.ndarray  # [B] int32 partner index
    mix_jit: jnp.ndarray  # [B] mixup scale jitter
    mix_flip: jnp.ndarray  # [B] bool
    dhue: jnp.ndarray  # [B]
    dsat: jnp.ndarray  # [B]
    dexp: jnp.ndarray  # [B]
    do_hflip: jnp.ndarray  # [B] bool


def sample_params(
    rng: jax.Array,
    batch: int,
    *,
    hrange: Tuple[float, float],
    wrange: Tuple[float, float],
    degrees: float,
    translate: float,
    scale: Tuple[float, float],
    shear: float,
    perspective: float,
    enable_mixup: bool,
    mixup_scale: Tuple[float, float],
    hue: float,
    saturation: float,
    exposure: float,
    flip_prob: float,
) -> AugParams:
    """Draw every random parameter for a batch (mirrors the host rng draws:
    mappers.py:313-352 + augment.py random_perspective/mixup/hsv_distort)."""
    ks = jax.random.split(rng, 16)
    u = functools.partial(jax.random.uniform, shape=(batch,))

    # mosaic: 3 partners w/o replacement per sample (host: rng.choice over
    # the pool, dataset_mapper.py analogue mappers.py:321)
    perm_keys = jax.random.split(ks[0], batch)
    others = jax.vmap(
        lambda k: jax.random.choice(k, batch, (3,), replace=False)
    )(perm_keys)
    tile_idx = jnp.concatenate(
        [jnp.arange(batch, dtype=others.dtype)[:, None], others], axis=1
    )

    ch = u(ks[1], minval=hrange[0] / 2.0, maxval=hrange[1] / 2.0)
    cw = u(ks[2], minval=wrange[0] / 2.0, maxval=wrange[1] / 2.0)
    yc = jax.random.uniform(ks[3], (batch,), minval=0.5, maxval=1.5) * ch
    xc = jax.random.uniform(ks[4], (batch,), minval=0.5, maxval=1.5) * cw

    angle = u(ks[5], minval=-degrees, maxval=degrees)
    pscale = u(ks[6], minval=scale[0], maxval=scale[1])
    sh = jax.random.uniform(
        ks[7], (batch, 2), minval=-shear, maxval=shear
    )
    tr = jax.random.uniform(
        ks[8], (batch, 2), minval=0.5 - translate, maxval=0.5 + translate
    )
    pp = jax.random.uniform(
        ks[9], (batch, 2), minval=-perspective, maxval=perspective
    )

    do_mix = (
        jax.random.uniform(ks[10], (batch,)) < 0.5
        if enable_mixup
        else jnp.zeros((batch,), bool)
    )
    mix_idx = jax.random.randint(ks[11], (batch,), 0, batch)
    mix_jit = u(ks[12], minval=mixup_scale[0], maxval=mixup_scale[1])
    mix_flip = jax.random.uniform(ks[13], (batch,)) < 0.5

    # hsv rand_scale: u ~ U(1, s), inverted with p=0.5 (augment.py:103-105)
    khue, ksat, ksinv, kexp, keinv = jax.random.split(ks[14], 5)
    dhue = jax.random.uniform(khue, (batch,), minval=-hue, maxval=hue)
    sat = jax.random.uniform(ksat, (batch,), minval=1.0, maxval=saturation)
    dsat = jnp.where(jax.random.uniform(ksinv, (batch,)) < 0.5, sat, 1.0 / sat)
    exp = jax.random.uniform(kexp, (batch,), minval=1.0, maxval=exposure)
    dexp = jnp.where(jax.random.uniform(keinv, (batch,)) < 0.5, exp, 1.0 / exp)

    do_hflip = jax.random.uniform(ks[15], (batch,)) < flip_prob

    return AugParams(
        tile_idx=tile_idx.astype(jnp.int32),
        canvas_hw=jnp.stack([ch, cw], -1),
        center_yx=jnp.stack([yc, xc], -1),
        angle=angle,
        pscale=pscale,
        shear=sh,
        translate=tr,
        persp=pp,
        do_mixup=do_mix,
        mix_idx=mix_idx.astype(jnp.int32),
        mix_jit=mix_jit,
        mix_flip=mix_flip,
        dhue=dhue,
        dsat=dsat,
        dexp=dexp,
        do_hflip=do_hflip,
    )


# ---------------------------------------------------------------------------
# deterministic kernels
# ---------------------------------------------------------------------------


def perspective_matrix(
    out_hw: Tuple[int, int],
    canvas_hw,
    angle,
    pscale,
    shear_xy,
    translate_xy,
    persp_xy,
) -> jnp.ndarray:
    """The exact M = T @ S @ R @ P @ C of the reference random_perspective
    (data_augment.py:31; host port augment.py:182-222). ``canvas_hw`` is the
    HALF canvas (ch, cw): the full mosaic canvas is (2ch, 2cw), so the
    centering translation is (-cw, -ch)."""
    ch, cw = canvas_hw[0], canvas_hw[1]
    oh, ow = out_hw
    rad = angle * (jnp.pi / 180.0)
    cos, sin = jnp.cos(rad) * pscale, jnp.sin(rad) * pscale
    shx = jnp.tan(shear_xy[0] * jnp.pi / 180.0)
    shy = jnp.tan(shear_xy[1] * jnp.pi / 180.0)
    one = jnp.ones_like(cos)
    zero = jnp.zeros_like(cos)

    C = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    C = C.at[0, 2].set(-cw).at[1, 2].set(-ch)
    P = jnp.stack(
        [
            jnp.stack([one, zero, zero]),
            jnp.stack([zero, one, zero]),
            jnp.stack([persp_xy[0], persp_xy[1], one]),
        ]
    )
    # cv2.getRotationMatrix2D(center=(0,0), angle, scale) = [[a, b], [-b, a]]
    # with a = s cos, b = s sin (positive angle = CCW in image coords)
    R = jnp.stack(
        [
            jnp.stack([cos, sin, zero]),
            jnp.stack([-sin, cos, zero]),
            jnp.stack([zero, zero, one]),
        ]
    )
    S = jnp.stack(
        [
            jnp.stack([one, shx, zero]),
            jnp.stack([shy, one, zero]),
            jnp.stack([zero, zero, one]),
        ]
    )
    T = jnp.stack(
        [
            jnp.stack([one, zero, translate_xy[0] * ow]),
            jnp.stack([zero, one, translate_xy[1] * oh]),
            jnp.stack([zero, zero, one]),
        ]
    )
    return T @ S @ R @ P @ C


def _mosaic_placement(canvas_hw, center_yx, tile_hw):
    """Per-tile paste rectangles + offsets of mosaic4 (host augment.py:269-298,
    reference dataset_mapper.py:523-597). ``tile_hw``: [4, 2] scaled (h, w)
    of each tile on the canvas. Returns (rect [4,4] x1a,y1a,x2a,y2a and
    pad [4,2] padw,padh), all float."""
    ch, cw = canvas_hw[0], canvas_hw[1]
    yc, xc = center_yx[0], center_yx[1]
    H2, W2 = 2.0 * ch, 2.0 * cw
    h, w = tile_hw[:, 0], tile_hw[:, 1]

    # quadrant order: 0 tl, 1 tr, 2 bl, 3 br
    x1a = jnp.stack(
        [jnp.maximum(xc - w[0], 0.0), xc, jnp.maximum(xc - w[2], 0.0), xc]
    )
    y1a = jnp.stack(
        [jnp.maximum(yc - h[0], 0.0), jnp.maximum(yc - h[1], 0.0), yc, yc]
    )
    x2a = jnp.stack(
        [xc, jnp.minimum(xc + w[1], W2), xc, jnp.minimum(xc + w[3], W2)]
    )
    y2a = jnp.stack(
        [yc, yc, jnp.minimum(yc + h[2], H2), jnp.minimum(yc + h[3], H2)]
    )
    # source-crop origins (x1b, y1b) per host formulas
    x1b = jnp.stack(
        [w[0] - (x2a[0] - x1a[0]), 0.0 * w[1], w[2] - (x2a[2] - x1a[2]),
         0.0 * w[3]]
    )
    y1b = jnp.stack(
        [h[0] - (y2a[0] - y1a[0]), h[1] - (y2a[1] - y1a[1]), 0.0 * h[2],
         0.0 * h[3]]
    )
    padw = x1a - x1b
    padh = y1a - y1b
    rect = jnp.stack([x1a, y1a, x2a, y2a], axis=1)
    pad = jnp.stack([padw, padh], axis=1)
    return rect, pad


def _bilinear_flat(pool_flat, base, u, v, size, inside, fill=GRAY):
    """Bilinear sample from a flattened uint8 tile pool.

    pool_flat: [B*S*S, 3]; base: scalar flat offset of the tile
    (tile_index * S * S); u, v: float pixel coords (cv2 convention: sample
    at integer pixel centers); inside: bool mask, outside -> fill.
    """
    S = size
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)

    def tap(vi, ui):
        vi = jnp.clip(vi, 0, S - 1)
        ui = jnp.clip(ui, 0, S - 1)
        return jnp.take(
            pool_flat, base + vi * S + ui, axis=0
        ).astype(jnp.float32)

    w00 = ((1 - fu) * (1 - fv))[..., None]
    w01 = (fu * (1 - fv))[..., None]
    w10 = ((1 - fu) * fv)[..., None]
    w11 = (fu * fv)[..., None]
    val = (
        tap(v0, u0) * w00
        + tap(v0, u0 + 1) * w01
        + tap(v0 + 1, u0) * w10
        + tap(v0 + 1, u0 + 1) * w11
    )
    return jnp.where(inside[..., None], val, fill)


def mosaic_perspective_image(
    pool_flat, tile_size: int, out_hw: Tuple[int, int],
    tile_idx, tile_pre_hw, tile_canvas_hw, rect, pad, M,
):
    """Fused mosaic-paste + perspective warp for ONE output image.

    pool_flat: [B*S*S, 3] uint8 pre-resized tile pool;
    tile_pre_hw [4,2]: valid (h, w) of each chosen tile in the pool (after
    the host's fit-to-S resize); tile_canvas_hw [4,2]: the tile's scaled
    size on the mosaic canvas; rect/pad: from _mosaic_placement; M: [3,3].
    """
    oh, ow = out_hw
    Minv = jnp.linalg.inv(M)
    ys, xs = jnp.meshgrid(
        jnp.arange(oh, dtype=jnp.float32),
        jnp.arange(ow, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    # canvas coords via homogeneous inverse warp (warpAffine/warpPerspective
    # convention: direct coordinate map, no half-pixel shift)
    cx = Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2]
    cy = Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2]
    cz = Minv[2, 0] * xs + Minv[2, 1] * ys + Minv[2, 2] * ones
    cx = cx / cz
    cy = cy / cz

    # quadrant by the mosaic center
    yc = rect[0, 3]  # y2a of tl == yc
    xc = rect[0, 2]  # x2a of tl == xc
    q = (cx >= xc).astype(jnp.int32) + 2 * (cy >= yc).astype(jnp.int32)

    r = jnp.stack([rect[i] for i in range(4)])  # [4,4]
    x1a, y1a, x2a, y2a = r[q, 0], r[q, 1], r[q, 2], r[q, 3]
    inside = (cx >= x1a) & (cx < x2a) & (cy >= y1a) & (cy < y2a)

    padw, padh = pad[q, 0], pad[q, 1]
    # canvas -> scaled-tile coords -> pre-resized tile coords (cv2.resize
    # pixel-center convention for the scale leg)
    ratio = tile_canvas_hw[q, 1] / jnp.maximum(tile_pre_hw[q, 1], 1e-6)
    ratio_y = tile_canvas_hw[q, 0] / jnp.maximum(tile_pre_hw[q, 0], 1e-6)
    u = (cx - padw + 0.5) / ratio - 0.5
    v = (cy - padh + 0.5) / ratio_y - 0.5

    base = tile_idx[q] * (tile_size * tile_size)
    return _bilinear_flat(pool_flat, base, u, v, tile_size, inside)


def transform_boxes(boxes4, valid4, scale4, pad, canvas_hw, M, out_hw,
                    min_wh=2.0, max_ar=20.0):
    """Mosaic box shift + perspective corner transform + candidates filter
    (host augment.py:299-312 and :232-249). boxes4: [4, M, 4] in
    pre-resized tile coords; scale4: [4] pre->canvas scale; returns
    ([4*M, 4], [4*M] valid)."""
    ch, cw = canvas_hw[0], canvas_hw[1]
    oh, ow = out_hw
    b = boxes4 * scale4[:, None, None]
    b = b.at[..., 0::2].add(pad[:, None, 0:1])
    b = b.at[..., 1::2].add(pad[:, None, 1:2])
    b = b.reshape(-1, 4)
    valid = valid4.reshape(-1)
    # host clips the concatenated canvas boxes to the canvas first
    b = jnp.stack(
        [
            jnp.clip(b[:, 0], 0, 2 * cw),
            jnp.clip(b[:, 1], 0, 2 * ch),
            jnp.clip(b[:, 2], 0, 2 * cw),
            jnp.clip(b[:, 3], 0, 2 * ch),
        ],
        axis=1,
    )
    # candidates filter on the canvas (host filters post-mosaic too)
    valid = valid & _box_candidates(b, min_wh, max_ar)

    corners = jnp.stack(
        [
            b[:, 0], b[:, 1], b[:, 2], b[:, 3],
            b[:, 0], b[:, 3], b[:, 2], b[:, 1],
        ],
        axis=1,
    ).reshape(-1, 4, 2)
    ones = jnp.ones(corners.shape[:2] + (1,), corners.dtype)
    pts = jnp.concatenate([corners, ones], -1) @ M.T  # [N,4,3]
    pts = pts[..., :2] / pts[..., 2:3]
    xs, ys = pts[..., 0], pts[..., 1]
    warped = jnp.stack(
        [
            jnp.clip(xs.min(1), 0, ow),
            jnp.clip(ys.min(1), 0, oh),
            jnp.clip(xs.max(1), 0, ow),
            jnp.clip(ys.max(1), 0, oh),
        ],
        axis=1,
    )
    valid = valid & _box_candidates(warped, min_wh, max_ar)
    return warped, valid


def _box_candidates(b, min_wh=2.0, max_ar=20.0):
    w = b[:, 2] - b[:, 0]
    h = b[:, 3] - b[:, 1]
    ar = jnp.maximum(w / (h + 1e-16), h / (w + 1e-16))
    return (w > min_wh) & (h > min_wh) & (ar < max_ar)


def mixup_image(
    pool_flat, tile_size: int, out_hw: Tuple[int, int], img,
    partner_idx, partner_pre_hw, partner_orig_hw, jit, flip,
):
    """YOLOX MixUp (reference dataset_mapper.py:686-767, host augment.py:319):
    jitter-resize partner onto a gray canvas of the output size, optional
    hflip, 0.5/0.5 blend. Returns (mixed image, r) with r the partner's
    original->canvas scale (for its boxes)."""
    oh, ow = out_hw
    h0, w0 = partner_orig_hw[0], partner_orig_hw[1]
    r = jnp.minimum(oh / h0, ow / w0) * jit
    nh, nw = h0 * r, w0 * r
    pre_h, pre_w = partner_pre_hw[0], partner_pre_hw[1]
    ry = nh / jnp.maximum(pre_h, 1e-6)
    rx = nw / jnp.maximum(pre_w, 1e-6)

    ys, xs = jnp.meshgrid(
        jnp.arange(oh, dtype=jnp.float32),
        jnp.arange(ow, dtype=jnp.float32),
        indexing="ij",
    )
    xr = jnp.where(flip, nw - 1.0 - xs, xs)
    u = (xr + 0.5) / rx - 0.5
    v = (ys + 0.5) / ry - 0.5
    inside = (xs < jnp.minimum(nw, ow)) & (ys < jnp.minimum(nh, oh))
    base = partner_idx * (tile_size * tile_size)
    canvas = _bilinear_flat(pool_flat, base, u, v, tile_size, inside)
    return img * 0.5 + canvas * 0.5, r, (nh, nw)


def mixup_boxes(boxes, valid, pre_scale, r, nhw, flip, out_hw,
                min_wh=2.0, max_ar=20.0):
    """Partner boxes through the mixup resize/flip (host augment.py:346-352).
    ``boxes`` are in pre-resized tile coords (= original * pre_scale)."""
    oh, ow = out_hw
    b = boxes * (r / pre_scale)  # back to original coords * r
    nw = nhw[1]
    bx1 = jnp.where(flip, nw - b[:, 2], b[:, 0])
    bx2 = jnp.where(flip, nw - b[:, 0], b[:, 2])
    b = jnp.stack(
        [
            jnp.clip(bx1, 0, ow),
            jnp.clip(b[:, 1], 0, oh),
            jnp.clip(bx2, 0, ow),
            jnp.clip(b[:, 3], 0, oh),
        ],
        axis=1,
    )
    return b, valid & _box_candidates(b, min_wh, max_ar)


def hsv_distort(img, dhue, dsat, dexp):
    """Float BGR->HSV->BGR with the cv2 uint8-HSV scale (H in [0, 180)):
    hue shifted by dhue*180 mod 180, S/V scaled+clipped (host
    augment.py:94-114). img float BGR 0..255."""
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    safe = jnp.maximum(diff, 1e-6)
    # cv2: H = 60*(g-b)/diff if v==r; 120 + 60*(b-r)/diff if v==g;
    #      240 + 60*(r-g)/diff if v==b; stored /2 for uint8
    h = jnp.where(
        v == r,
        60.0 * (g - b) / safe,
        jnp.where(
            v == g, 120.0 + 60.0 * (b - r) / safe,
            240.0 + 60.0 * (r - g) / safe,
        ),
    )
    h = jnp.where(diff <= 0, 0.0, jnp.mod(h, 360.0)) / 2.0  # [0,180)
    s = jnp.where(v > 0, 255.0 * diff / jnp.maximum(v, 1e-6), 0.0)

    h = jnp.mod(h + dhue * 180.0, 180.0)
    s = jnp.clip(s * dsat, 0.0, 255.0)
    v = jnp.clip(v * dexp, 0.0, 255.0)

    # HSV -> BGR (cv2 float convention, H in degrees*0.5)
    h6 = h * 2.0 / 60.0  # sector in [0, 6)
    i = jnp.floor(h6)
    f = h6 - i
    sf = s / 255.0
    p = v * (1.0 - sf)
    q = v * (1.0 - sf * f)
    t = v * (1.0 - sf * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [v, q, p, p, t, v],
    )
    g2 = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [t, v, v, q, p, p],
    )
    b2 = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [p, p, t, v, v, q],
    )
    return jnp.stack([b2, g2, r2], axis=-1)


def pack_boxes(boxes, classes, valid, max_out: int):
    """Valid-first stable pack into [max_out] slots (densify semantics,
    mappers.py:98: truncation beyond max_boxes)."""
    order = jnp.argsort(~valid, stable=True)
    take = order[:max_out]
    return (
        boxes[take],
        classes[take],
        valid[take],
    )


# ---------------------------------------------------------------------------
# batched entry point
# ---------------------------------------------------------------------------


class DeviceAug:
    """Jittable batched mosaic+mixup+HSV+flip over a device tile pool.

    ``tiles`` (from ``TileDatasetMapper``): image [B,S,S,3] uint8 BGR
    (pre-resized to fit S, top-left, gray pad), boxes [B,M,4] in
    pre-resized coords, classes [B,M] int32, valid [B,M] bool,
    orig_hw [B,2] float32.
    """

    def __init__(self, cfg, out_size: Tuple[int, int] = None,
                 max_boxes: int = None):
        m = cfg.INPUT.MOSAIC_AND_MIXUP
        self.kw = dict(
            hrange=tuple(m.MOSAIC_HEIGHT_RANGE),
            wrange=tuple(m.MOSAIC_WIDTH_RANGE),
            degrees=float(m.DEGREES),
            translate=float(m.TRANSLATE),
            scale=tuple(m.SCALE),
            shear=float(m.SHEAR),
            perspective=float(m.PERSPECTIVE),
            enable_mixup=bool(m.ENABLE_MIXUP),
            mixup_scale=tuple(m.MSCALE),
            hue=float(cfg.INPUT.DISTORTION.HUE),
            saturation=float(cfg.INPUT.DISTORTION.SATURATION),
            exposure=float(cfg.INPUT.DISTORTION.EXPOSURE),
            flip_prob=(
                float(cfg.INPUT.RANDOM_FLIP_HORIZONTAL.PROB)
                if cfg.INPUT.RANDOM_FLIP_HORIZONTAL.ENABLED
                else 0.0
            ),
        )
        self.distortion = bool(cfg.INPUT.DISTORTION.ENABLED)
        self.out_hw = tuple(out_size or cfg.INPUT.INPUT_SIZE)
        self.max_boxes = int(max_boxes or cfg.MODEL.YOLO.MAX_BOXES_NUM)

    def __call__(self, rng: jax.Array, tiles: Dict) -> Dict:
        images = tiles["image"]
        B, S = images.shape[0], images.shape[1]
        assert images.shape[1] == images.shape[2], "tiles must be square"
        params = sample_params(rng, B, **self.kw)
        pool_flat = images.reshape(B * S * S, images.shape[-1])
        orig_hw = tiles["orig_hw"].astype(jnp.float32)
        pre_scale = jnp.minimum(S / orig_hw[:, 0], S / orig_hw[:, 1])
        pre_hw = orig_hw * pre_scale[:, None]

        out_hw = self.out_hw
        max_out = self.max_boxes

        def one(p: AugParams, mix_partner_meta):
            idx = p.tile_idx  # [4]
            t_orig = orig_hw[idx]  # [4,2]
            t_pre = pre_hw[idx]
            t_pres = pre_scale[idx]
            ch, cw = p.canvas_hw[0], p.canvas_hw[1]
            s_c = jnp.minimum(ch / t_orig[:, 0], cw / t_orig[:, 1])  # [4]
            t_canvas = t_orig * s_c[:, None]
            rect, pad = _mosaic_placement(p.canvas_hw, p.center_yx, t_canvas)
            M = perspective_matrix(
                out_hw, p.canvas_hw, p.angle, p.pscale, p.shear,
                p.translate, p.persp,
            )
            img = mosaic_perspective_image(
                pool_flat, S, out_hw, idx, t_pre, t_canvas, rect, pad, M
            )
            scale4 = s_c / t_pres  # pre-resized -> canvas
            bx, bv = transform_boxes(
                tiles["gt_boxes"][idx], tiles["gt_valid"][idx], scale4, pad,
                p.canvas_hw, M, out_hw,
            )
            cls4 = tiles["gt_classes"][idx].reshape(-1)

            # mixup
            j = p.mix_idx
            mixed, r_mix, nhw = mixup_image(
                pool_flat, S, out_hw, img, j, pre_hw[j], orig_hw[j],
                p.mix_jit, p.mix_flip,
            )
            img = jnp.where(p.do_mixup, mixed, img)
            mbx, mbv = mixup_boxes(
                tiles["gt_boxes"][j], tiles["gt_valid"][j], pre_scale[j],
                r_mix, nhw, p.mix_flip, out_hw,
            )
            mbv = mbv & p.do_mixup

            all_bx = jnp.concatenate([bx, mbx], 0)
            all_cls = jnp.concatenate([cls4, tiles["gt_classes"][j]], 0)
            all_v = jnp.concatenate([bv, mbv], 0)

            if self.distortion:
                img = hsv_distort(img, p.dhue, p.dsat, p.dexp)

            ow = out_hw[1]
            flipped = img[:, ::-1]
            img = jnp.where(p.do_hflip, flipped, img)
            fx1 = jnp.where(p.do_hflip, ow - all_bx[:, 2], all_bx[:, 0])
            fx2 = jnp.where(p.do_hflip, ow - all_bx[:, 0], all_bx[:, 2])
            all_bx = jnp.stack([fx1, all_bx[:, 1], fx2, all_bx[:, 3]], 1)

            gb, gc, gv = pack_boxes(all_bx, all_cls, all_v, max_out)
            return img, gb, gc, gv

        img, gb, gc, gv = jax.vmap(one, in_axes=(0, None))(params, None)
        return {
            "image": img,
            "gt_boxes": jnp.where(gv[..., None], gb, 0.0),
            "gt_classes": jnp.where(gv, gc, 0),  # densify fill (mappers.py:103)
            "gt_valid": gv,
        }

    def passthrough(self, tiles: Dict) -> Dict:
        """No-aug branch (the reference's late-training aug disable,
        DISABLE_AT_ITER): tiles are already letterboxed to the input size,
        so this is just dtype + slot-count alignment with __call__."""
        k = self.max_boxes
        return {
            "image": tiles["image"].astype(jnp.float32),
            "gt_boxes": tiles["gt_boxes"][:, :k].astype(jnp.float32),
            "gt_classes": tiles["gt_classes"][:, :k].astype(jnp.int32),
            "gt_valid": tiles["gt_valid"][:, :k],
        }


class DevicePhotometric:
    """Elementwise-only device augmentation over PRE-AUGMENTED batches
    (the packed-shard cache, ``data/packed_cache.py``): in-batch MixUp
    blend + HSV distortion + horizontal flip.

    Rationale (measured, docs/PERF.md round 4): the full device-side
    GEOMETRY aug (``DeviceAug``) is gather-bound — 2.25 s/batch @bs32 on
    the v5e, ~100x off any roofline, because per-pixel bilinear warps are
    63M random 3-wide row-gathers that TPU executes at ~45M rows/s, and
    every matmul/one-hot reformulation floors >=40 ms/step. The
    TPU-native split is therefore: geometry OFFLINE (packed shards, any
    host, any epoch count) or on many-core hosts; photometrics ONLINE on
    device, where they are pure elementwise bandwidth (~11 ms/batch
    @bs32 for HSV) and keep per-step randomness.

    Semantics vs the reference chain (dataset_mapper.py:339-597):
      * HSV + hflip: exactly the reference ops (same kernels as
        ``DeviceAug``, tested in tests/test_device_aug.py).
      * MixUp: the reference blends a mosaic output with a jitter-resized
        RAW partner; here two offline-augmented samples are blended
        0.5/0.5 (the partner is another mosaic output). Documented
        deviation — the blend weights and the box-union semantics match.
    """

    def __init__(self, cfg, max_boxes: int = None):
        m = cfg.INPUT.MOSAIC_AND_MIXUP
        self.enable_mixup = bool(m.ENABLE_MIXUP)
        self.distortion = bool(cfg.INPUT.DISTORTION.ENABLED)
        self.hue = float(cfg.INPUT.DISTORTION.HUE)
        self.saturation = float(cfg.INPUT.DISTORTION.SATURATION)
        self.exposure = float(cfg.INPUT.DISTORTION.EXPOSURE)
        self.flip_prob = (
            float(cfg.INPUT.RANDOM_FLIP_HORIZONTAL.PROB)
            if cfg.INPUT.RANDOM_FLIP_HORIZONTAL.ENABLED
            else 0.0
        )
        self.max_boxes = int(max_boxes or cfg.MODEL.YOLO.MAX_BOXES_NUM)

    def __call__(self, rng: jax.Array, batch: Dict) -> Dict:
        img = batch["image"].astype(jnp.float32)  # uint8 shards -> f32
        B = img.shape[0]
        ow = img.shape[2]
        k0, k1, k2, k3, k4, k5, k6, k7 = jax.random.split(rng, 8)

        gb = batch["gt_boxes"].astype(jnp.float32)
        gc = batch["gt_classes"].astype(jnp.int32)
        gv = batch["gt_valid"]

        if self.enable_mixup:
            perm = jax.random.permutation(k0, B)
            do_mix = jax.random.uniform(k1, (B,)) < 0.5
            mixed = img * 0.5 + img[perm] * 0.5
            img = jnp.where(do_mix[:, None, None, None], mixed, img)
            gb = jnp.concatenate([gb, gb[perm]], axis=1)
            gc = jnp.concatenate([gc, gc[perm]], axis=1)
            gv = jnp.concatenate([gv, gv[perm] & do_mix[:, None]], axis=1)

        if self.distortion:
            dhue = jax.random.uniform(
                k2, (B,), minval=-self.hue, maxval=self.hue
            )
            sat = jax.random.uniform(
                k3, (B,), minval=1.0, maxval=self.saturation
            )
            dsat = jnp.where(
                jax.random.uniform(k4, (B,)) < 0.5, sat, 1.0 / sat
            )
            exp = jax.random.uniform(
                k5, (B,), minval=1.0, maxval=self.exposure
            )
            dexp = jnp.where(
                jax.random.uniform(k6, (B,)) < 0.5, exp, 1.0 / exp
            )
            img = jax.vmap(hsv_distort)(img, dhue, dsat, dexp)

        do_flip = jax.random.uniform(k7, (B,)) < self.flip_prob
        img = jnp.where(do_flip[:, None, None, None], img[:, :, ::-1], img)
        fx1 = jnp.where(do_flip[:, None], ow - gb[..., 2], gb[..., 0])
        fx2 = jnp.where(do_flip[:, None], ow - gb[..., 0], gb[..., 2])
        gb = jnp.stack([fx1, gb[..., 1], fx2, gb[..., 3]], axis=-1)

        gb, gc, gv = jax.vmap(pack_boxes, in_axes=(0, 0, 0, None))(
            gb, gc, gv, self.max_boxes
        )
        return {
            "image": img,
            "gt_boxes": jnp.where(gv[..., None], gb, 0.0),
            "gt_classes": jnp.where(gv, gc, 0),
            "gt_valid": gv,
        }

    def passthrough(self, batch: Dict) -> Dict:
        k = self.max_boxes
        return {
            "image": batch["image"].astype(jnp.float32),
            "gt_boxes": batch["gt_boxes"][:, :k].astype(jnp.float32),
            "gt_classes": batch["gt_classes"][:, :k].astype(jnp.int32),
            "gt_valid": batch["gt_valid"][:, :k],
        }


def make_packed_photo_step(cfg, train_step, seed: int = None):
    """Wrap ``train_step`` so uint8 packed-shard batches get the device
    photometric aug (mixup blend + HSV + flip) fused into the same jit
    graph. Transfer rides uint8 (4x less host->HBM traffic than f32);
    the late-training ``DISABLE_AT_ITER`` switch is a ``lax.cond`` on the
    step counter, same as ``make_device_aug_step``."""
    aug = DevicePhotometric(cfg)
    disable_at = int(cfg.INPUT.MOSAIC_AND_MIXUP.DISABLE_AT_ITER)
    # per-host decorrelation: fold the process index into the base key the
    # same way PackedShardLoader offsets its numpy seed — otherwise every
    # host draws identical per-step mixup permutations/flip coins/HSV
    base = jax.random.PRNGKey(
        (seed if seed is not None else max(int(cfg.SEED), 0))
        + jax.process_index())

    def step(state, batch):
        key = jax.random.fold_in(base, state.step)
        augmented = jax.lax.cond(
            state.step < disable_at,
            lambda b: aug(key, b),
            aug.passthrough,
            batch,
        )
        return train_step(state, augmented)

    return step


def make_device_aug_step(cfg, train_step, seed: int = None):
    """Wrap a jittable ``train_step(state, batch)`` so the DEVICE aug runs
    fused inside the same jit graph: tiles in, gradients out. The rng
    derives from cfg.SEED + state.step (per-step decorrelation without a
    host round-trip), and the reference's ``DISABLE_AT_ITER`` late-training
    aug switch (dataset_mapper.py:400,490; host: AugDisableHook) becomes a
    ``lax.cond`` on the step counter."""
    aug = DeviceAug(cfg)
    disable_at = int(cfg.INPUT.MOSAIC_AND_MIXUP.DISABLE_AT_ITER)
    # per-host decorrelation, mirroring make_packed_photo_step
    base = jax.random.PRNGKey(
        (seed if seed is not None else max(int(cfg.SEED), 0))
        + jax.process_index())

    def step(state, tiles):
        key = jax.random.fold_in(base, state.step)
        batch = jax.lax.cond(
            state.step < disable_at,
            lambda t: aug(key, t),
            aug.passthrough,
            tiles,
        )
        return train_step(state, batch)

    return step
