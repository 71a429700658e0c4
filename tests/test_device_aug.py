"""Device-side mosaic/mixup/HSV aug (data/device_aug.py) vs the host
numpy/cv2 chain (data/transforms/augment.py) — differential where the
math is identical, tolerance-bounded where the device path documents a
deviation (single vs double resample, float vs int sub-image sizes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cv2

from yolov7_d2_tpu.data import device_aug as D
from yolov7_d2_tpu.data.transforms import augment as A

S = 64


def _smooth_tiles(n, s=S, seed=0):
    rng = np.random.default_rng(seed)
    tiles = rng.integers(0, 255, (n, s, s, 3), np.uint8)
    return np.stack(
        [cv2.GaussianBlur(t, (7, 7), 3.0) for t in tiles]
    ).astype(np.uint8)


def _np_mosaic_canvas(tiles, ch, cw, yc, xc):
    """Literal numpy paste following host mosaic4 (augment.py:269-298),
    s_c == 1 case (tiles already canvas-sized)."""
    canvas = np.full((ch * 2, cw * 2, 3), 114, np.uint8)
    pads = []
    for i, img in enumerate(tiles):
        h, w = img.shape[:2]
        if i == 0:
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
        elif i == 1:
            x1a, y1a = xc, max(yc - h, 0)
            x2a, y2a = min(xc + w, cw * 2), yc
            x1b, y1b = 0, h - (y2a - y1a)
        elif i == 2:
            x1a, y1a = max(xc - w, 0), yc
            x2a, y2a = xc, min(ch * 2, yc + h)
            x1b, y1b = w - (x2a - x1a), 0
        else:
            x1a, y1a = xc, yc
            x2a, y2a = min(xc + w, cw * 2), min(ch * 2, yc + h)
            x1b, y1b = 0, 0
        canvas[y1a:y2a, x1a:x2a] = img[
            y1b : y1b + (y2a - y1a), x1b : x1b + (x2a - x1a)
        ]
        pads.append((x1a - x1b, y1a - y1b))
    return canvas, pads


def _placement(ch, cw, yc, xc, tiles_hw):
    canvas_hw = jnp.array([ch, cw], jnp.float32)
    center = jnp.array([yc, xc], jnp.float32)
    return D._mosaic_placement(canvas_hw, center, jnp.asarray(tiles_hw, jnp.float32))


class TestFusedMosaicWarp:
    def test_identity_warp_exact(self):
        """s_c=1 (canvas half == tile size), M = pure integer translation:
        fused gather must reproduce the numpy paste EXACTLY."""
        tiles = _smooth_tiles(4)
        ch = cw = S
        yc, xc = 57, 71
        canvas, _ = _np_mosaic_canvas(tiles, ch, cw, yc, xc)

        # M = translate so the output window is canvas[8:8+S, 12:12+S]
        M = np.eye(3, dtype=np.float32)
        M[0, 2], M[1, 2] = -12.0, -8.0

        rect, pad = _placement(ch, cw, yc, xc, [[S, S]] * 4)
        img = D.mosaic_perspective_image(
            jnp.asarray(tiles.reshape(4 * S * S, 3)), S, (S, S),
            jnp.arange(4, dtype=jnp.int32),
            jnp.full((4, 2), S, jnp.float32),
            jnp.full((4, 2), S, jnp.float32),
            rect, pad, jnp.asarray(M),
        )
        expect = canvas[8 : 8 + S, 12 : 12 + S].astype(np.float32)
        np.testing.assert_allclose(np.asarray(img), expect, atol=1e-3)

    def test_affine_warp_matches_cv2(self):
        """Same canvas warped by cv2.warpAffine vs the fused gather —
        identical math, only cv2's 5-bit fixed-point interpolation differs."""
        tiles = _smooth_tiles(4, seed=3)
        ch = cw = S
        yc, xc = 60, 66
        canvas, _ = _np_mosaic_canvas(tiles, ch, cw, yc, xc)

        Mj = D.perspective_matrix(
            (S, S), jnp.array([ch, cw], jnp.float32),
            jnp.float32(5.0), jnp.float32(1.1),
            jnp.array([1.0, -2.0], jnp.float32),
            jnp.array([0.45, 0.55], jnp.float32),
            jnp.array([0.0, 0.0], jnp.float32),
        )
        M = np.asarray(Mj, np.float64)
        ref = cv2.warpAffine(
            canvas, M[:2], dsize=(S, S), borderValue=(114, 114, 114)
        ).astype(np.float32)

        rect, pad = _placement(ch, cw, yc, xc, [[S, S]] * 4)
        img = np.asarray(
            D.mosaic_perspective_image(
                jnp.asarray(tiles.reshape(4 * S * S, 3)), S, (S, S),
                jnp.arange(4, dtype=jnp.int32),
                jnp.full((4, 2), S, jnp.float32),
                jnp.full((4, 2), S, jnp.float32),
                rect, pad, Mj,
            )
        )
        diff = np.abs(img - ref)
        assert np.mean(diff) < 1.0, np.mean(diff)
        # tail: cv2 bilinearly blends ACROSS the paste seams of the
        # materialized canvas; the fused path keeps hard seams (like the
        # paste itself) — only seam-adjacent pixels may differ materially
        assert np.quantile(diff, 0.95) < 4.0
        assert (diff > 30).mean() < 0.005

    def test_scaled_tiles_close_to_host(self):
        """s_c != 1: device does ONE resample (pre-resized tile -> out)
        where the host does two (resize then warp) — smooth tiles must
        agree to small tolerance."""
        tiles = _smooth_tiles(4, seed=5)
        ch, cw = 48, 48  # s_c = 48/64 = 0.75 -> 48x48 scaled tiles
        yc, xc = 55, 41
        scaled = np.stack(
            [cv2.resize(t, (48, 48), interpolation=cv2.INTER_LINEAR)
             for t in tiles]
        )
        canvas, _ = _np_mosaic_canvas(scaled, ch, cw, yc, xc)
        Mj = D.perspective_matrix(
            (S, S), jnp.array([ch, cw], jnp.float32),
            jnp.float32(-3.0), jnp.float32(0.9),
            jnp.array([0.5, 1.0], jnp.float32),
            jnp.array([0.5, 0.5], jnp.float32),
            jnp.array([0.0, 0.0], jnp.float32),
        )
        ref = cv2.warpAffine(
            canvas, np.asarray(Mj, np.float64)[:2], dsize=(S, S),
            borderValue=(114, 114, 114),
        ).astype(np.float32)
        rect, pad = _placement(ch, cw, yc, xc, [[48, 48]] * 4)
        img = np.asarray(
            D.mosaic_perspective_image(
                jnp.asarray(tiles.reshape(4 * S * S, 3)), S, (S, S),
                jnp.arange(4, dtype=jnp.int32),
                jnp.full((4, 2), S, jnp.float32),
                jnp.full((4, 2), 48, jnp.float32),
                rect, pad, Mj,
            )
        )
        diff = np.abs(img - ref)
        assert np.mean(diff) < 2.5, np.mean(diff)


class TestBoxes:
    def test_mosaic_box_shift_matches_host_mosaic4(self):
        """Differential vs A.mosaic4's box output (s_c = 1, pre-read rng)."""
        ch = cw = S
        rng = np.random.default_rng(11)
        yc = int(rng.uniform(0.5 * ch, 1.5 * ch))
        xc = int(rng.uniform(0.5 * cw, 1.5 * cw))

        tiles = _smooth_tiles(4, seed=7)
        boxes_list = [
            np.array([[5.0, 8.0, 30.0, 40.0]], np.float32),
            np.array([[10.0, 10.0, 50.0, 30.0]], np.float32),
            np.array([[0.0, 0.0, 20.0, 20.0]], np.float32),
            np.array([[30.0, 30.0, 60.0, 62.0]], np.float32),
        ]
        classes_list = [np.array([i]) for i in range(4)]
        _, ref_boxes, ref_classes = A.mosaic4(
            list(tiles), boxes_list, classes_list, (ch, cw),
            np.random.default_rng(11),
        )

        rect, pad = _placement(ch, cw, yc, xc, [[S, S]] * 4)
        M = jnp.eye(3)  # isolate the mosaic shift (out size = canvas)
        bx, bv = D.transform_boxes(
            jnp.asarray(np.stack(boxes_list)),
            jnp.ones((4, 1), bool),
            jnp.ones((4,), jnp.float32), pad,
            jnp.array([ch, cw], jnp.float32), M, (2 * ch, 2 * cw),
        )
        got = np.asarray(bx)[np.asarray(bv)]
        assert got.shape == ref_boxes.shape
        np.testing.assert_allclose(
            np.sort(got, axis=0), np.sort(ref_boxes, axis=0), atol=1e-3
        )

    def test_warped_box_tracks_painted_pixels(self):
        """Paint a rectangle, warp, and check the transformed box hugs the
        warped pixels (catches any x/y or matrix-convention swap)."""
        tiles = np.full((4, S, S, 3), 114, np.uint8)
        tiles[0, 20:40, 10:50] = 255
        ch = cw = S
        yc, xc = 70, 75
        Mj = D.perspective_matrix(
            (S, S), jnp.array([ch, cw], jnp.float32),
            jnp.float32(8.0), jnp.float32(0.8),
            jnp.array([2.0, 1.0], jnp.float32),
            jnp.array([0.55, 0.5], jnp.float32),
            jnp.array([0.0, 0.0], jnp.float32),
        )
        rect, pad = _placement(ch, cw, yc, xc, [[S, S]] * 4)
        img = np.asarray(
            D.mosaic_perspective_image(
                jnp.asarray(tiles.reshape(4 * S * S, 3)), S, (S, S),
                jnp.arange(4, dtype=jnp.int32),
                jnp.full((4, 2), S, jnp.float32),
                jnp.full((4, 2), S, jnp.float32),
                rect, pad, Mj,
            )
        )
        boxes4 = np.zeros((4, 1, 4), np.float32)
        boxes4[0, 0] = [10, 20, 50, 40]
        bx, bv = D.transform_boxes(
            jnp.asarray(boxes4), jnp.ones((4, 1), bool),
            jnp.ones((4,), jnp.float32), pad,
            jnp.array([ch, cw], jnp.float32), Mj, (S, S),
        )
        assert bool(bv[0])
        got = np.asarray(bx[0])
        white = np.argwhere(img[..., 0] > 180)
        assert len(white) > 20
        y0, x0 = white.min(0)
        y1, x1 = white.max(0) + 1
        np.testing.assert_allclose(got, [x0, y0, x1, y1], atol=2.5)


class TestMixup:
    def test_matches_host_mixup(self):
        rng = np.random.default_rng(21)
        jit = rng.uniform(0.5, 1.5)
        flip = rng.random() < 0.5

        tiles = _smooth_tiles(2, seed=9)
        img_a = tiles[0].copy()
        boxes_a = np.array([[4.0, 4.0, 30.0, 30.0]], np.float32)
        boxes_b = np.array([[8.0, 6.0, 40.0, 50.0]], np.float32)
        ref_img, ref_boxes, _ = A.mixup(
            img_a, boxes_a, np.array([1]), tiles[1], boxes_b, np.array([2]),
            np.random.default_rng(21),
        )

        pool = jnp.asarray(tiles.reshape(2 * S * S, 3))
        mixed, r, nhw = D.mixup_image(
            pool, S, (S, S), jnp.asarray(img_a, jnp.float32),
            jnp.int32(1), jnp.array([S, S], jnp.float32),
            jnp.array([S, S], jnp.float32),
            jnp.float32(jit), jnp.asarray(flip),
        )
        diff = np.abs(np.asarray(mixed) - ref_img.astype(np.float32))
        assert np.mean(diff) < 3.0, np.mean(diff)

        mb, mv = D.mixup_boxes(
            jnp.asarray(boxes_b), jnp.ones((1,), bool), jnp.float32(1.0),
            r, nhw, jnp.asarray(flip), (S, S),
        )
        assert bool(mv[0])
        np.testing.assert_allclose(
            np.asarray(mb[0]), ref_boxes[1], atol=1.5
        )


class TestHSV:
    def test_matches_cv2_roundtrip(self):
        img = _smooth_tiles(1, seed=13)[0]
        dhue, dsat, dexp = 0.05, 1.3, 0.8
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
        hsv[..., 0] = (hsv[..., 0] + dhue * 180.0) % 180.0
        hsv[..., 1] = np.clip(hsv[..., 1] * dsat, 0, 255)
        hsv[..., 2] = np.clip(hsv[..., 2] * dexp, 0, 255)
        ref = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)

        got = np.asarray(
            D.hsv_distort(
                jnp.asarray(img, jnp.float32), jnp.float32(dhue),
                jnp.float32(dsat), jnp.float32(dexp),
            )
        )
        diff = np.abs(got - ref.astype(np.float32))
        assert np.mean(diff) < 2.0, np.mean(diff)
        assert np.quantile(diff, 0.99) < 10.0

    def test_identity_is_noop(self):
        img = _smooth_tiles(1, seed=14)[0].astype(np.float32)
        got = np.asarray(
            D.hsv_distort(jnp.asarray(img), jnp.float32(0.0),
                          jnp.float32(1.0), jnp.float32(1.0))
        )
        assert np.mean(np.abs(got - img)) < 1.0


class TestPack:
    def test_valid_first_stable(self):
        boxes = jnp.arange(24, dtype=jnp.float32).reshape(6, 4)
        classes = jnp.arange(6, dtype=jnp.int32)
        valid = jnp.array([False, True, False, True, True, False])
        gb, gc, gv = D.pack_boxes(boxes, classes, valid, 4)
        assert np.asarray(gv).tolist() == [True, True, True, False]
        assert np.asarray(gc)[:3].tolist() == [1, 3, 4]
        np.testing.assert_allclose(np.asarray(gb)[0], boxes[1])


class TestDeviceAugEndToEnd:
    @pytest.fixture()
    def cfg(self):
        from yolov7_d2_tpu.config import get_cfg

        cfg = get_cfg()
        cfg.INPUT.INPUT_SIZE = [S, S]
        cfg.INPUT.MOSAIC_AND_MIXUP.ENABLED = True
        cfg.INPUT.MOSAIC_AND_MIXUP.MOSAIC_HEIGHT_RANGE = [S, 2 * S]
        cfg.INPUT.MOSAIC_AND_MIXUP.MOSAIC_WIDTH_RANGE = [S, 2 * S]
        cfg.INPUT.DISTORTION.ENABLED = True
        cfg.MODEL.YOLO.MAX_BOXES_NUM = 16
        cfg.freeze()
        return cfg

    def _tiles(self, b=8, m=16):
        rng = np.random.default_rng(31)
        return {
            "image": jnp.asarray(
                rng.integers(0, 255, (b, S, S, 3), np.uint8)
            ),
            "gt_boxes": jnp.asarray(
                np.concatenate(
                    [
                        xy := rng.uniform(2, S - 14, (b, m, 2)),
                        xy + rng.uniform(4, 12, (b, m, 2)),
                    ],
                    axis=-1,
                ).astype(np.float32)
            ),
            "gt_classes": jnp.asarray(
                rng.integers(0, 80, (b, m), np.int32)
            ),
            "gt_valid": jnp.asarray(rng.random((b, m)) < 0.5),
            "orig_hw": jnp.asarray(
                rng.uniform(S // 2, 4 * S, (b, 2)).astype(np.float32)
            ),
        }

    def test_jit_shapes_and_bounds(self, cfg):
        aug = D.DeviceAug(cfg)
        out = jax.jit(aug)(jax.random.PRNGKey(0), self._tiles())
        assert out["image"].shape == (8, S, S, 3)
        assert out["gt_boxes"].shape == (8, 16, 4)
        img = np.asarray(out["image"])
        assert np.isfinite(img).all()
        assert img.min() >= 0.0 and img.max() <= 255.0
        bx = np.asarray(out["gt_boxes"])
        v = np.asarray(out["gt_valid"])
        assert (bx[v][:, 0] <= bx[v][:, 2] + 1e-3).all()
        assert bx[v].min() >= -1e-3 and bx[v].max() <= S + 1e-3
        cls = np.asarray(out["gt_classes"])
        assert (cls[~v] == 0).all()

    def test_keys_differ(self, cfg):
        aug = D.DeviceAug(cfg)
        t = self._tiles()
        a = jax.jit(aug)(jax.random.PRNGKey(0), t)
        b = jax.jit(aug)(jax.random.PRNGKey(1), t)
        assert np.abs(np.asarray(a["image"]) - np.asarray(b["image"])).mean() > 1.0

    def test_passthrough_matches_tiles(self, cfg):
        aug = D.DeviceAug(cfg)
        t = self._tiles()
        out = aug.passthrough(t)
        assert out["image"].dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(out["image"]), np.asarray(t["image"], np.float32)
        )
        np.testing.assert_allclose(
            np.asarray(out["gt_boxes"]), np.asarray(t["gt_boxes"])
        )

    def test_feeds_train_step(self, cfg):
        """The production wrapper (make_device_aug_step) drives jitted YOLOX
        train steps — the fused on-device input pipeline of SURVEY §7 — and
        the DISABLE_AT_ITER lax.cond switches to the passthrough branch."""
        from yolov7_d2_tpu.engine import build_yolox_system

        cfg2 = cfg.clone()
        cfg2.defrost()
        cfg2.MODEL.YOLO.DEPTH_MUL = 0.33
        cfg2.MODEL.YOLO.WIDTH_MUL = 0.25
        cfg2.INPUT.MOSAIC_AND_MIXUP.DEVICE = True
        cfg2.INPUT.MOSAIC_AND_MIXUP.DISABLE_AT_ITER = 1
        cfg2.freeze()
        model, state, train_step, _ = build_yolox_system(cfg2, batch_size=2)
        step = jax.jit(D.make_device_aug_step(cfg2, train_step, seed=0))

        t = self._tiles(b=4)
        state, m0 = step(state, t)  # step 0: aug branch
        state, m1 = step(state, t)  # step 1: passthrough branch
        assert np.isfinite(float(m0["total_loss"]))
        assert np.isfinite(float(m1["total_loss"]))


class TestDevicePhotometric:
    """Elementwise device aug over packed (pre-augmented) batches: mixup
    blend + HSV + flip. Geometry stays offline (docs/PERF.md round 4:
    the gather-based device geometry measured ~100x off roofline)."""

    @pytest.fixture()
    def cfg(self):
        from yolov7_d2_tpu.config import get_cfg

        cfg = get_cfg()
        cfg.INPUT.INPUT_SIZE = [S, S]
        cfg.INPUT.MOSAIC_AND_MIXUP.ENABLED = True
        cfg.INPUT.MOSAIC_AND_MIXUP.ENABLE_MIXUP = True
        cfg.INPUT.DISTORTION.ENABLED = True
        cfg.INPUT.RANDOM_FLIP_HORIZONTAL.ENABLED = True
        cfg.MODEL.YOLO.MAX_BOXES_NUM = 16
        cfg.freeze()
        return cfg

    def _batch(self, b=8, m=16):
        rng = np.random.default_rng(7)
        xy = rng.uniform(2, S - 14, (b, m, 2))
        return {
            "image": jnp.asarray(rng.integers(0, 255, (b, S, S, 3), np.uint8)),
            "gt_boxes": jnp.asarray(
                np.concatenate([xy, xy + rng.uniform(4, 12, (b, m, 2))], -1)
                .astype(np.float32)
            ),
            "gt_classes": jnp.asarray(rng.integers(0, 80, (b, m), np.int32)),
            "gt_valid": jnp.asarray(rng.random((b, m)) < 0.5),
        }

    def test_shapes_and_finiteness(self, cfg):
        aug = D.DevicePhotometric(cfg)
        out = jax.jit(aug)(jax.random.PRNGKey(0), self._batch())
        assert out["image"].shape == (8, S, S, 3)
        assert out["image"].dtype == jnp.float32
        assert out["gt_boxes"].shape == (8, 16, 4)
        img = np.asarray(out["image"])
        assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 255

    def test_flip_only_is_exact_mirror(self, cfg):
        cfg2 = cfg.clone()
        cfg2.defrost()
        cfg2.INPUT.MOSAIC_AND_MIXUP.ENABLE_MIXUP = False
        cfg2.INPUT.DISTORTION.ENABLED = False
        cfg2.INPUT.RANDOM_FLIP_HORIZONTAL.PROB = 1.0
        cfg2.freeze()
        aug = D.DevicePhotometric(cfg2)
        b = self._batch()
        out = jax.jit(aug)(jax.random.PRNGKey(0), b)
        np.testing.assert_allclose(
            np.asarray(out["image"]),
            np.asarray(b["image"], np.float32)[:, :, ::-1],
        )
        # boxes: x -> S - x, order preserved through the valid-first pack
        ob = np.asarray(out["gt_boxes"])
        ov = np.asarray(out["gt_valid"])
        ib = np.asarray(b["gt_boxes"])
        iv = np.asarray(b["gt_valid"])
        for i in range(8):
            exp = ib[i][iv[i]]
            got = ob[i][ov[i]]
            np.testing.assert_allclose(got[:, 0], S - exp[:, 2], rtol=1e-6)
            np.testing.assert_allclose(got[:, 2], S - exp[:, 0], rtol=1e-6)
            np.testing.assert_allclose(got[:, 1::2], exp[:, 1::2], rtol=1e-6)

    def test_mixup_blend_is_half_half(self, cfg):
        cfg2 = cfg.clone()
        cfg2.defrost()
        cfg2.INPUT.DISTORTION.ENABLED = False
        cfg2.INPUT.RANDOM_FLIP_HORIZONTAL.ENABLED = False
        cfg2.MODEL.YOLO.MAX_BOXES_NUM = 32
        cfg2.freeze()
        aug = D.DevicePhotometric(cfg2)
        b = self._batch()
        out = jax.jit(aug)(jax.random.PRNGKey(3), b)
        img_in = np.asarray(b["image"], np.float32)
        img_out = np.asarray(out["image"])
        # every output image is either an input image or a 0.5/0.5 blend
        # of two input images (the partner permutation is internal)
        for i in range(8):
            direct = np.abs(img_out[i] - img_in[i]).max() < 1e-4
            blends = [
                np.abs(img_out[i] - 0.5 * (img_in[i] + img_in[j])).max() < 1e-4
                for j in range(8)
            ]
            assert direct or any(blends), i
        # mixed samples carry the partner's boxes too
        assert np.asarray(out["gt_valid"]).sum() >= np.asarray(
            b["gt_valid"]
        ).sum()

    def test_hsv_matches_device_kernel(self, cfg):
        """The HSV leg reuses hsv_distort (already differentially tested
        vs the host chain); here: distortion toggling changes pixels."""
        b = self._batch()
        aug = D.DevicePhotometric(cfg)
        cfg2 = cfg.clone()
        cfg2.defrost()
        cfg2.INPUT.DISTORTION.ENABLED = False
        cfg2.freeze()
        aug_off = D.DevicePhotometric(cfg2)
        a = jax.jit(aug)(jax.random.PRNGKey(5), b)
        c = jax.jit(aug_off)(jax.random.PRNGKey(5), b)
        assert np.abs(
            np.asarray(a["image"]) - np.asarray(c["image"])
        ).mean() > 0.5

    def test_packed_photo_step_runs_and_disables(self, cfg):
        from yolov7_d2_tpu.engine import build_yolox_system

        cfg2 = cfg.clone()
        cfg2.defrost()
        cfg2.MODEL.YOLO.DEPTH_MUL = 0.33
        cfg2.MODEL.YOLO.WIDTH_MUL = 0.25
        cfg2.INPUT.MOSAIC_AND_MIXUP.DISABLE_AT_ITER = 1
        cfg2.freeze()
        model, state, train_step, _ = build_yolox_system(cfg2, batch_size=2)
        step = jax.jit(D.make_packed_photo_step(cfg2, train_step, seed=0))
        b = self._batch(b=4)
        state, m0 = step(state, b)  # aug branch
        state, m1 = step(state, b)  # passthrough branch
        assert np.isfinite(float(m0["total_loss"]))
        assert np.isfinite(float(m1["total_loss"]))
