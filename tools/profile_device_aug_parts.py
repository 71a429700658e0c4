"""Per-stage timing of the device-side aug (scalar-fetch synchronized —
block_until_ready returns early on the axon tunnel, which is why the
"aug-only" number in bench_device_aug_train.py run logs is bogus).

Stages: full aug | mosaic+warp image gather | hsv | boxes+pack | mixup.

Usage: python tools/profile_device_aug_parts.py [batch] [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 640


def timed(name, fn, *args, iters=5):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    # scalar fetch sync
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:.2f} ms/batch", flush=True)
    return dt


def main():
    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.data import device_aug as da

    cfg = get_cfg()
    cfg.INPUT.INPUT_SIZE = [SIZE, SIZE]
    cfg.INPUT.MOSAIC_AND_MIXUP.ENABLED = True
    cfg.INPUT.DISTORTION.ENABLED = True
    cfg.freeze()
    aug = da.DeviceAug(cfg)

    rng = np.random.default_rng(0)
    tiles = {
        "image": jnp.asarray(
            rng.integers(0, 255, (BATCH, SIZE, SIZE, 3), np.uint8)
        ),
        "gt_boxes": jnp.asarray(
            np.tile([[10.0, 10.0, 60.0, 60.0]], (BATCH, 120, 1)).astype(
                np.float32
            )
        ),
        "gt_classes": jnp.zeros((BATCH, 120), jnp.int32),
        "gt_valid": jnp.asarray(rng.random((BATCH, 120)) < 0.1),
        "orig_hw": jnp.asarray(
            rng.uniform(480, 640, (BATCH, 2)).astype(np.float32)
        ),
    }

    key = jax.random.PRNGKey(0)
    timed("full aug", jax.jit(lambda k, t: aug(k, t)), key, tiles)

    # ---- stage kernels, same params
    params = da.sample_params(key, BATCH, **aug.kw)
    images = tiles["image"]
    S = SIZE
    pool_flat = images.reshape(BATCH * S * S, 3)
    orig_hw = tiles["orig_hw"].astype(jnp.float32)
    pre_scale = jnp.minimum(S / orig_hw[:, 0], S / orig_hw[:, 1])
    pre_hw = orig_hw * pre_scale[:, None]
    out_hw = (SIZE, SIZE)

    def mosaic_only(p):
        def one(p):
            idx = p.tile_idx
            t_orig = orig_hw[idx]
            t_pre = pre_hw[idx]
            ch, cw = p.canvas_hw[0], p.canvas_hw[1]
            s_c = jnp.minimum(ch / t_orig[:, 0], cw / t_orig[:, 1])
            t_canvas = t_orig * s_c[:, None]
            rect, pad = da._mosaic_placement(
                p.canvas_hw, p.center_yx, t_canvas
            )
            M = da.perspective_matrix(
                out_hw, p.canvas_hw, p.angle, p.pscale, p.shear,
                p.translate, p.persp,
            )
            return da.mosaic_perspective_image(
                pool_flat, S, out_hw, idx, t_pre, t_canvas, rect, pad, M
            )

        return jax.vmap(one)(p)

    img = timed("mosaic+warp image", jax.jit(mosaic_only), params)

    imgf = jnp.full((BATCH, SIZE, SIZE, 3), 100.0, jnp.float32)
    timed(
        "hsv",
        jax.jit(
            lambda im, p: jax.vmap(da.hsv_distort)(im, p.dhue, p.dsat, p.dexp)
        ),
        imgf,
        params,
    )

    def mix_only(p, im):
        def one(p, im):
            j = p.mix_idx
            mixed, _, _ = da.mixup_image(
                pool_flat, S, out_hw, im, j, pre_hw[j], orig_hw[j],
                p.mix_jit, p.mix_flip,
            )
            return mixed

        return jax.vmap(one)(p, im)

    timed("mixup image", jax.jit(mix_only), params, imgf)


if __name__ == "__main__":
    main()
