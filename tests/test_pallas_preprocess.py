import jax.numpy as jnp
import numpy as np

from yolov7_d2_tpu.ops.pallas_preprocess import (
    fused_normalize,
    pallas_grid_mask,
    reference_normalize,
)


def test_fused_normalize_matches_reference():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), np.uint8))
    mean = jnp.asarray([103.53, 116.28, 123.675])
    std = jnp.asarray([57.375, 57.12, 58.395])
    out = fused_normalize(imgs, mean, std, out_dtype=jnp.float32)
    ref = reference_normalize(imgs, mean, std, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_normalize_bf16_output():
    imgs = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    out = fused_normalize(
        imgs, jnp.zeros(3), jnp.ones(3) * 255.0, out_dtype=jnp.bfloat16
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), 0.0)


def test_grid_mask_on_device():
    imgs = jnp.full((2, 32, 32, 3), 100.0, jnp.float32)
    # d=8, keep=4, offsets 0, mode 0 (drop grid bands)
    params = jnp.tile(jnp.array([[8, 4, 0, 0, 0]], jnp.int32), (2, 1))
    out = np.asarray(pallas_grid_mask(imgs, params))
    assert (out == 0).any() and (out == 100.0).any()
    # row 0 is inside a dropped band ((0 % 8) < 4), row 5 kept in y but
    # columns repeat the same pattern
    assert out[0, 0, 5, 0] == 0.0
    assert out[0, 5, 5, 0] == 100.0
    # mode 1 inverts the kept set
    params1 = jnp.tile(jnp.array([[8, 4, 0, 0, 1]], jnp.int32), (2, 1))
    out1 = np.asarray(pallas_grid_mask(imgs, params1))
    np.testing.assert_array_equal((out1 == 0), (out != 0))
