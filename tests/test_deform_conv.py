import jax
import jax.numpy as jnp
import numpy as np

from yolov7_d2_tpu.ops.deform_conv import (
    DeformConv,
    bilinear_sample,
    deform_sample_taps,
)


def test_bilinear_sample_exact_at_integers():
    img = jnp.arange(16.0).reshape(1, 4, 4, 1)
    ys, xs = jnp.meshgrid(jnp.arange(4.0), jnp.arange(4.0), indexing="ij")
    out = bilinear_sample(img, xs[None], ys[None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))


def test_bilinear_sample_interpolates():
    img = jnp.zeros((1, 2, 2, 1)).at[0, 0, 1, 0].set(4.0)
    # halfway between (0,0)=0 and (0,1)=4 -> 2
    out = bilinear_sample(
        img, jnp.full((1, 1, 1), 0.5), jnp.zeros((1, 1, 1))
    )
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), 2.0)


def test_bilinear_sample_zero_outside():
    img = jnp.ones((1, 2, 2, 1))
    out = bilinear_sample(
        img, jnp.full((1, 1, 1), -5.0), jnp.zeros((1, 1, 1))
    )
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), 0.0)


def test_zero_offsets_reduce_to_plain_conv_taps():
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 6, 6, 2))
    offsets = jnp.zeros((1, 6, 6, 18))
    taps = deform_sample_taps(x, offsets, kernel=3)
    assert taps.shape == (1, 6, 6, 18)
    # center tap (index 4) equals the input itself
    np.testing.assert_allclose(
        np.asarray(taps[..., 4 * 2 : 4 * 2 + 2]), np.asarray(x), rtol=1e-6
    )


def test_deform_conv_forward_and_grads():
    m = DeformConv(features=8)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 4))
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (2, 8, 8, 8)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(v)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # offset conv initialized to zero -> behaves like a plain conv at init
    assert np.all(np.isfinite(np.asarray(out)))
