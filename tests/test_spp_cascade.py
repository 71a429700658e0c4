"""SPPF cascade identity: stride-1 maxpool composition equals the parallel
pyramid (reference wrappers.py:142 runs 5/9/13 pools in parallel; we run
mp5 three times — mp5∘mp5 = mp9, mp5∘mp5∘mp5 = mp13)."""

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import pytest

from yolov7_d2_tpu.models.layers.blocks import SPPBottleneck


def _direct_pool(x, k):
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(1, 1), padding=[(p, p), (p, p)])


@pytest.mark.parametrize("ks", [(5, 9, 13), (3, 5, 7)])
def test_cascade_equals_parallel_pyramid(ks):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 19, 8))
    k = ks[0]
    y, cascade = x, []
    for _ in ks:
        y = _direct_pool(y, k)
        cascade.append(y)
    direct = [_direct_pool(x, kk) for kk in ks]
    for c, d, kk in zip(cascade, direct, ks):
        np.testing.assert_allclose(np.asarray(c), np.asarray(d), err_msg=f"k={kk}")


@pytest.mark.parametrize("ks", [(5, 9, 13), (3, 5, 9)])  # cascade + fallback
def test_spp_module_runs_both_paths(ks):
    m = SPPBottleneck(out_channels=16, kernel_sizes=ks)
    x = jnp.ones((1, 16, 16, 8))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (1, 16, 16, 16)
    assert bool(jnp.isfinite(out).all())






def test_focus_folded_conv_matches_space_to_depth():
    """Focus's folded stem (space-to-depth scattered into a 2kx2k stride-2
    kernel, blocks.py _FoldedFocusConv) must equal the explicit
    transpose/concat formulation with the SAME parameters — both in eval
    and in train mode (BN batch stats see the identical conv output)."""
    from yolov7_d2_tpu.models.layers.blocks import Focus

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 24, 3)) * 3.0
    folded = Focus(out_channels=8, ksize=3, fold=True)
    explicit = Focus(out_channels=8, ksize=3, fold=False)
    variables = folded.init(jax.random.PRNGKey(2), x, train=False)
    # identical param tree by construction — reuse directly
    y_f = folded.apply(variables, x, train=False)
    y_e = explicit.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_f), np.asarray(y_e), rtol=1e-5, atol=1e-5
    )

    # train mode: outputs and the BN running stats both agree
    y_f, m_f = folded.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    y_e, m_e = explicit.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(y_f), np.asarray(y_e), rtol=1e-5, atol=1e-5
    )
    for vf, ve in zip(
        jax.tree_util.tree_leaves(m_f), jax.tree_util.tree_leaves(m_e)
    ):
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(ve), rtol=1e-5, atol=1e-6
        )


def test_focus_folded_gradients_match():
    from yolov7_d2_tpu.models.layers.blocks import Focus

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 12, 12, 3))
    folded = Focus(out_channels=4, ksize=3, fold=True)
    explicit = Focus(out_channels=4, ksize=3, fold=False)
    variables = folded.init(jax.random.PRNGKey(4), x, train=False)

    def loss(params, module):
        out = module.apply(
            {**variables, "params": params}, x, train=False
        )
        return jnp.sum(out ** 2)

    g_f = jax.grad(loss)(variables["params"], folded)
    g_e = jax.grad(loss)(variables["params"], explicit)
    for vf, ve in zip(
        jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_e)
    ):
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(ve), rtol=1e-4, atol=1e-5
        )
