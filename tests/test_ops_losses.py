import jax
import jax.numpy as jnp
import numpy as np

from yolov7_d2_tpu.ops.losses import (
    dice_loss,
    dice_score,
    masked_mean,
    sigmoid_binary_cross_entropy,
    sigmoid_focal_loss,
    smooth_l1_loss,
    softmax_cross_entropy,
    weighted_softmax_cross_entropy,
)


def test_bce_matches_formula():
    logits = jnp.array([-2.0, 0.0, 3.0])
    targets = jnp.array([0.0, 1.0, 1.0])
    expected = -(
        targets * np.log(jax.nn.sigmoid(logits))
        + (1 - targets) * np.log(1 - jax.nn.sigmoid(logits))
    )
    np.testing.assert_allclose(
        np.asarray(sigmoid_binary_cross_entropy(logits, targets)),
        np.asarray(expected),
        rtol=1e-4,
    )


def test_bce_stable_at_extreme_logits():
    out = sigmoid_binary_cross_entropy(jnp.array([100.0, -100.0]), jnp.array([1.0, 0.0]))
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.asarray(out) < 1e-3)


def test_focal_downweights_easy_examples():
    easy = sigmoid_focal_loss(jnp.array([5.0]), jnp.array([1.0]))
    hard = sigmoid_focal_loss(jnp.array([-5.0]), jnp.array([1.0]))
    ce_easy = sigmoid_binary_cross_entropy(jnp.array([5.0]), jnp.array([1.0]))
    assert float(hard[0]) > float(easy[0])
    # focal is far below plain CE on easy examples
    assert float(easy[0]) < float(ce_easy[0]) * 0.1


def test_focal_gamma_zero_alpha_recovers_ce():
    logits = jnp.array([1.3, -0.7])
    t = jnp.array([1.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(sigmoid_focal_loss(logits, t, alpha=-1.0, gamma=0.0)),
        np.asarray(sigmoid_binary_cross_entropy(logits, t)),
        rtol=1e-5,
    )


def test_softmax_ce_golden():
    logits = jnp.array([[1.0, 2.0, 3.0]])
    labels = jnp.array([2])
    expected = -np.log(np.exp(3) / np.exp([1, 2, 3]).sum())
    np.testing.assert_allclose(
        float(softmax_cross_entropy(logits, labels, 3)[0]), expected, rtol=1e-3
    )


def test_weighted_ce_applies_class_weight():
    logits = jnp.array([[1.0, 2.0], [1.0, 2.0]])
    labels = jnp.array([0, 1])
    w = jnp.array([1.0, 0.1])
    out = weighted_softmax_cross_entropy(logits, labels, w)
    plain = softmax_cross_entropy(logits, labels, 2)
    np.testing.assert_allclose(float(out[1]), float(plain[1]) * 0.1, rtol=1e-5)


def test_dice_perfect_and_disjoint():
    a = jnp.array([[1.0, 1.0, 0.0, 0.0]])
    assert float(dice_loss(a, a, smooth=0.0)[0]) < 1e-6
    b = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    assert float(dice_loss(a, b, smooth=0.0)[0]) == 1.0
    assert float(dice_score(a, a)[0]) > 0.999


def test_smooth_l1_regions():
    np.testing.assert_allclose(
        float(smooth_l1_loss(jnp.array(0.5), jnp.array(0.0))), 0.125
    )
    np.testing.assert_allclose(
        float(smooth_l1_loss(jnp.array(2.0), jnp.array(0.0))), 1.5
    )


def test_masked_mean_ignores_invalid():
    v = jnp.array([1.0, 2.0, 100.0])
    m = jnp.array([True, True, False])
    np.testing.assert_allclose(float(masked_mean(v, m)), 1.5)
    # empty mask does not divide by zero
    assert np.isfinite(float(masked_mean(v, jnp.zeros(3, bool))))


def test_quality_focal_loss_continuous_targets():
    from yolov7_d2_tpu.ops.losses import quality_focal_loss

    # perfect prediction of the quality score -> near-zero loss
    t = jnp.array([0.7])
    logit = jnp.log(t / (1 - t))
    assert float(quality_focal_loss(logit, t)[0]) < 1e-3
    # far prediction -> large loss
    far = quality_focal_loss(jnp.array([-5.0]), t)
    assert float(far[0]) > 1.0


def test_distribution_focal_loss_and_expectation():
    from yolov7_d2_tpu.ops.losses import (
        dfl_expectation,
        distribution_focal_loss,
    )

    n_bins = 8
    # a sharply peaked distribution at the true position minimizes the loss
    target = jnp.array([3.4])
    peaked = jnp.full((1, n_bins), -10.0)
    peaked = peaked.at[0, 3].set(10.0 * 0.6).at[0, 4].set(10.0 * 0.4)
    uniform = jnp.zeros((1, n_bins))
    assert float(distribution_focal_loss(peaked, target)[0]) < float(
        distribution_focal_loss(uniform, target)[0]
    )
    # expectation decode recovers the position for an exact soft label
    logits = jnp.log(jnp.array([[0, 0, 0, 0.6, 0.4, 0, 0, 0]]) + 1e-9)
    np.testing.assert_allclose(float(dfl_expectation(logits)[0]), 3.4, atol=1e-3)
    # gradient exists
    g = jax.grad(
        lambda l: jnp.sum(distribution_focal_loss(l, target))
    )(uniform)
    assert np.all(np.isfinite(np.asarray(g)))
