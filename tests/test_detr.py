import jax
import jax.numpy as jnp
import numpy as np

from yolov7_d2_tpu.models.layers.transformer import (
    MLP,
    Transformer,
    sine_position_embedding,
)
from yolov7_d2_tpu.models.meta_arch.detr import (
    DETR,
    detr_losses,
    detr_match,
    detr_postprocess,
    detr_set_criterion,
)


def test_sine_pe_shape_and_distinctness():
    pe = sine_position_embedding(4, 6, 64)
    assert pe.shape == (4, 6, 128)
    # distinct positions get distinct embeddings
    flat = np.asarray(pe).reshape(-1, 128)
    assert len(np.unique(flat.round(4), axis=0)) == 24
    assert np.all(np.abs(flat) <= 1.0 + 1e-6)


def test_transformer_shapes():
    tr = Transformer(d_model=32, nhead=4, num_encoder_layers=2,
                     num_decoder_layers=2, dim_feedforward=64)
    src = jnp.zeros((2, 12, 32))
    pos = jnp.zeros((2, 12, 32))
    q = jnp.zeros((5, 32))
    v = tr.init(jax.random.PRNGKey(0), src, pos, q)
    hs, mem = tr.apply(v, src, pos, q)
    assert hs.shape == (2, 2, 5, 32)
    assert mem.shape == (2, 12, 32)


def test_detr_match_prefers_correct_pairs():
    B, Q, G, C = 1, 6, 3, 4
    logits = jnp.full((B, Q, C + 1), -5.0).at[..., C].set(5.0)  # all no-object
    # queries 2 and 4 confidently predict class 1 and 2
    logits = logits.at[0, 2, 1].set(8.0).at[0, 2, C].set(-5.0)
    logits = logits.at[0, 4, 2].set(8.0).at[0, 4, C].set(-5.0)
    boxes = jnp.full((B, Q, 4), 0.5) * jnp.array([0.9, 0.9, 0.1, 0.1])
    boxes = boxes.at[0, 2].set(jnp.array([0.3, 0.3, 0.2, 0.2]))
    boxes = boxes.at[0, 4].set(jnp.array([0.7, 0.7, 0.2, 0.2]))
    gt_boxes = jnp.zeros((B, G, 4)).at[0, 0].set(
        jnp.array([0.3, 0.3, 0.2, 0.2])
    ).at[0, 1].set(jnp.array([0.7, 0.7, 0.2, 0.2]))
    gt_classes = jnp.zeros((B, G), jnp.int32).at[0, 0].set(1).at[0, 1].set(2)
    gt_valid = jnp.zeros((B, G), bool).at[0, 0].set(True).at[0, 1].set(True)
    pred_of_gt, ok = detr_match(logits, boxes, gt_boxes, gt_classes, gt_valid)
    assert int(pred_of_gt[0, 0]) == 2
    assert int(pred_of_gt[0, 1]) == 4
    assert bool(ok[0, 0]) and bool(ok[0, 1]) and not bool(ok[0, 2])


def test_set_criterion_finite_and_sensible():
    B, Q, G, C = 2, 8, 4, 3
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(rng, (B, Q, C + 1))
    boxes = jax.nn.sigmoid(jax.random.normal(rng, (B, Q, 4)))
    gt_boxes = jnp.tile(jnp.array([[[0.5, 0.5, 0.2, 0.2]]]), (B, G, 1))
    gt_classes = jnp.ones((B, G), jnp.int32)
    gt_valid = jnp.zeros((B, G), bool).at[:, 0].set(True)
    losses = detr_set_criterion(
        logits, boxes, gt_boxes, gt_classes, gt_valid, C
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_detr_forward_loss_grads_tiny():
    model = DETR(num_classes=4, hidden_dim=32, num_queries=8, nheads=4,
                 enc_layers=1, dec_layers=2, dim_feedforward=64,
                 resnet_depth=18)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3)) * 255
    variables = model.init(jax.random.PRNGKey(1), imgs, train=False)
    batch = {
        "gt_boxes": jnp.tile(jnp.array([[[8.0, 8.0, 40.0, 40.0]]]), (1, 4, 1)),
        "gt_classes": jnp.ones((1, 4), jnp.int32),
        "gt_valid": jnp.zeros((1, 4), bool).at[:, 0].set(True),
    }

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            imgs, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        l = detr_losses(out, batch, 4, (64, 64))
        return l["total_loss"], l

    (total, aux), grads = jax.value_and_grad(loss, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    assert "aux0_loss_ce" in aux  # deep supervision present
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)


def test_detr_postprocess_contract():
    out = {
        "pred_logits": jnp.zeros((2, 10, 5)),
        "pred_boxes": jnp.full((2, 10, 4), 0.5),
    }
    dets = detr_postprocess(out, (64, 64), max_detections=5)
    assert dets.boxes.shape == (2, 5, 4)
    # cxcywh(0.5, 0.5, 0.5, 0.5) * 64 -> xyxy (16, 16, 48, 48)
    np.testing.assert_allclose(np.asarray(dets.boxes[0, 0]), [16, 16, 48, 48])


def test_transformer_remat_is_identity():
    """MODEL.DETR.REMAT (nn.remat over encoder/decoder layers) must be a
    pure memory/recompute trade: identical params, identical outputs and
    gradients vs the non-remat graph (docs/PERF.md round-5 batch-cliff
    levers)."""
    kw = dict(d_model=32, nhead=4, num_encoder_layers=2,
              num_decoder_layers=2, dim_feedforward=64)
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 32))
    pos = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 32))
    q = jax.random.normal(jax.random.PRNGKey(3), (5, 32))

    plain = Transformer(**kw)
    remat = Transformer(remat=True, **kw)
    v = plain.init(jax.random.PRNGKey(0), src, pos, q)
    # same variable tree: remat must not change parameter structure
    v2 = remat.init(jax.random.PRNGKey(0), src, pos, q)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    def loss(variables, mod):
        hs, mem = mod.apply(variables, src, pos, q)
        return jnp.sum(hs ** 2) + jnp.sum(mem ** 2)

    l1, g1 = jax.value_and_grad(loss)(v, plain)
    l2, g2 = jax.value_and_grad(loss)(v, remat)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    # gradients: the recomputed forward may fuse/round differently in f32,
    # so compare at recompute-rounding tolerance normalized by the GLOBAL
    # gradient scale (per-leaf scaling would amplify pure rounding noise on
    # leaves whose true gradient is ~0, e.g. key-projection biases, which
    # softmax shift-invariance zeroes mathematically)
    leaves1 = jax.tree_util.tree_leaves(g1)
    leaves2 = jax.tree_util.tree_leaves(g2)
    gscale = max(float(np.abs(np.asarray(x)).max()) for x in leaves1)
    for a, b in zip(leaves1, leaves2):
        d = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        assert d / gscale < 1e-4, (d, gscale)
