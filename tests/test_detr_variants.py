import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov7_d2_tpu.models.layers.rcda import RCDAttention, pos2posemb2d
from yolov7_d2_tpu.models.meta_arch.detr import detr_losses
from yolov7_d2_tpu.models.meta_arch.detr_variants import (
    AnchorDETR,
    DABDETR,
    SMCADETR,
    anchor_detr_postprocess,
    inverse_sigmoid,
)

S = 64


def test_inverse_sigmoid_roundtrip():
    x = jnp.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))), np.asarray(x),
        rtol=1e-5,
    )


def test_pos2posemb2d_shape():
    pts = jnp.array([[0.5, 0.5], [0.1, 0.9]])
    emb = pos2posemb2d(pts, 64)
    assert emb.shape == (2, 128)


def test_rcda_matches_full_attention_on_uniform():
    """With H=1 the factored attention must equal full attention over W."""
    attn = RCDAttention(embed_dim=16, num_heads=2)
    b, h, w, q = 1, 1, 6, 3
    rng = jax.random.PRNGKey(0)
    mem = jax.random.normal(rng, (b, h, w, 16))
    qr = jax.random.normal(jax.random.PRNGKey(1), (b, q, 16))
    v = attn.init(jax.random.PRNGKey(2), qr, qr, mem, mem, mem)
    out = attn.apply(v, qr, qr, mem, mem, mem)
    assert out.shape == (b, q, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def _batch(b=1, g=4):
    return {
        "gt_boxes": jnp.tile(jnp.array([[[8.0, 8.0, 40.0, 40.0]]]), (b, g, 1)),
        "gt_classes": jnp.ones((b, g), jnp.int32),
        "gt_valid": jnp.zeros((b, g), bool).at[:, 0].set(True),
    }


@pytest.mark.parametrize(
    "cls,kw,use_focal",
    [
        (AnchorDETR, dict(num_query_position=16, num_query_pattern=2,
                          hidden_dim=32, nheads=4, enc_layers=1,
                          dec_layers=2, dim_feedforward=64,
                          resnet_depth=18, spatial_prior="grid"), True),
        (SMCADETR, dict(num_queries=8, hidden_dim=32, nheads=4,
                        enc_layers=1, dec_layers=2, dim_feedforward=64,
                        resnet_depth=18), False),
        (DABDETR, dict(num_queries=8, hidden_dim=32, nheads=4,
                       enc_layers=1, dec_layers=2, dim_feedforward=64,
                       resnet_depth=18), False),
    ],
)
def test_variant_forward_loss_grads(cls, kw, use_focal):
    model = cls(num_classes=4, **kw)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, S, S, 3)) * 255
    v = model.init(jax.random.PRNGKey(1), imgs, train=False)
    batch = _batch()

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            imgs, train=True, mutable=["batch_stats"],
        )
        l = detr_losses(out, batch, 4, (S, S), use_focal=use_focal)
        return l["total_loss"], l

    (total, aux), grads = jax.value_and_grad(loss, has_aux=True)(v["params"])
    assert np.isfinite(float(total))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)


def test_anchor_detr_postprocess():
    out = {
        "pred_logits": jnp.zeros((2, 12, 4)),
        "pred_boxes": jnp.full((2, 12, 4), 0.5),
    }
    dets = anchor_detr_postprocess(out, (S, S), max_detections=6)
    assert dets.boxes.shape == (2, 6, 4)
    assert dets.classes.shape == (2, 6)


def test_variant_registry():
    import yolov7_d2_tpu.models  # noqa: F401
    from yolov7_d2_tpu.core.registry import META_ARCH_REGISTRY

    for name in ["AnchorDetr", "SMCADetr", "DABDetr", "DetrD2go", "SOLOv2"]:
        assert name in META_ARCH_REGISTRY, name
