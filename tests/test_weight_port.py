import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov7_d2_tpu.models.meta_arch.yolox import YOLOX
from yolov7_d2_tpu.utils.weight_port import (
    convert_conv_weight,
    map_yolox_torch_name,
    port_torch_state_dict,
)


def test_conv_layout_conversion():
    w = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    out = convert_conv_weight(w)
    assert out.shape == (5, 7, 3, 2)
    # spot check an element: torch w[o,i,kh,kw] == flax out[kh,kw,i,o]
    assert out[4, 6, 2, 1] == w[1, 2, 4, 6]


@pytest.mark.parametrize(
    "torch_name,expected",
    [
        ("backbone.stem.conv.conv", ("backbone", "stem", "conv", "conv")),
        ("backbone.dark2.0.conv", ("backbone", "dark2_conv", "conv")),
        ("backbone.dark2.0.bn", ("backbone", "dark2_conv", "bn")),
        (
            "backbone.dark3.1.m.0.conv1.conv",
            ("backbone", "dark3_csp", "m_0", "conv1", "conv"),
        ),
        ("backbone.dark5.1.conv1.conv", ("backbone", "dark5_spp", "conv1", "conv")),
        ("backbone.dark5.2.conv3.bn", ("backbone", "dark5_csp", "conv3", "bn")),
        ("neck.lateral_conv0.conv", ("neck", "lateral_conv0", "conv")),
        (
            "neck.C3_p4.m.1.conv2.bn",
            ("neck", "C3_p4", "m_1", "conv2", "bn"),
        ),
        ("head.stems.0.conv", ("head", "stem_0", "conv")),
        ("head.cls_convs.1.0.conv", ("head", "cls_conv_1_0", "conv")),
        ("head.cls_preds.2", ("head", "cls_pred_2")),
        ("head.obj_preds.0", ("head", "obj_pred_0")),
    ],
)
def test_name_mapping(torch_name, expected):
    assert map_yolox_torch_name(torch_name) == expected


def _flax_to_torch_state_dict(variables):
    """Inverse mapping for round-trip testing: walk our model tree and emit
    reference-style torch keys with torch layouts."""
    import jax

    sd = {}

    inv_head = {}
    # build reverse map by enumerating plausible torch names and mapping them
    def emit(params, stats, prefix_parts, torch_prefix):
        pass

    # instead: flatten our variables, convert each path to a torch name
    def path_to_torch(parts):
        parts = list(parts)
        out = []
        i = 0
        if parts[0] == "backbone":
            out.append("backbone")
            p = parts[1]
            if p == "stem":
                out.append("stem")
            elif p.endswith("_conv"):
                out.append(p[:-5] + ".0")
            elif p.endswith("_spp"):
                out.append(p[:-4] + ".1")
            elif p.endswith("_csp"):
                lvl = p[:-4]
                out.append(lvl + (".2" if lvl == "dark5" else ".1"))
            rest = parts[2:]
        elif parts[0] == "neck":
            out.append("neck")
            out.append(parts[1])
            rest = parts[2:]
        elif parts[0] == "head":
            out.append("head")
            p = parts[1]
            import re

            m = re.match(r"stem_(\d+)", p)
            if m:
                out.append(f"stems.{m.group(1)}")
            m = re.match(r"(cls|reg)_conv_(\d+)_(\d+)", p)
            if m:
                out.append(f"{m.group(1)}_convs.{m.group(2)}.{m.group(3)}")
            m = re.match(r"(cls|reg|obj)_pred_(\d+)", p)
            if m:
                out.append(f"{m.group(1)}_preds.{m.group(2)}")
            rest = parts[2:]
        else:
            raise KeyError(parts)
        for r in rest:
            if r.startswith("m_"):
                out.append("m." + r[2:])
            else:
                out.append(r)
        return ".".join(out)

    flat_params = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    for path, value in flat_params:
        parts = [p.key for p in path]
        leaf = parts[-1]
        torch_mod = path_to_torch(parts[:-1])
        v = np.asarray(value)
        if leaf == "kernel" and v.ndim == 4:
            sd[torch_mod + ".weight"] = np.transpose(v, (3, 2, 0, 1))
        elif leaf == "kernel" and v.ndim == 2:
            sd[torch_mod + ".weight"] = v.T
        elif leaf == "scale":
            sd[torch_mod + ".weight"] = v
        elif leaf == "bias":
            sd[torch_mod + ".bias"] = v
    flat_stats = jax.tree_util.tree_flatten_with_path(
        variables.get("batch_stats", {})
    )[0]
    for path, value in flat_stats:
        parts = [p.key for p in path]
        leaf = parts[-1]
        torch_mod = path_to_torch(parts[:-1])
        v = np.asarray(value)
        if leaf == "mean":
            sd[torch_mod + ".running_mean"] = v
        elif leaf == "var":
            sd[torch_mod + ".running_var"] = v
    return sd


def test_roundtrip_port_full_yolox():
    """Flax -> synthetic reference-style torch dict -> port back == identity,
    and EVERY torch key is consumed (validates the name mapping over the
    entire YOLOX tree, not just the spot checks)."""
    model = YOLOX(num_classes=3, depth_mul=0.33, width_mul=0.125)
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(42), imgs, train=False)
    # randomize so a wrong mapping can't silently pass with zeros
    variables = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(x.size % 97), x.shape),
        variables,
    )
    sd = _flax_to_torch_state_dict(variables)
    assert len(sd) > 100

    target = model.init(jax.random.PRNGKey(0), imgs, train=False)
    ported, report = port_torch_state_dict(sd, target, strict=True)
    assert not report["unused"]

    # every leaf identical to the source
    src_flat = jax.tree_util.tree_leaves(variables["params"])
    dst_flat = jax.tree_util.tree_leaves(ported["params"])
    for a, b in zip(src_flat, dst_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    src_bs = jax.tree_util.tree_leaves(variables["batch_stats"])
    dst_bs = jax.tree_util.tree_leaves(ported["batch_stats"])
    for a, b in zip(src_bs, dst_bs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_shape_mismatch_raises():
    model = YOLOX(num_classes=3, depth_mul=0.33, width_mul=0.125)
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    bad = {"backbone.stem.conv.conv.weight": np.zeros((7, 7, 3, 3), np.float32)}
    with pytest.raises(ValueError):
        port_torch_state_dict(bad, variables)


def test_d2_resnet_roundtrip():
    """flax ResNet -> synthetic d2-style state dict -> port back == identity
    (validates map_d2_resnet_name over the whole tree)."""
    import re as _re

    from yolov7_d2_tpu.models.backbones.resnet import ResNet
    from yolov7_d2_tpu.utils.weight_port import port_d2_resnet_state_dict

    bb = ResNet(depth=18, frozen_bn=False)
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = bb.init(jax.random.PRNGKey(3), imgs)
    variables = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(x.size % 89), x.shape),
        variables,
    )

    sd = {}

    def emit(parts, v, collection):
        leaf = parts[-1]
        owner = parts[-2]  # 'conv' or 'bn'
        if parts[0] == "stem":
            mod = "backbone.stem.conv1"
        else:
            m = _re.match(r"res(\d)_(\d+)", parts[0])
            mod = f"backbone.res{m.group(1)}.{m.group(2)}.{parts[1]}"
        v = np.asarray(v)
        if owner == "bn":
            name = {"scale": "weight", "bias": "bias",
                    "mean": "running_mean", "var": "running_var"}[leaf]
            sd[f"{mod}.norm.{name}"] = v
        elif leaf == "kernel":
            sd[f"{mod}.weight"] = np.transpose(v, (3, 2, 0, 1))
        else:
            sd[f"{mod}.{leaf}"] = v

    def walk(tree, parts, collection):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, parts + [k], collection)
            else:
                emit(parts + [k], v, collection)

    walk(variables["params"], [], "params")
    walk(variables["batch_stats"], [], "batch_stats")
    assert len(sd) > 50

    # our flax tree sits under a 'backbone' module inside the meta-archs;
    # wrap the bare ResNet tree the same way for porting
    fresh = bb.init(jax.random.PRNGKey(0), imgs)
    target = {
        "params": {"backbone": fresh["params"]},
        "batch_stats": {"backbone": fresh["batch_stats"]},
    }
    ported, report = port_d2_resnet_state_dict(sd, target, strict=True)
    assert not report["unused"]
    for a, b in zip(
        jax.tree_util.tree_leaves(variables["params"]),
        jax.tree_util.tree_leaves(ported["params"]["backbone"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(variables["batch_stats"]),
        jax.tree_util.tree_leaves(ported["batch_stats"]["backbone"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_detr_attention_split_and_roundtrip():
    """flax DETR -> synthetic reference-style torch dict (fused qkv) ->
    port back == identity over the transformer + heads."""
    import re as _re

    from yolov7_d2_tpu.models.meta_arch.detr import DETR
    from yolov7_d2_tpu.utils.weight_port import port_detr_state_dict

    H = 4
    model = DETR(num_classes=3, hidden_dim=32, num_queries=6, nheads=H,
                 enc_layers=1, dec_layers=1, dim_feedforward=64,
                 resnet_depth=18)
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(7), imgs, train=False)
    variables = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(x.size % 83), x.shape),
        variables,
    )

    sd = {}

    def emit_attn(prefix_torch, tree):
        e = tree["query"]["kernel"].shape[0]
        hd = e // H
        ws, bs = [], []
        for part in ("query", "key", "value"):
            w = np.asarray(tree[part]["kernel"]).reshape(e, e).T  # [E,E]
            b = np.asarray(tree[part]["bias"]).reshape(e)
            ws.append(w); bs.append(b)
        sd[prefix_torch + ".in_proj_weight"] = np.concatenate(ws, 0)
        sd[prefix_torch + ".in_proj_bias"] = np.concatenate(bs, 0)
        sd[prefix_torch + ".out_proj.weight"] = (
            np.asarray(tree["out"]["kernel"]).reshape(e, e).T
        )
        sd[prefix_torch + ".out_proj.bias"] = np.asarray(tree["out"]["bias"])

    p = variables["params"]
    t = p["transformer"]
    emit_attn("detr.transformer.encoder.layers.0.self_attn",
              t["enc_0"]["self_attn"])
    emit_attn("detr.transformer.decoder.layers.0.self_attn",
              t["dec_0"]["self_attn"])
    emit_attn("detr.transformer.decoder.layers.0.multihead_attn",
              t["dec_0"]["cross_attn"])

    def emit_dense(prefix_torch, tree):
        sd[prefix_torch + ".weight"] = np.asarray(tree["kernel"]).T
        sd[prefix_torch + ".bias"] = np.asarray(tree["bias"])

    def emit_norm(prefix_torch, tree):
        sd[prefix_torch + ".weight"] = np.asarray(tree["scale"])
        sd[prefix_torch + ".bias"] = np.asarray(tree["bias"])

    for enc_dec, mod in (("encoder", "enc_0"), ("decoder", "dec_0")):
        base = f"detr.transformer.{enc_dec}.layers.0"
        emit_dense(base + ".linear1", t[mod]["linear1"])
        emit_dense(base + ".linear2", t[mod]["linear2"])
        for nm in ("norm1", "norm2") + (("norm3",) if mod == "dec_0" else ()):
            emit_norm(f"{base}.{nm}", t[mod][nm])
    emit_norm("detr.transformer.decoder.norm", t["dec_norm"])
    emit_dense("detr.class_embed", p["class_embed"])
    for i in range(3):
        emit_dense(f"detr.bbox_embed.layers.{i}", p["bbox_embed"][f"layer_{i}"])
    sd["detr.query_embed.weight"] = np.asarray(p["query_embed"])
    # input_proj: conv 1x1, torch layout [E, C, 1, 1]
    sd["detr.input_proj.weight"] = np.transpose(
        np.asarray(p["input_proj"]["kernel"]), (3, 2, 0, 1)
    )
    sd["detr.input_proj.bias"] = np.asarray(p["input_proj"]["bias"])

    target = model.init(jax.random.PRNGKey(0), imgs, train=False)
    ported, report = port_detr_state_dict(sd, target, num_heads=H)
    assert not report["unused"], report["unused"][:10]

    def cmp(a_tree, b_tree, where):
        for a, b in zip(
            jax.tree_util.tree_leaves(a_tree),
            jax.tree_util.tree_leaves(b_tree),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, err_msg=where
            )

    pp = ported["params"]
    cmp(p["transformer"], pp["transformer"], "transformer")
    cmp(p["class_embed"], pp["class_embed"], "class_embed")
    cmp(p["bbox_embed"], pp["bbox_embed"], "bbox_embed")
    cmp(p["query_embed"], pp["query_embed"], "query_embed")
    cmp(p["input_proj"], pp["input_proj"], "input_proj")
