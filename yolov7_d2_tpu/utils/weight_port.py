"""Weight-porting shim: reference PyTorch checkpoints -> flax variables.

BASELINE requires COCO mAP within 0.3 of the reference *through this shim*
(SURVEY.md §5 checkpoint/resume). It handles:
  * tensor layout: torch conv [O, I, kH, kW] -> flax [kH, kW, I, O];
    linear [O, I] -> [I, O]; depthwise conv grouping
  * BN split: torch weight/bias/running_mean/running_var ->
    flax params (scale, bias) + batch_stats (mean, var)
  * name translation: the reference YOLOX module tree
    (meta_arch/yolox.py:60-70 ``backbone``/``neck``/``head``, darknetx.py
    Sequential indices, yolox_head.py tower lists) -> our flax module paths.

Works on plain numpy arrays so checkpoints can be loaded with
``torch.load(map_location='cpu')`` or pickle without a GPU torch build.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def convert_conv_weight(w: np.ndarray) -> np.ndarray:
    """[O, I, kH, kW] -> [kH, kW, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_linear_weight(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


# ---------------------------------------------------------------------------
# name translation: reference-torch -> our flax path
# ---------------------------------------------------------------------------

def _csp_inner(rest: str) -> str:
    """CSPLayer inner names: 'm.0.conv1.conv' -> 'm_0/conv1/conv'."""
    rest = re.sub(r"^m\.(\d+)\.", r"m_\1/", rest)
    return rest.replace(".", "/")


def map_yolox_torch_name(name: str) -> Tuple[str, ...]:
    """Translate a reference YOLOX state-dict key (without the trailing
    parameter name) into our flax module path parts.

    Examples:
      backbone.stem.conv.conv        -> backbone/stem/conv/conv
      backbone.dark2.0.conv          -> backbone/dark2_conv/conv
      backbone.dark2.1.conv1.conv    -> backbone/dark2_csp/conv1/conv
      backbone.dark5.1.conv1.conv    -> backbone/dark5_spp/conv1/conv
      neck.C3_p4.m.0.conv1.conv      -> neck/C3_p4/m_0/conv1/conv
      head.cls_convs.0.1.conv        -> head/cls_conv_0_1/conv
      head.cls_preds.0               -> head/cls_pred_0
      head.stems.0.conv              -> head/stem_0/conv
    """
    # backbone.stem.conv.X -> backbone/stem/conv/X
    m = re.match(r"^backbone\.stem\.(.*)$", name)
    if m:
        return tuple(f"backbone/stem/{m.group(1)}".replace(".", "/").split("/"))

    # backbone.darkN.<idx>...
    m = re.match(r"^backbone\.dark(\d)\.(\d+)\.(.*)$", name)
    if m:
        lvl, idx, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        if lvl == 5:
            part = {0: "dark5_conv", 1: "dark5_spp", 2: "dark5_csp"}[idx]
        else:
            part = {0: f"dark{lvl}_conv", 1: f"dark{lvl}_csp"}[idx]
        return tuple(f"backbone/{part}/{_csp_inner(rest)}".split("/"))

    # neck.<name>.rest — module names match ours 1:1
    m = re.match(
        r"^neck\.(lateral_conv0|reduce_conv1|bu_conv1|bu_conv2|"
        r"C3_p4|C3_p3|C3_n3|C3_n4)\.(.*)$",
        name,
    )
    if m:
        return tuple(f"neck/{m.group(1)}/{_csp_inner(m.group(2))}".split("/"))

    # head towers: lists indexed by level
    m = re.match(r"^head\.stems\.(\d+)\.(.*)$", name)
    if m:
        return tuple(
            f"head/stem_{m.group(1)}/{m.group(2)}".replace(".", "/").split("/")
        )
    m = re.match(r"^head\.(cls|reg)_convs\.(\d+)\.(\d+)\.(.*)$", name)
    if m:
        kind, lvl, j, rest = m.groups()
        return tuple(
            f"head/{kind}_conv_{lvl}_{j}/{rest}".replace(".", "/").split("/")
        )
    m = re.match(r"^head\.(cls|reg|obj)_preds\.(\d+)$", name)
    if m:
        return (f"head", f"{m.group(1)}_pred_{m.group(2)}")

    # fallthrough: dots to slashes
    return tuple(name.replace(".", "/").split("/"))


def map_darknet_torch_name(name: str) -> Tuple[str, ...]:
    """Translate reference Darknet-53 state-dict keys (darknet.py:112 —
    ``stem.conv``, ``dark{i}.0`` down conv, ``dark{i}.{j}.layer{1,2}``
    ResLayer convs) into our flax paths (``stem``, ``stage{i}_down``,
    ``stage{i}_res{j-1}/conv{1,2}``)."""
    m = re.match(r"^stem\.(conv|bn)$", name)
    if m:
        return ("stem", m.group(1))
    m = re.match(r"^dark(\d)\.0\.(conv|bn)$", name)
    if m:
        return (f"stage{m.group(1)}_down", m.group(2))
    m = re.match(r"^dark(\d)\.(\d+)\.layer(\d)\.(conv|bn)$", name)
    if m:
        lvl, j, k, leaf = m.groups()
        return (f"stage{lvl}_res{int(j) - 1}", f"conv{k}", leaf)
    return tuple(name.replace(".", "/").split("/"))


def map_efficientrep_torch_name(name: str) -> Tuple[str, ...]:
    """Translate reference EfficientRep keys (efficientrep.py:362 —
    ``stem``, ``ERBlock_{i}.0`` down RepVGG, ``ERBlock_{i}.1`` RepBlock
    (conv1 + block.j), ``ERBlock_5.2`` SimSPPF cv1/cv2) into our paths
    (``stem``, ``down{i}``, ``stage{i}/rep_{j}``, ``sppf/conv{1,2}``)."""

    def rep_leaf(rest: str) -> str:
        # rbr_dense.conv -> rbr_dense_conv ; rbr_identity -> rbr_identity_bn
        if rest == "rbr_identity":
            return "rbr_identity_bn"
        return rest.replace(".", "_")

    m = re.match(r"^stem\.(.*)$", name)
    if m:
        return ("stem", rep_leaf(m.group(1)))
    m = re.match(r"^ERBlock_(\d)\.0\.(.*)$", name)
    if m:
        return (f"down{m.group(1)}", rep_leaf(m.group(2)))
    m = re.match(r"^ERBlock_(\d)\.1\.conv1\.(.*)$", name)
    if m:
        return (f"stage{m.group(1)}", "rep_0", rep_leaf(m.group(2)))
    m = re.match(r"^ERBlock_(\d)\.1\.block\.(\d+)\.(.*)$", name)
    if m:
        lvl, j, rest = m.groups()
        return (f"stage{lvl}", f"rep_{int(j) + 1}", rep_leaf(rest))
    m = re.match(r"^ERBlock_5\.2\.cv(\d)\.(conv|bn)$", name)
    if m:
        return ("sppf", f"conv{m.group(1)}", m.group(2))
    return tuple(name.replace(".", "/").split("/"))


def map_d2_resnet_name(name: str) -> Tuple[str, ...]:
    """Translate detectron2-style ResNet state-dict keys (the SparseInst /
    DETR backbone checkpoints) into our flax paths.

    d2 layout: ``backbone.stem.conv1.{weight,norm.*}``,
    ``backbone.res{2..5}.{i}.{conv1,conv2,conv3,shortcut}.{weight,norm.*}``.
    Ours: ``backbone/stem/conv``(+bn), ``backbone/res{s}_{i}/{convK,shortcut}/
    {conv,bn}``.
    """
    m = re.match(r"^backbone\.stem\.conv1\.norm$", name)
    if m:
        return ("backbone", "stem", "bn")
    m = re.match(r"^backbone\.stem\.conv1$", name)
    if m:
        return ("backbone", "stem", "conv")
    m = re.match(r"^backbone\.res(\d)\.(\d+)\.(conv\d|shortcut)(\.norm)?$",
                 name)
    if m:
        stage, idx, part, norm = m.groups()
        return (
            "backbone", f"res{stage}_{idx}", part, "bn" if norm else "conv",
        )
    return tuple(name.replace(".", "/").split("/"))


def map_d2_resnet_key(key: str):
    """Full-key variant: d2 BN keys end in ``norm.weight`` etc; split the
    module path and the parameter leaf for :func:`port_torch_state_dict`."""
    module, _, leaf = key.rpartition(".")
    if module.endswith(".norm"):
        module = module[: -len(".norm")]
        path = map_d2_resnet_name(module + ".norm")
    else:
        path = map_d2_resnet_name(module)
    return path, leaf


def port_d2_resnet_state_dict(state_dict, variables, strict: bool = False):
    """Pour a d2-format ResNet checkpoint (BN as ``.norm.*``) into our
    variables; same semantics as :func:`port_torch_state_dict`."""
    renamed = {}
    for key, tensor in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        module, _, leaf = key.rpartition(".")
        if module.endswith(".norm"):
            base = module[: -len(".norm")]
            new_key = ".".join(map_d2_resnet_name(base + ".norm")) + "." + leaf
            # BN weight stays 1-D -> scale; running stats keep their names
            renamed[new_key.replace("/", ".")] = tensor
        else:
            new_key = ".".join(map_d2_resnet_name(module)) + "." + leaf
            renamed[new_key.replace("/", ".")] = tensor
    return port_torch_state_dict(
        renamed, variables, name_mapper=lambda n: tuple(n.split(".")),
        strict=strict,
    )


def port_torch_state_dict(
    state_dict: Mapping[str, np.ndarray],
    variables: Dict[str, Any],
    name_mapper=map_yolox_torch_name,
    strict: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Pour a torch state dict into a flax ``variables`` template.

    Returns (new_variables, report) where report lists 'ported',
    'missing' (template leaves untouched) and 'unused' (torch keys unmatched).
    """
    import jax

    params = jax.tree.map(np.asarray, variables["params"])
    batch_stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    ported, unused = [], []

    def set_in(tree, path, value) -> bool:
        node = tree
        for p in path[:-1]:
            if not isinstance(node, dict) or p not in node:
                return False
            node = node[p]
        leaf = path[-1]
        if not isinstance(node, dict) or leaf not in node:
            return False
        if node[leaf].shape != value.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"{node[leaf].shape} vs {value.shape}"
            )
        node[leaf] = value.astype(node[leaf].dtype)
        return True

    for key, tensor in state_dict.items():
        t = np.asarray(tensor)
        if key.endswith("num_batches_tracked"):
            continue
        module_name, _, leaf = key.rpartition(".")
        if leaf == "weight" and t.ndim == 4:
            path = name_mapper(module_name) + ("kernel",)
            t = convert_conv_weight(t)
            ok = set_in(params, path, t)
        elif leaf == "weight" and t.ndim == 2:
            path = name_mapper(module_name) + ("kernel",)
            ok = set_in(params, path, convert_linear_weight(t))
        elif leaf == "weight" and t.ndim == 1:  # BN gamma
            path = name_mapper(module_name) + ("scale",)
            ok = set_in(params, path, t)
        elif leaf == "bias":
            path = name_mapper(module_name) + ("bias",)
            ok = set_in(params, path, t)
        elif leaf == "running_mean":
            path = name_mapper(module_name) + ("mean",)
            ok = set_in(batch_stats, path, t)
        elif leaf == "running_var":
            path = name_mapper(module_name) + ("var",)
            ok = set_in(batch_stats, path, t)
        else:
            ok = False
        (ported if ok else unused).append(key)

    if strict and unused:
        raise KeyError(f"unmatched torch keys: {unused[:20]}")

    new_vars = {"params": params}
    if batch_stats:
        new_vars["batch_stats"] = batch_stats
    report = {"ported": ported, "unused": unused}
    return new_vars, report


def split_torch_mha(
    in_proj_weight: np.ndarray,     # [3E, E]
    in_proj_bias: np.ndarray,       # [3E]
    out_weight: np.ndarray,         # [E, E]
    out_bias: np.ndarray,           # [E]
    num_heads: int,
) -> Dict[str, Dict[str, np.ndarray]]:
    """torch nn.MultiheadAttention (fused qkv) -> flax
    MultiHeadDotProductAttention per-head param tree
    ({query,key,value}: kernel [E, H, hd] / bias [H, hd];
     out: kernel [H, hd, E] / bias [E])."""
    e = in_proj_weight.shape[1]
    hd = e // num_heads
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for i, name in enumerate(("query", "key", "value")):
        w = in_proj_weight[i * e : (i + 1) * e]          # [E(out), E(in)]
        b = in_proj_bias[i * e : (i + 1) * e]
        out[name] = {
            "kernel": w.T.reshape(e, num_heads, hd),
            "bias": b.reshape(num_heads, hd),
        }
    out["out"] = {
        "kernel": out_weight.T.reshape(num_heads, hd, e),
        "bias": out_bias,
    }
    return out


def map_detr_torch_name(name: str) -> Tuple[str, ...]:
    """Reference DETR state-dict keys (meta_arch/detr.py tree after the
    tools/convert_detr_to_d2 remap: ``detr.`` prefix) -> our flax paths.
    Attention modules are handled by :func:`port_detr_state_dict` (fused
    qkv split), this maps everything else."""
    n = re.sub(r"^detr\.", "", name)
    n = re.sub(r"^transformer\.encoder\.layers\.(\d+)\.", r"transformer/enc_\1/", n)
    n = re.sub(r"^transformer\.decoder\.layers\.(\d+)\.", r"transformer/dec_\1/", n)
    n = n.replace("transformer.decoder.norm", "transformer/dec_norm")
    n = n.replace("transformer.encoder.norm", "transformer/enc_norm")
    n = re.sub(r"^bbox_embed\.layers\.(\d+)$", r"bbox_embed/layer_\1", n)
    n = n.replace("query_embed", "query_embed")
    return tuple(n.replace(".", "/").split("/"))


def port_detr_state_dict(
    state_dict: Mapping[str, np.ndarray],
    variables: Dict[str, Any],
    num_heads: int = 8,
    strict: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Pour a reference DETR checkpoint into our DETR variables.

    Handles fused-qkv attention splitting (self_attn + multihead_attn ->
    our self_attn/cross_attn trees), the LayerNorm weight->scale rename,
    and query_embed (torch nn.Embedding.weight -> our raw param)."""
    import jax

    # 1) group attention keys by module
    attn_groups: Dict[str, Dict[str, np.ndarray]] = {}
    passthrough: Dict[str, np.ndarray] = {}
    for key, tensor in state_dict.items():
        m = re.match(
            r"^(.*)\.(self_attn|multihead_attn)\."
            r"(in_proj_weight|in_proj_bias|out_proj\.weight|out_proj\.bias)$",
            key,
        )
        if m:
            mod = f"{m.group(1)}.{m.group(2)}"
            attn_groups.setdefault(mod, {})[m.group(3)] = np.asarray(tensor)
        else:
            passthrough[key] = tensor

    params = jax.tree.map(np.asarray, variables["params"])
    ported, unused = [], []

    def get_node(path):
        node = params
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
        return node

    for mod, tensors in attn_groups.items():
        base = map_detr_torch_name(mod)
        # our decoder names the cross attention 'cross_attn'
        base = tuple(
            "cross_attn" if p == "multihead_attn" else p for p in base
        )
        node = get_node(base)
        if node is None or not all(
            k in tensors for k in
            ("in_proj_weight", "in_proj_bias", "out_proj.weight",
             "out_proj.bias")
        ):
            unused.extend(f"{mod}.{k}" for k in tensors)
            continue
        split = split_torch_mha(
            tensors["in_proj_weight"], tensors["in_proj_bias"],
            tensors["out_proj.weight"], tensors["out_proj.bias"], num_heads,
        )
        for part, leaves in split.items():
            for leaf, value in leaves.items():
                node[part][leaf] = value.astype(node[part][leaf].dtype)
        ported.extend(f"{mod}.{k}" for k in tensors)

    # 2) everything else: LayerNorm weight->scale, Dense/Embedding layouts
    def leaf_map(key):
        module, _, leaf = key.rpartition(".")
        path = map_detr_torch_name(module)
        return path, leaf

    rest = {}
    for key, tensor in passthrough.items():
        t = np.asarray(tensor)
        module, _, leaf = key.rpartition(".")
        path = map_detr_torch_name(module)
        # query_embed is an nn.Embedding: its .weight is the raw table
        if path and path[-1] == "query_embed" and leaf == "weight":
            node = get_node(path[:-1]) if len(path) > 1 else params
            if node is not None and "query_embed" in node:
                node["query_embed"] = t.astype(node["query_embed"].dtype)
                ported.append(key)
                continue
        # LayerNorm: torch weight (1-D) -> flax scale handled by the
        # generic porter below
        rest[key] = tensor

    new_vars = {"params": params}
    if "batch_stats" in variables:
        new_vars["batch_stats"] = variables["batch_stats"]
    new_vars, report = port_torch_state_dict(
        rest, new_vars, name_mapper=map_detr_torch_name, strict=False
    )
    report["ported"] = ported + report["ported"]
    report["unused"] = unused + report["unused"]
    if strict and report["unused"]:
        raise KeyError(f"unmatched torch keys: {report['unused'][:20]}")
    return new_vars, report


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pkl checkpoint to numpy (torch cpu or pickle)."""
    try:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
    except ImportError:  # pragma: no cover
        import pickle

        with open(path, "rb") as f:
            obj = pickle.load(f)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# round-3 mappers: the BASELINE-carrying stacks (VERDICT r2 item 1)
# ---------------------------------------------------------------------------

def map_resnetvd_torch_name(name: str, avg_down: bool = True):
    """Reference resnetvd.py (timm-style) state-dict keys -> our ResNet
    flax paths.

    timm layout: deep stem ``conv1.{0,3,6}`` convs + ``conv1.{1,4}`` BNs +
    ``bn1``; plain stem ``conv1``/``bn1``; stages ``layer{L}.{i}.conv{k}`` /
    ``bn{k}`` / ``downsample.{...}`` (avg variant: pool at 0, conv at 1,
    norm at 2; conv variant: conv at 0, norm at 1).
    """
    m = re.match(r"^conv1\.(\d)$", name)
    if m:
        idx = int(m.group(1))
        return {0: ("stem1", "conv"), 1: ("stem1", "bn"),
                3: ("stem2", "conv"), 4: ("stem2", "bn"),
                6: ("stem3", "conv")}[idx]
    if name == "conv1":
        return ("stem", "conv")
    if name == "bn1":
        return ("stem3", "bn") if avg_down else ("stem", "bn")
    m = re.match(r"^layer(\d)\.(\d+)\.(conv|bn)(\d)$", name)
    if m:
        lvl, i, kind, k = m.groups()
        return (f"res{int(lvl) + 1}_{i}", f"conv{k}",
                "conv" if kind == "conv" else "bn")
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.(\d)$", name)
    if m:
        lvl, i, j = m.groups()
        j = int(j)
        if avg_down:
            leaf = {1: "conv", 2: "bn"}[j]
        else:
            leaf = {0: "conv", 1: "bn"}[j]
        return (f"res{int(lvl) + 1}_{i}", "shortcut", leaf)
    return tuple(name.replace(".", "/").split("/"))


def map_resnetvd_plain_torch_name(name: str):
    """Plain (7x7 stem, conv downsample) variant of the timm ResNet mapper."""
    return map_resnetvd_torch_name(name, avg_down=False)


def map_res2net_torch_name(name: str):
    """Reference Res2Net-v1b keys (res2net_v1b.py:100) -> our Res2Net flax
    paths. Deep stem ``conv1.{0,1,3,4,6}`` + outer ``bn1``; blocks
    ``layerL.i.{conv1,bn1,convs.j,bns.j,conv3,bn3,downsample.{1,2}}``."""
    m = re.match(r"^conv1\.(\d)$", name)
    if m:
        return {0: ("stem1", "conv"), 1: ("stem1", "bn"),
                3: ("stem2", "conv"), 4: ("stem2", "bn"),
                6: ("stem3", "conv")}[int(m.group(1))]
    if name == "bn1":
        return ("stem3", "bn")
    m = re.match(r"^layer(\d)\.(\d+)\.(conv|bn)(\d)$", name)
    if m:
        lvl, i, kind, k = m.groups()
        return (f"res{int(lvl) + 1}_{i}", f"conv{k}",
                "conv" if kind == "conv" else "bn")
    m = re.match(r"^layer(\d)\.(\d+)\.(convs|bns)\.(\d+)$", name)
    if m:
        lvl, i, kind, j = m.groups()
        return (f"res{int(lvl) + 1}_{i}", f"conv2_{j}",
                "conv" if kind == "convs" else "bn")
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.(\d)$", name)
    if m:
        lvl, i, j = m.groups()
        leaf = {1: "conv", 2: "bn"}[int(j)]
        return (f"res{int(lvl) + 1}_{i}", "shortcut", leaf)
    return tuple(name.replace(".", "/").split("/"))


def map_res2next_torch_name(name: str):
    """Res2NeXt-50 (res2next.py:102): plain 7x7 stem (conv1/bn1) and
    conv-only downsample (downsample.{0,1}); blocks share the Res2Net
    layout."""
    if name == "conv1":
        return ("stem", "conv")
    if name == "bn1":
        return ("stem", "bn")
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.(\d)$", name)
    if m:
        lvl, i, j = m.groups()
        leaf = {0: "conv", 1: "bn"}[int(j)]
        return (f"res{int(lvl) + 1}_{i}", "shortcut", leaf)
    return map_res2net_torch_name(name)


def map_sparseinst_encoder_torch_name(name: str):
    """Reference InstanceContextEncoder keys (encoder_sparseinst.py:73) ->
    our encoder flax paths. ``fpn_laterals``/``fpn_outputs`` are ordered
    deepest-first (c5, c4, c3)."""
    m = re.match(r"^fpn_laterals\.(\d)$", name)
    if m:
        return (f"lateral{5 - int(m.group(1))}",)
    m = re.match(r"^fpn_outputs\.(\d)$", name)
    if m:
        return (f"out{5 - int(m.group(1))}",)
    m = re.match(r"^ppm\.stages\.(\d)\.1$", name)
    if m:
        return ("ppm", f"pool_conv_{m.group(1)}")
    if name == "ppm.bottleneck":
        return ("ppm", "bottleneck")
    if name == "fusion":
        return ("fusion",)
    return tuple(name.replace(".", "/").split("/"))


def map_sparseinst_decoder_torch_name(name: str):
    """Reference Base/GroupIAMDecoder keys (decoder_sparseinst.py:107,246)
    -> our IAMDecoder flax paths. ``inst_convs``/``mask_convs`` are
    Sequential(conv, relu, ...) so convs sit at even indices."""
    m = re.match(r"^inst_branch\.inst_convs\.(\d+)$", name)
    if m:
        return (f"inst_conv_{int(m.group(1)) // 2}",)
    m = re.match(r"^mask_branch\.mask_convs\.(\d+)$", name)
    if m:
        return (f"mask_conv_{int(m.group(1)) // 2}",)
    simple = {
        "inst_branch.iam_conv": ("iam_conv",),
        "inst_branch.fc": ("fc",),
        "inst_branch.cls_score": ("cls_score",),
        "inst_branch.mask_kernel": ("mask_kernel",),
        "inst_branch.objectness": ("objectness",),
        "mask_branch.projection": ("mask_proj",),
    }
    if name in simple:
        return simple[name]
    return tuple(name.replace(".", "/").split("/"))


def map_reppan_torch_name(name: str):
    """Reference RepPANNeck keys (neck/reppan.py:6) -> our flax paths."""

    def rep_leaf(rest: str) -> str:
        if rest == "rbr_identity":
            return "rbr_identity_bn"
        return rest.replace(".", "_")

    simple = {
        "reduce_layer0": "reduce0", "reduce_layer1": "reduce1",
        "downsample2": "down1", "downsample1": "down0",
    }
    m = re.match(r"^(reduce_layer0|reduce_layer1|downsample2|downsample1)"
                 r"\.(conv|bn)$", name)
    if m:
        return (simple[m.group(1)], m.group(2))
    m = re.match(r"^upsample(\d)\.upsample_transpose$", name)
    if m:
        return (f"upsample{m.group(1)}",)
    m = re.match(r"^Rep_([pn]\d)\.conv1\.(.*)$", name)
    if m:
        return (f"rep_{m.group(1)}", "rep_0", rep_leaf(m.group(2)))
    m = re.match(r"^Rep_([pn]\d)\.block\.(\d+)\.(.*)$", name)
    if m:
        return (f"rep_{m.group(1)}", f"rep_{int(m.group(2)) + 1}",
                rep_leaf(m.group(3)))
    return tuple(name.replace(".", "/").split("/"))


def map_effidehead_torch_name(name: str):
    """Reference EffiDeHead keys (head/effidehead.py:7) -> our flax paths."""
    m = re.match(r"^stems\.(\d)\.(conv|bn)$", name)
    if m:
        return (f"stem_{m.group(1)}", m.group(2))
    m = re.match(r"^(cls|reg)_convs\.(\d)\.(conv|bn)$", name)
    if m:
        return (f"{m.group(1)}_conv_{m.group(2)}", m.group(3))
    m = re.match(r"^(cls|reg|obj)_preds\.(\d)$", name)
    if m:
        return (f"{m.group(1)}_pred_{m.group(2)}",)
    return tuple(name.replace(".", "/").split("/"))


def convert_conv_transpose_weight(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [I, O, kH, kW] -> flax ConvTranspose
    [kH, kW, I, O]."""
    return np.transpose(w, (2, 3, 0, 1))


def port_reppan_state_dict(state_dict, variables, strict: bool = False,
                           prefix: Tuple[str, ...] = ()):
    """Pour a reference RepPANNeck state dict into our variables; handles
    the ConvTranspose (``Transpose``) layout, which differs from regular
    convs (torch [I, O, kh, kw]). ``prefix`` roots the flax paths under a
    submodule (e.g. ``("neck",)`` inside the assembled YOLOV6 model)."""
    transpose_keys = {}
    rest = {}
    for k, v in state_dict.items():
        if re.match(r"^upsample\d\.upsample_transpose\.weight$", k):
            transpose_keys[k] = v
        else:
            rest[k] = v
    new_vars, report = port_torch_state_dict(
        rest, variables,
        name_mapper=lambda n: prefix + map_reppan_torch_name(n),
        strict=False,
    )
    for k, v in transpose_keys.items():
        module, _, _ = k.rpartition(".")
        path = prefix + map_reppan_torch_name(module) + ("kernel",)
        node = new_vars["params"]
        for p in path[:-1]:
            node = node[p]
        w = convert_conv_transpose_weight(np.asarray(v))
        assert node[path[-1]].shape == w.shape, (path, node[path[-1]].shape,
                                                 w.shape)
        node[path[-1]] = w.astype(node[path[-1]].dtype)
        report["ported"].append(k)
    if strict and report["unused"]:
        raise KeyError(f"unmatched torch keys: {report['unused'][:20]}")
    return new_vars, report


def map_convnext_torch_name(name: str):
    """Reference ConvNeXt keys (convnext.py:210) -> our flax paths."""
    m = re.match(r"^downsample_layers\.0\.(\d)$", name)
    if m:
        return ("stem_conv",) if m.group(1) == "0" else ("stem_norm",)
    m = re.match(r"^downsample_layers\.(\d)\.(\d)$", name)
    if m:
        s, j = m.groups()
        return (f"down_norm_{s}",) if j == "0" else (f"down_conv_{s}",)
    m = re.match(r"^stages\.(\d)\.(\d+)\.(dwconv|norm|pwconv1|pwconv2)$",
                 name)
    if m:
        s, i, leafmod = m.groups()
        return (f"stage{s}_block{i}", leafmod)
    m = re.match(r"^stages\.(\d)\.(\d+)$", name)  # layer-scale gamma owner
    if m:
        return (f"stage{m.group(1)}_block{m.group(2)}",)
    m = re.match(r"^norm(\d)$", name)
    if m:
        return (f"out_norm_{m.group(1)}",)
    return tuple(name.replace(".", "/").split("/"))


def port_convnext_state_dict(state_dict, variables, strict: bool = False):
    """Pour a reference ConvNeXt state dict into our variables; handles the
    per-block layer-scale ``gamma`` raw parameters."""
    import jax

    gammas = {}
    rest = {}
    for k, v in state_dict.items():
        if k.endswith(".gamma"):
            gammas[k] = v
        else:
            rest[k] = v
    new_vars, report = port_torch_state_dict(
        rest, variables, name_mapper=map_convnext_torch_name, strict=False
    )
    for k, v in gammas.items():
        module, _, _ = k.rpartition(".")
        path = map_convnext_torch_name(module) + ("gamma",)
        node = new_vars["params"]
        ok = True
        for p in path[:-1]:
            if p not in node:
                ok = False
                break
            node = node[p]
        if ok and path[-1] in node:
            node[path[-1]] = np.asarray(v).astype(node[path[-1]].dtype)
            report["ported"].append(k)
        else:
            report["unused"].append(k)
    if strict and report["unused"]:
        raise KeyError(f"unmatched torch keys: {report['unused'][:20]}")
    return new_vars, report


_SWIN_MERGE_PERM_BLOCKS = (0, 2, 1, 3)
# torch PatchMerging concatenates [x0; x1; x2; x3] with x1=(row+1, col),
# x2=(row, col+1); our reshape produces [(0,0), (0,1), (1,0), (1,1)] =
# [x0; x2; x1; x3] — so torch channel block j lands at our block
# _SWIN_MERGE_PERM_BLOCKS.index(j); equivalently our block i reads torch
# block _SWIN_MERGE_PERM_BLOCKS[i].


def _swin_merge_perm(c4: int) -> np.ndarray:
    c = c4 // 4
    idx = np.arange(c4).reshape(4, c)
    return idx[list(_SWIN_MERGE_PERM_BLOCKS)].reshape(-1)


def map_swin_torch_name(name: str):
    """Reference Swin keys (swin_transformer.py:688) -> our flax paths."""
    if name == "patch_embed.proj":
        return ("patch_embed",)
    if name == "patch_embed.norm":
        return ("patch_norm",)
    m = re.match(r"^layers\.(\d)\.blocks\.(\d+)\.(.*)$", name)
    if m:
        s, i, rest = m.groups()
        rest = {
            "norm1": "norm1", "norm2": "norm2",
            "attn.qkv": "attn/qkv", "attn.proj": "attn/proj",
            "mlp.fc1": "mlp1", "mlp.fc2": "mlp2",
        }.get(rest, rest.replace(".", "/"))
        return tuple(f"stage{s}_block{i}/{rest}".split("/"))
    m = re.match(r"^layers\.(\d)\.downsample\.(norm|reduction)$", name)
    if m:
        return (f"merge_{int(m.group(1)) + 1}", m.group(2))
    m = re.match(r"^norm(\d)$", name)
    if m:
        return (f"out_norm_{m.group(1)}",)
    return tuple(name.replace(".", "/").split("/"))


def port_swin_state_dict(state_dict, variables, strict: bool = False):
    """Pour a reference Swin state dict into our variables:
    * relative_position_bias_table -> our ``rel_pos_bias`` raw param
    * PatchMerging norm/reduction channel-block permutation (concat-order
      difference, see _SWIN_MERGE_PERM_BLOCKS)
    """
    special = {}
    rest = {}
    for k, v in state_dict.items():
        if k.endswith("relative_position_index"):
            continue  # recomputed, not a weight
        if (k.endswith("relative_position_bias_table")
                or ".downsample." in k):
            special[k] = np.asarray(v)
        else:
            rest[k] = v
    new_vars, report = port_torch_state_dict(
        rest, variables, name_mapper=map_swin_torch_name, strict=False
    )

    def set_leaf(path, value):
        node = new_vars["params"]
        for p in path[:-1]:
            node = node[p]
        assert node[path[-1]].shape == value.shape, (
            path, node[path[-1]].shape, value.shape)
        node[path[-1]] = value.astype(node[path[-1]].dtype)

    for k, v in special.items():
        if k.endswith("relative_position_bias_table"):
            module = k[: -len(".relative_position_bias_table")]
            path = map_swin_torch_name(module) + ("rel_pos_bias",)
            set_leaf(path, v)
        elif k.endswith("norm.weight") or k.endswith("norm.bias"):
            module, _, leaf = k.rpartition(".")
            perm = _swin_merge_perm(v.shape[0])
            path = map_swin_torch_name(module) + (
                "scale" if leaf == "weight" else "bias",)
            set_leaf(path, v[perm])
        elif k.endswith("reduction.weight"):
            module, _, _ = k.rpartition(".")
            perm = _swin_merge_perm(v.shape[1])
            path = map_swin_torch_name(module) + ("kernel",)
            set_leaf(path, v[:, perm].T)
        else:
            report["unused"].append(k)
            continue
        report["ported"].append(k)
    if strict and report["unused"]:
        raise KeyError(f"unmatched torch keys: {report['unused'][:20]}")
    return new_vars, report


# ---------------------------------------------------------------------------
# DLA / DLASeg (reference dla.py — DLA:194 trunk, DLAUp:336/IDAUp:309
# decoders with modulated-DCN blocks and trainable bilinear upsamples)
# ---------------------------------------------------------------------------

def _map_dla_block_inner(rest: str, block: str = "basic"):
    """Block-level names inside a Tree leaf. Our BasicBlock (DLA-34) uses
    flat conv1/bn1/conv2/bn2; our BottleneckBlock (DLA-60) nests conv1 and
    conv3 in ConvBN with a raw middle conv."""
    if block == "basic":
        return (rest,)
    table = {
        "conv1": ("conv1", "conv"), "bn1": ("conv1", "bn"),
        "conv2": ("conv2",), "bn2": ("bn2",),
        "conv3": ("conv3", "conv"), "bn3": ("conv3", "bn"),
    }
    if rest in table:
        return table[rest]
    return tuple(rest.split("."))


def map_dla_torch_name(name: str, block: str = "basic"):
    """Reference DLA/DLASeg state-dict module names -> our flax paths.

    ``base.`` prefixes (DLASeg) and bare trunk names both resolve; the
    trunk's Sequential indices (base_layer.{0,1}, level{0,1}.{3c,3c+1})
    map onto our ConvBN stacks, Tree/Root/project recurse structurally,
    and the decoder's _DeformConv pieces map onto DeformConvBlock
    (offset -> dcn/offset_conv, conv -> dcn/weight, actf.0 -> bn).
    """
    parts = name.split(".")
    out = []
    i = 0
    # DLASeg prefixes
    if parts[0] == "base":
        out.append("base")
        i = 1
    if i < len(parts) and parts[i] == "base_layer":
        idx = int(parts[i + 1])
        return tuple(out + ["base", {0: "conv", 1: "bn"}[idx]])
    if i < len(parts) and re.match(r"^level[01]$", parts[i]):
        lvl = parts[i]
        idx = int(parts[i + 1])
        return tuple(out + [f"{lvl}_{idx // 3}",
                            {0: "conv", 1: "bn"}[idx % 3]])
    if i < len(parts) and re.match(r"^level[2-5]$", parts[i]):
        out.append(parts[i])
        i += 1
        while i < len(parts):
            p = parts[i]
            if p in ("tree1", "tree2"):
                # tree1/tree2 are Trees at levels>1 and blocks at leaves —
                # both keep the name; block innards handled below
                nxt = parts[i + 1] if i + 1 < len(parts) else ""
                if nxt in ("conv1", "bn1", "conv2", "bn2", "conv3", "bn3"):
                    out.append(p)
                    out.extend(_map_dla_block_inner(nxt, block))
                    return tuple(out)
                out.append(p)
                i += 1
                continue
            if p == "project":
                j = int(parts[i + 1])
                return tuple(out + ["project", {0: "conv", 1: "bn"}[j]])
            if p == "root":
                leaf = parts[i + 1]
                return tuple(out + ["root", "conv",
                                    {"conv": "conv", "bn": "bn"}[leaf]])
            out.append(p)
            i += 1
        return tuple(out)
    # decoder: dla_up.ida_{i}.* / ida_up.*
    if parts[i] in ("dla_up", "ida_up"):
        out.append(parts[i])
        i += 1
        if parts[i].startswith("ida_"):
            out.append(parts[i])
            i += 1
        p = parts[i]
        m = re.match(r"^(proj|node)_(\d+)$", p)
        if m:
            sub = parts[i + 1]
            if sub == "offset":
                return tuple(out + [p, "dcn", "offset_conv"])
            if sub == "conv":
                return tuple(out + [p, "dcn", "weight"])
            if sub == "actf":
                return tuple(out + [p, "bn"])
        m = re.match(r"^up_(\d+)$", p)
        if m:
            return tuple(out + [p])
    return tuple(name.replace(".", "/").split("/"))


def port_dla_state_dict(state_dict, variables, strict: bool = False):
    """DLA/DLASeg port with the two non-name transforms:

    * DCN fuse weights: torch ``[O, C, k, k]`` -> our 1x1-over-taps kernel
      ``[1, 1, k*k*C, O]`` (tap-major rows, ops/deform_conv.py layout);
    * up_* bilinear upsamples: torch grouped ConvTranspose2d
      ``[C, 1, k, k]`` -> our lhs-dilated cross-correlation kernel
      ``[k, k, 1, C]`` with the spatial [::-1, ::-1] flip (BilinearUp is a
      cross-correlation; transposed conv applies the flipped kernel).
    """
    pre = {}
    for key, tensor in state_dict.items():
        t = np.asarray(tensor)
        module, _, leaf = key.rpartition(".")
        parts = module.split(".")
        if leaf == "weight" and parts and parts[-1].startswith("up_"):
            # [C, 1, k, k] -> flip -> [k, k, 1, C]
            w = t[:, :, ::-1, ::-1]
            pre[key] = np.ascontiguousarray(
                np.transpose(w, (2, 3, 1, 0))
            )
            continue
        if leaf == "weight" and len(parts) >= 1 and parts[-1] == "conv" and (
            len(parts) >= 2 and parts[-2].startswith(("proj_", "node_"))
        ):
            o, c, kh, kw = t.shape
            pre[key] = np.transpose(t, (2, 3, 1, 0)).reshape(
                1, 1, kh * kw * c, o
            )
            continue
        pre[key] = t

    def mapper_with_preconverted(name):
        return map_dla_torch_name(name)

    # port_torch_state_dict re-transposes 4-d weights; our two transformed
    # tensors are already in flax layout, so feed them via a wrapper that
    # undoes the standard conversion for exactly those keys
    out_sd = {}
    for key, t in pre.items():
        module, _, leaf = key.rpartition(".")
        parts = module.split(".")
        special = (
            leaf == "weight" and parts and (
                parts[-1].startswith("up_")
                or (parts[-1] == "conv"
                    and len(parts) >= 2
                    and parts[-2].startswith(("proj_", "node_")))
            )
        )
        if special:
            # pre-invert the [O, I, kH, kW] -> [kH, kW, I, O] transform
            out_sd[key] = np.transpose(t, (3, 2, 0, 1))
        else:
            out_sd[key] = t
    return port_torch_state_dict(
        out_sd, variables, name_mapper=mapper_with_preconverted,
        strict=strict,
    )


def map_pvt_v2_torch_name(name: str):
    """Reference PVTv2 keys (pvt_v2.py:429 OverlapPatchEmbed/Block/Attention)
    -> our flax paths. Torch stages are 1-based (patch_embed1..4, norm1..4);
    ours 0-based."""
    m = re.match(r"^patch_embed(\d)\.proj$", name)
    if m:
        return (f"patch_embed_{int(m.group(1)) - 1}",)
    m = re.match(r"^patch_embed(\d)\.norm$", name)
    if m:
        return (f"embed_norm_{int(m.group(1)) - 1}",)
    m = re.match(r"^norm(\d)$", name)
    if m:
        return (f"out_norm_{int(m.group(1)) - 1}",)
    m = re.match(r"^block(\d)\.(\d+)\.(.*)$", name)
    if m:
        stage, i, rest = int(m.group(1)) - 1, m.group(2), m.group(3)
        base = (f"stage{stage}_block{i}",)
        table = {
            "norm1": ("norm1",), "norm2": ("norm2",),
            "attn.q": ("attn", "q"), "attn.kv": ("attn", "kv"),
            "attn.proj": ("attn", "proj"), "attn.sr": ("attn", "sr"),
            "attn.norm": ("attn", "sr_norm"),
            "mlp.fc1": ("ffn", "fc1"), "mlp.fc2": ("ffn", "fc2"),
            "mlp.dwconv.dwconv": ("ffn", "dwconv"),
        }
        if rest in table:
            return base + table[rest]
        return base + tuple(rest.split("."))
    return tuple(name.replace(".", "/").split("/"))


def map_efficientnet_torch_name(name: str):
    """Reference EfficientNet keys (efficientnet.py:165 — _conv_stem/_bn0,
    _blocks.{i}._expand_conv/_bn0/_depthwise_conv/_bn1/_se_reduce/
    _se_expand/_project_conv/_bn2) -> our flax paths."""
    if name == "_conv_stem":
        return ("stem_conv",)
    if name == "_bn0":
        return ("stem_bn",)
    m = re.match(r"^_blocks\.(\d+)\.(.*)$", name)
    if m:
        i, rest = m.groups()
        table = {
            "_expand_conv": ("expand_conv",), "_bn0": ("expand_bn",),
            "_depthwise_conv": ("dw_conv",), "_bn1": ("dw_bn",),
            "_se_reduce": ("se_reduce",), "_se_expand": ("se_expand",),
            "_project_conv": ("project_conv",), "_bn2": ("project_bn",),
        }
        if rest in table:
            return (f"block{i}",) + table[rest]
        return (f"block{i}",) + tuple(rest.split("."))
    return tuple(name.replace(".", "/").split("/"))


def map_cspdarknet_torch_name(name: str):
    """Reference PP-YOLO CSP-DarkNet keys (cspdarknet.py:267 DarkNet with
    with_csp=True) -> our flax paths."""
    if name == "conv1":
        return ("stem", "conv")
    if name == "bn1":
        return ("stem", "bn")
    m = re.match(
        r"^layer(\d)\.(base_layer|partial_transition1|partial_transition2|"
        r"fuse_transition)\.(\d)$", name)
    if m:
        lvl, part, j = m.groups()
        short = {"base_layer": "base", "partial_transition1": "pt1",
                 "partial_transition2": "pt2", "fuse_transition": "fuse"}
        return (f"stage{lvl}", short[part],
                {0: "conv", 1: "bn"}[int(j)])
    m = re.match(r"^layer(\d)\.stage_layers\.(\d+)\.downsample\.(\d)$", name)
    if m:
        lvl, blk, j = m.groups()
        return (f"stage{lvl}", f"block{blk}", "down",
                {0: "conv", 1: "bn"}[int(j)])
    m = re.match(r"^layer(\d)\.stage_layers\.(\d+)\.(conv|bn)(\d)$", name)
    if m:
        lvl, blk, kind, k = m.groups()
        return (f"stage{lvl}", f"block{blk}", f"conv{k}",
                "conv" if kind == "conv" else "bn")
    return tuple(name.replace(".", "/").split("/"))


def map_yolofpn_torch_name(name: str):
    """Reference YOLOFPN keys (neck/yolo_fpn.py:13) -> our flax paths:
    out{0,1,2}.{j} 5-conv stacks -> block{5,4,3}/conv{j},
    out{1,2}_cbl laterals, spp.conv{1,2}."""
    m = re.match(r"^out(\d)\.(\d)\.(conv|bn)$", name)
    if m:
        lvl, j, leaf = m.groups()
        return ({"0": "block5", "1": "block4", "2": "block3"}[lvl],
                f"conv{j}", leaf)
    m = re.match(r"^out(\d)_cbl\.(conv|bn)$", name)
    if m:
        return (f"lateral{m.group(1)}", m.group(2))
    m = re.match(r"^spp\.conv(\d)\.(conv|bn)$", name)
    if m:
        return ("spp", f"conv{m.group(1)}", m.group(2))
    return tuple(name.replace(".", "/").split("/"))


def map_yolof_encoder_torch_name(name: str):
    """Reference DilatedEncoder keys (head/encoder.py:12) -> our paths:
    lateral_conv/lateral_norm, fpn_conv/fpn_norm,
    dilated_encoder_blocks.{i}.conv{1,2,3}.{0 conv, 1 norm}."""
    table = {
        "lateral_conv": ("lateral_conv",), "lateral_norm": ("lateral_bn",),
        "fpn_conv": ("fpn_conv",), "fpn_norm": ("fpn_bn",),
    }
    if name in table:
        return table[name]
    m = re.match(r"^dilated_encoder_blocks\.(\d+)\.conv(\d)\.(\d)$", name)
    if m:
        i, k, j = m.groups()
        part = {"1": "reduce", "2": "dilated", "3": "project"}[k]
        leaf = {"0": "conv", "1": "bn"}[j]
        return (f"b{i}_{part}_{leaf}",)
    return tuple(name.replace(".", "/").split("/"))


def map_yolof_decoder_torch_name(name: str):
    """Reference Decoder keys (head/decoder.py:10) -> our paths:
    cls_subnet/bbox_subnet Sequential triplets (conv, norm, act) ->
    cls_{i}/reg_{i}; heads keep their names."""
    m = re.match(r"^(cls|bbox)_subnet\.(\d+)$", name)
    if m:
        kind, idx = m.group(1), int(m.group(2))
        i, j = idx // 3, idx % 3           # (conv, norm, act) triplets
        pre = "cls" if kind == "cls" else "reg"
        leaf = {0: "conv", 1: "bn"}[j]
        return (f"{pre}_{i}_{leaf}",)
    if name in ("cls_score", "bbox_pred", "object_pred"):
        return (name,)
    return tuple(name.replace(".", "/").split("/"))


def map_solov2_ins_torch_name(name: str):
    """Reference SOLOv2InsHead keys (solov2_head.py:21):
    {cate,kernel}_tower.{3j or 2j}.<conv|gn> Sequential triplets/pairs ->
    our {cate,kernel}_conv_{j}/{cate,kernel}_gn_{j}; cate_pred/kernel_pred."""
    m = re.match(r"^(cate|kernel)_tower\.(\d+)$", name)
    if m:
        kind, idx = m.group(1), int(m.group(2))
        # with GN: each tower conv occupies 3 slots (conv, gn, relu)
        i, j = idx // 3, idx % 3
        return (f"{kind}_{'conv' if j == 0 else 'gn'}_{i}",)
    if name in ("cate_pred", "kernel_pred"):
        return (name,)
    return tuple(name.replace(".", "/").split("/"))


def map_solov2_mask_torch_name(name: str):
    """Reference SOLOv2MaskHead keys (solov2_head.py:161):
    convs_all_levels.{i}.conv{j}.{0 conv, 1 gn} -> l{i}_c{j}_{conv,gn};
    conv_pred.{0,1} -> pred_{conv,gn}."""
    m = re.match(r"^convs_all_levels\.(\d+)\.conv(\d+)\.(\d)$", name)
    if m:
        i, j, k = m.groups()
        return (f"l{i}_c{j}_{'conv' if k == '0' else 'gn'}",)
    m = re.match(r"^conv_pred\.(\d)$", name)
    if m:
        return (f"pred_{'conv' if m.group(1) == '0' else 'gn'}",)
    return tuple(name.replace(".", "/").split("/"))


def map_bifpn_torch_name(name: str):
    """Reference BiFPN keys (neck/bifpn.py:295) -> our flax module names.

    ``resample.{L}.conv.{conv,bn}`` (input-level extension),
    ``cell.{r}.fnode.{i}.combine.resample.{off}.conv.{conv,bn}`` (edge
    resampling), ``cell.{r}.fnode.{i}.after_combine.conv.{conv,bn,
    conv_dw,conv_pw}`` (node refinement). ``edge_weights`` is handled by
    ``port_bifpn_state_dict`` (raw parameter, not weight/bias-shaped).
    """
    m = re.match(r"^resample\.(\d+)\.conv\.(conv|bn)$", name)
    if m:
        return (f"resample_{m.group(1)}_{m.group(2)}",)
    m = re.match(
        r"^cell\.(\d+)\.fnode\.(\d+)\.combine\.resample\.(\d+)"
        r"\.conv\.(conv|bn)$",
        name,
    )
    if m:
        r, i, off, leaf = m.groups()
        return (f"cell{r}_fnode{i}_res{off}_{leaf}",)
    m = re.match(
        r"^cell\.(\d+)\.fnode\.(\d+)\.after_combine\.conv"
        r"\.(conv_dw|conv_pw|conv|bn)$",
        name,
    )
    if m:
        r, i, leaf = m.groups()
        suffix = {"conv": "conv", "bn": "bn", "conv_dw": "dw",
                  "conv_pw": "pw"}[leaf]
        return (f"cell{r}_fnode{i}_conv_{suffix}",)
    return tuple(name.replace(".", "/").split("/"))


def port_bifpn_state_dict(state_dict, variables, strict: bool = False):
    """Pour a reference BiFPN state dict into our variables; the fastattn
    ``edge_weights`` are raw 1-d parameters that the generic leaf rules
    (weight/bias/running_*) do not cover."""
    edges = {}
    rest = {}
    for k, v in state_dict.items():
        if k.endswith(".edge_weights"):
            edges[k] = v
        else:
            rest[k] = v
    new_vars, report = port_torch_state_dict(
        rest, variables, name_mapper=map_bifpn_torch_name, strict=False
    )
    for k, v in edges.items():
        m = re.match(r"^cell\.(\d+)\.fnode\.(\d+)\.combine\.edge_weights$", k)
        assert m, k
        name = f"cell{m.group(1)}_fnode{m.group(2)}_edge"
        leaf = new_vars["params"][name]
        w = np.asarray(v)
        assert leaf.shape == w.shape, (name, leaf.shape, w.shape)
        new_vars["params"][name] = w.astype(leaf.dtype)
        report["ported"].append(k)
    if strict and report["unused"]:
        raise KeyError(f"unmatched torch keys: {report['unused'][:20]}")
    return new_vars, report
