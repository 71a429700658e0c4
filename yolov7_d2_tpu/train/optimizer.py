"""Optimizer builder with parameter groups.

Parity with the reference optimizer layer
(/root/reference/yolov7/optimizer/build.py): ``sgd``/``adamw`` registry
(:235,:249) over d2go-style parameter groups — per-group LR
(``BIAS_LR_FACTOR``, ``LR_MULTIPLIER_OVERWRITE``, build.py:78-117),
per-group weight decay (``WEIGHT_DECAY_NORM`` for norm-module params
including their biases, ``WEIGHT_DECAY_BIAS`` for other biases,
``WEIGHT_DECAY_EMBED`` for embeddings, build.py:120-171), the backbone
LR multiplier (SOLVER.BACKBONE_MULTIPLIER, the DETR-trainer group), and
full-model gradient clipping (:206-223). Implemented as optax transforms
with parameter-path masks (the pytree-native version of param groups);
differentially tested against the reference's own ``build.py`` driving
``torch.optim.{SGD,AdamW}`` in tests/test_torch_parity_optim.py.

d2 semantics for the decay knobs: ``None`` means "same as
SOLVER.WEIGHT_DECAY" (detectron2 solver/build.py
get_default_optimizer_params); the d2 default is WEIGHT_DECAY_NORM=0.0,
WEIGHT_DECAY_BIAS=None — i.e. the reference trainers DO decay conv/dense
biases at the base weight decay.
"""

from __future__ import annotations

from typing import Callable

import optax

from yolov7_d2_tpu.core.registry import OPTIMIZER_REGISTRY


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def make_mask(params, predicate: Callable[[str], bool]):
    """Boolean mask pytree from a parameter-path predicate."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    vals = [predicate(_path_str(path)) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, vals)


# module-name tokens identifying norm layers in our param trees (flax
# module names: "bn", "norm"/"norm1", "l0_gn1", "ln", ...). The torch
# side classifies by isinstance(module, norm_types) (build.py:137-148);
# ours by path, which the weight-port name maps keep aligned.
_NORM_TOKENS = ("bn", "norm", "gn", "ln")


def param_decay_class(path: str) -> str:
    """The reference's weight-decay taxonomy for one parameter path.

    Returns ``'norm' | 'bias' | 'embed' | 'weight'`` mirroring
    get_optimizer_param_groups_weight_decay (build.py:120-171): every
    param of a norm MODULE (affine weight *and* bias) gets
    WEIGHT_DECAY_NORM; nn.Embedding weights WEIGHT_DECAY_EMBED; other
    params named ``bias`` WEIGHT_DECAY_BIAS; the rest WEIGHT_DECAY.
    """
    segs = path.lower().split("/")
    leaf = segs[-1]
    parent = segs[-2] if len(segs) > 1 else ""
    if leaf == "scale":  # flax norm affine weight (torch <norm>.weight)
        return "norm"
    norm_parent = any(t in parent for t in _NORM_TOKENS)
    if leaf == "bias":
        return "norm" if norm_parent else "bias"
    if leaf == "embedding":  # flax nn.Embed table (torch nn.Embedding)
        return "embed"
    return "weight"


def is_norm_or_bias(path: str) -> bool:
    """True for params outside the base WEIGHT_DECAY group (kept for
    existing callers/tests; superseded by :func:`param_decay_class`)."""
    return param_decay_class(path) != "weight"


def _decay_values(cfg):
    """Per-class weight decay values with d2's None => WEIGHT_DECAY rule."""
    wd = float(cfg.SOLVER.WEIGHT_DECAY or 0.0)

    def resolve(v):
        return wd if v is None else float(v)

    return {
        "weight": wd,
        "norm": resolve(getattr(cfg.SOLVER, "WEIGHT_DECAY_NORM", 0.0)),
        "bias": resolve(getattr(cfg.SOLVER, "WEIGHT_DECAY_BIAS", None)),
        "embed": resolve(getattr(cfg.SOLVER, "WEIGHT_DECAY_EMBED", 0.0)),
    }


def _decay_transforms(params, cfg):
    """One masked add_decayed_weights per distinct decay class."""
    vals = _decay_values(cfg)
    out = []
    for cls, w in vals.items():
        if not w:
            continue
        mask = make_mask(params, lambda p, c=cls: param_decay_class(p) == c)
        out.append(optax.add_decayed_weights(w, mask=mask))
    return out


def _lr_multiplier(path: str, cfg) -> float:
    """The reference's per-group LR accumulation (build.py:101-108 plus
    the DETR trainer's backbone multiplier): bias factor if the param is
    named bias, then every LR_MULTIPLIER_OVERWRITE key contained in the
    module name, then BACKBONE_MULTIPLIER for backbone params."""
    p = path.lower()
    segs = p.split("/")
    module_name = "/".join(segs[:-1])
    m = 1.0
    if segs[-1] == "bias":
        m *= float(getattr(cfg.SOLVER, "BIAS_LR_FACTOR", 1.0))
    for entry in getattr(cfg.SOLVER, "LR_MULTIPLIER_OVERWRITE", []) or []:
        for kname, mult in dict(entry).items():
            if str(kname).lower() in module_name:
                m *= float(mult)
    bb = float(getattr(cfg.SOLVER, "BACKBONE_MULTIPLIER", 1.0))
    if bb != 1.0 and p.startswith("backbone"):
        m *= bb
    return m


def _scale_updates_by_path(params, cfg):
    """Per-leaf update scaling = per-group LR. Applied AFTER the
    preconditioner and base LR (adam normalizes gradient-side scaling to
    a no-op; torch applies group lr to the final update), so it scales
    both the adam/momentum step and the decoupled decay — exactly
    torch's per-group ``lr``. Returns None when every multiplier is 1."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    mults = [_lr_multiplier(_path_str(p), cfg) for p, _ in flat]
    if all(m == 1.0 for m in mults):
        return None
    mtree = jax.tree_util.tree_unflatten(treedef, mults)

    def update(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, m: u * m, updates, mtree), state

    return optax.GradientTransformation(
        lambda params: optax.EmptyState(), update)


def sgd_with_groups(lr_schedule, cfg):
    def tx(params):
        chain = []
        # torch.optim.SGD couples decay INTO the momentum buffer
        # (grad += wd*param before momentum) — decay precedes trace.
        chain.extend(_decay_transforms(params, cfg))
        chain.append(
            optax.trace(decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV)
        )
        chain.append(optax.scale_by_schedule(lambda s: -lr_schedule(s)))
        mult = _scale_updates_by_path(params, cfg)
        if mult is not None:
            chain.append(mult)
        return optax.chain(*chain)

    return tx


def adamw_with_groups(lr_schedule, cfg):
    mu_dtype = (
        "bfloat16" if bool(getattr(cfg.SOLVER, "ADAM_BF16_STATE", False))
        else None)

    def tx(params):
        chain = [
            optax.scale_by_adam(mu_dtype=mu_dtype),
        ]
        # torch.optim.AdamW: decoupled decay, scaled by the group lr —
        # added after the preconditioner, before the -lr scale.
        chain.extend(_decay_transforms(params, cfg))
        chain.append(optax.scale_by_schedule(lambda s: -lr_schedule(s)))
        mult = _scale_updates_by_path(params, cfg)
        if mult is not None:
            chain.append(mult)
        return optax.chain(*chain)

    return tx


OPTIMIZER_REGISTRY.register(sgd_with_groups, name="sgd")
OPTIMIZER_REGISTRY.register(adamw_with_groups, name="adamw")


def build_optimizer(cfg, params, lr_schedule=None):
    """Build the optax GradientTransformation for ``params``.

    Handles: optimizer selection (SOLVER.OPTIMIZER), the d2go parameter
    groups (per-class weight decay, bias LR factor, LR multiplier
    overwrites, backbone multiplier — see module docstring), and
    optional gradient clipping.
    """
    from yolov7_d2_tpu.train.schedules import build_lr_schedule

    lr_schedule = lr_schedule or build_lr_schedule(cfg)
    name = cfg.SOLVER.OPTIMIZER.lower()
    base_tx = OPTIMIZER_REGISTRY.get(name)(lr_schedule, cfg)(params)

    transforms = []
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "value":
            transforms.append(
                optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
            )
        else:  # full_model global norm
            transforms.append(
                optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
            )

    transforms.append(base_tx)
    return optax.chain(*transforms)
