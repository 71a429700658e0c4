"""Import reference PyTorch modules from /root/reference for DIFFERENTIAL
NUMERICAL PARITY testing (VERDICT round-1 item 2).

The container has torch (CPU) but not detectron2 / torchvision / omegaconf /
loguru / pycocotools. Reference *modeling* modules only need those at import
time (registries, get_norm, type markers), so we install minimal stubs into
``sys.modules`` and pre-register the reference package path so that leaf
modules import WITHOUT executing the heavy package ``__init__`` files.

This machinery is test-only: the reference code itself is never shipped or
copied — it is imported read-only, run on random weights, and compared
against our flax implementations through the weight-porting shim.
"""

from __future__ import annotations

import importlib
import os
import sys
import types
from dataclasses import dataclass

REF_ROOT = "/root/reference"


def _stub(name: str, path: str | None = None) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    if path is not None:
        mod.__path__ = [path]
    sys.modules[name] = mod
    # attach to parent so `import a.b` style attribute access works
    if "." in name:
        parent, leaf = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], leaf, mod)
    return mod


_installed = False


def install_stubs() -> None:
    global _installed
    if _installed:
        return
    import torch
    import torch.nn as nn

    # ---- `imp` (removed in py3.12; pvt_v2.py line 1 imports it unused)
    _stub("imp")

    # ---- omegaconf (darknetx does `from omegaconf import base`, unused)
    om = _stub("omegaconf")
    om.base = types.SimpleNamespace()

    # ---- alfred (logger used by yolov7.utils.checkpoint)
    class _AlfredLogger:
        def __getattr__(self, k):
            return lambda *a, **kw: None

    _alfred = _stub("alfred")
    _alfred.logger = _AlfredLogger()
    _alfred.print_shape = lambda *a, **k: None
    _stub("alfred.utils")
    _stub("alfred.utils.log").logger = _AlfredLogger()
    _stub("alfred.dl")
    _stub("alfred.dl.torch")
    _adc = _stub("alfred.dl.torch.common")
    _adc.print_tensor = lambda *a, **k: None
    _adc.device = torch.device("cpu")
    _stub("alfred.dl.metrics")
    _aml = _stub("alfred.dl.metrics.iou_loss")
    _aml.bboxes_iou = None      # import-time only (yolov7.py aliases it)

    def _alfred_ciou(p, t, sum=False):
        """Standard CIoU LOSS (1 - ciou) on cxcywh boxes — the alfred
        package itself is not installed; this transcribes the published
        CIoU formula (Zheng et al. 2019) that alfred's helper computes,
        so OrienMaskYOLOLoss (yolomask.py:605-620) can run. The jax side
        implements the identical formula
        (models/meta_arch/yolomask.py:_ciou_loss_cxcywh), making the box
        term formula-pinned rather than a true third-party differential."""
        eps = 1e-9
        px1, py1 = p[..., 0] - p[..., 2] / 2, p[..., 1] - p[..., 3] / 2
        px2, py2 = p[..., 0] + p[..., 2] / 2, p[..., 1] + p[..., 3] / 2
        tx1, ty1 = t[..., 0] - t[..., 2] / 2, t[..., 1] - t[..., 3] / 2
        tx2, ty2 = t[..., 0] + t[..., 2] / 2, t[..., 1] + t[..., 3] / 2
        iw = (torch.min(px2, tx2) - torch.max(px1, tx1)).clamp(min=0)
        ih = (torch.min(py2, ty2) - torch.max(py1, ty1)).clamp(min=0)
        inter = iw * ih
        union = p[..., 2] * p[..., 3] + t[..., 2] * t[..., 3] - inter
        iou = inter / (union + eps)
        cw = torch.max(px2, tx2) - torch.min(px1, tx1)
        ch = torch.max(py2, ty2) - torch.min(py1, ty1)
        c2 = cw * cw + ch * ch + eps
        rho2 = ((t[..., 0] - p[..., 0]) ** 2
                + (t[..., 1] - p[..., 1]) ** 2)
        import math as _math

        v = (4.0 / _math.pi ** 2) * (
            torch.atan(t[..., 2] / (t[..., 3] + eps))
            - torch.atan(p[..., 2] / (p[..., 3] + eps))
        ) ** 2
        with torch.no_grad():
            alpha = v / (1.0 - iou + v + eps)
        loss = 1.0 - (iou - rho2 / c2 - alpha * v)
        return loss.sum() if sum else loss

    _aml.ciou = _alfred_ciou
    _aml.ciou_loss = _alfred_ciou
    _stub("alfred.vis")
    _stub("alfred.vis.image")
    _avd = _stub("alfred.vis.image.det")
    _avd.visualize_det_cv2_part = lambda *a, **k: None
    _avd.visualize_det_cv2_fancy = lambda *a, **k: None
    _avm = _stub("alfred.vis.image.mask")
    _avm.label2color_mask = lambda *a, **k: None
    _avm.vis_bitmasks = lambda *a, **k: None
    _avm.vis_bitmasks_with_classes = lambda *a, **k: None

    # ---- fvcore weight init (real minimal implementations — they only
    # affect init, which parity tests overwrite anyway)
    fv = _stub("fvcore")
    fvnn = _stub("fvcore.nn")
    fvwi = _stub("fvcore.nn.weight_init")

    def c2_msra_fill(module):
        nn.init.kaiming_normal_(module.weight, mode="fan_out",
                                nonlinearity="relu")
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    def c2_xavier_fill(module):
        nn.init.kaiming_uniform_(module.weight, a=1)
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    fvwi.c2_msra_fill = c2_msra_fill
    fvwi.c2_xavier_fill = c2_xavier_fill
    fvnn.c2_xavier_fill = c2_xavier_fill  # encoder.py: from fvcore.nn import
    fvnn.c2_msra_fill = c2_msra_fill
    fvnn.weight_init = fvwi
    fv.nn = fvnn

    # fvcore loss functions (real implementations of the public formulas —
    # sparseinst_loss.py / yolof.py import these for their criteria, so the
    # loss-parity tests need the genuine math, not unavailability guards)
    def sigmoid_focal_loss(inputs, targets, alpha=-1, gamma=2,
                           reduction="none"):
        import torch.nn.functional as F

        p = torch.sigmoid(inputs)
        ce_loss = F.binary_cross_entropy_with_logits(
            inputs, targets, reduction="none")
        p_t = p * targets + (1 - p) * (1 - targets)
        loss = ce_loss * ((1 - p_t) ** gamma)
        if alpha >= 0:
            alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
            loss = alpha_t * loss
        if reduction == "mean":
            loss = loss.mean()
        elif reduction == "sum":
            loss = loss.sum()
        return loss

    def giou_loss(boxes1, boxes2, reduction="none", eps=1e-7):
        x1, y1, x2, y2 = boxes1.unbind(dim=-1)
        x1g, y1g, x2g, y2g = boxes2.unbind(dim=-1)
        assert (x2 >= x1).all(), "bad box: x1 larger than x2"
        assert (y2 >= y1).all(), "bad box: y1 larger than y2"
        xkis1 = torch.max(x1, x1g)
        ykis1 = torch.max(y1, y1g)
        xkis2 = torch.min(x2, x2g)
        ykis2 = torch.min(y2, y2g)
        intsctk = torch.zeros_like(x1)
        mask = (ykis2 > ykis1) & (xkis2 > xkis1)
        intsctk[mask] = (xkis2[mask] - xkis1[mask]) * (
            ykis2[mask] - ykis1[mask])
        unionk = ((x2 - x1) * (y2 - y1)
                  + (x2g - x1g) * (y2g - y1g) - intsctk)
        iouk = intsctk / (unionk + eps)
        xc1 = torch.min(x1, x1g)
        yc1 = torch.min(y1, y1g)
        xc2 = torch.max(x2, x2g)
        yc2 = torch.max(y2, y2g)
        area_c = (xc2 - xc1) * (yc2 - yc1)
        miouk = iouk - ((area_c - unionk) / (area_c + eps))
        loss = 1 - miouk
        if reduction == "mean":
            loss = loss.mean() if loss.numel() > 0 else 0.0 * loss.sum()
        elif reduction == "sum":
            loss = loss.sum()
        return loss

    fvnn.sigmoid_focal_loss = sigmoid_focal_loss
    fvnn.sigmoid_focal_loss_jit = sigmoid_focal_loss
    fvnn.giou_loss = giou_loss
    fvnn.smooth_l1_loss = None

    # ---- timm (resnetvd/swin/convnext imports) — faithful block stubs
    from _timm_stub import install_timm_stub

    install_timm_stub()
    import timm.models.layers as _tml

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    _tml.to_2tuple = to_2tuple
    _tml.trunc_normal_ = trunc_normal_

    # ---- loguru
    class _Logger:
        def __getattr__(self, k):
            return lambda *a, **kw: None

    _stub("loguru").logger = _Logger()

    # ---- pycocotools (boxes.py imports mask, runtime-only use)
    _stub("pycocotools")
    _stub("pycocotools.mask")

    # ---- torchvision (import-time only for the modules we test)
    tv = _stub("torchvision")
    tv.__version__ = "0.99.0"
    ops = _stub("torchvision.ops")
    opsb = _stub("torchvision.ops.boxes")

    def _unavailable(*a, **k):  # pragma: no cover
        raise RuntimeError("torchvision stub: not available in parity tests")

    def _box_area(boxes):  # real (trivial) implementation — parity tests
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def _box_iou(boxes1, boxes2):  # real pairwise IoU (yolof.py losses)
        area1 = _box_area(boxes1)
        area2 = _box_area(boxes2)
        lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
        rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (area1[:, None] + area2[None, :] - inter)

    def _tv_nms(boxes, scores, iou_threshold):
        # torchvision.ops.nms semantics — real minimal implementation so
        # the reference inference paths (postprocess/postprocessv5,
        # YOLOF) run in parity tests
        order = torch.argsort(scores, descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i)
            if order.numel() == 1:
                break
            rest = order[1:]
            lt = torch.max(boxes[i, :2], boxes[rest, :2])
            rb = torch.min(boxes[i, 2:], boxes[rest, 2:])
            wh = (rb - lt).clamp(min=0)
            inter = wh[:, 0] * wh[:, 1]
            area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            area_r = (boxes[rest, 2] - boxes[rest, 0]) * (
                boxes[rest, 3] - boxes[rest, 1])
            iou = inter / (area_i + area_r - inter)
            order = rest[iou <= iou_threshold]
        return (torch.stack(keep) if keep
                else torch.zeros(0, dtype=torch.long))

    def _tv_batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.zeros(0, dtype=torch.long)
        offset = idxs.to(boxes.dtype) * (boxes.max() + 1.0)
        return _tv_nms(boxes + offset[:, None], scores, iou_threshold)

    for m in (ops, opsb):
        m.nms = _tv_nms
        m.batched_nms = _tv_batched_nms
        m.box_area = _box_area
        m.box_iou = _box_iou
    tv.ops = ops
    models = _stub("torchvision.models")
    mutils = _stub("torchvision.models._utils")

    class IntermediateLayerGetter(nn.ModuleDict):  # minimal real impl
        def __init__(self, model, return_layers):
            layers = {}
            rl = dict(return_layers)
            for name, module in model.named_children():
                layers[name] = module
                if name in rl:
                    del rl[name]
                if not rl:
                    break
            super().__init__(layers)
            self.return_layers = dict(return_layers)

        def forward(self, x):
            out = {}
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    mutils.IntermediateLayerGetter = IntermediateLayerGetter
    models._utils = mutils

    # ---- detectron2
    d2 = _stub("detectron2")
    layers = _stub("detectron2.layers")
    bn_mod = _stub("detectron2.layers.batch_norm")
    modeling = _stub("detectron2.modeling")
    mb = _stub("detectron2.modeling.backbone")
    mbuild = _stub("detectron2.modeling.backbone.build")
    utils = _stub("detectron2.utils")
    env = _stub("detectron2.utils.env")
    comm = _stub("detectron2.utils.comm")

    class _PathManager:
        @staticmethod
        def open(path, mode="r", **kw):
            return open(path, mode, **kw)

        @staticmethod
        def exists(path):
            return os.path.exists(path)

    _stub("detectron2.utils.file_io").PathManager = _PathManager
    import logging as _logging
    _log = _stub("detectron2.utils.logger")
    _log.logging = _logging
    _log.log_first_n = lambda *a, **k: None
    _structs = _stub("detectron2.structures")

    class Boxes:
        """Real minimal d2 Boxes — yolof.py's criterion concatenates and
        indexes these; only tensor plumbing, no geometry logic."""

        def __init__(self, tensor):
            self.tensor = tensor

        def __len__(self):
            return self.tensor.shape[0]

        def __getitem__(self, item):
            return Boxes(self.tensor[item])

        @classmethod
        def cat(cls, boxes_list):
            return cls(torch.cat([b.tensor for b in boxes_list], dim=0))

        @property
        def device(self):
            return self.tensor.device

        def scale(self, scale_x, scale_y):  # real minimal (d2 boxes.py)
            self.tensor[:, 0::2] *= scale_x
            self.tensor[:, 1::2] *= scale_y

    class Instances:
        """Real minimal d2 Instances: attribute bag + image_size — the
        meta-arch eval paths build these as their final results."""

        def __init__(self, image_size, **fields):
            self._image_size = image_size
            self._fields = {}
            for k, v in fields.items():
                setattr(self, k, v)

        @property
        def image_size(self):
            return self._image_size

        def __setattr__(self, name, val):
            if name.startswith("_"):
                super().__setattr__(name, val)
            else:
                self._fields[name] = val

        def __getattr__(self, name):
            if name.startswith("_") or name not in self.__dict__.get(
                    "_fields", {}):
                raise AttributeError(name)
            return self._fields[name]

        def has(self, name):
            return name in self._fields

        def __len__(self):
            for v in self._fields.values():
                return len(v)
            return 0

    class BitMasks:
        def __init__(self, tensor):
            self.tensor = tensor

        def to(self, device):
            return self

        def __len__(self):
            return self.tensor.shape[0]

    _structs.Boxes = Boxes
    _structs.ImageList = type("ImageList", (), {})
    _structs.Instances = Instances
    _structs.BitMasks = BitMasks
    # yolov7.py/yolo.py do `from detectron2.structures import ..., boxes,
    # image_list` (module objects, import-time only)
    _structs.boxes = _stub("detectron2.structures.boxes")
    _structs.image_list = _stub("detectron2.structures.image_list")

    @dataclass
    class ShapeSpec:
        channels: int | None = None
        height: int | None = None
        width: int | None = None
        stride: int | None = None

    class FrozenBatchNorm2d(nn.Module):
        def __init__(self, num_features, eps=1e-5):
            super().__init__()
            self.num_features = num_features
            self.eps = eps
            self.register_buffer("weight", torch.ones(num_features))
            self.register_buffer("bias", torch.zeros(num_features))
            self.register_buffer("running_mean", torch.zeros(num_features))
            self.register_buffer("running_var", torch.ones(num_features) - eps)

        def forward(self, x):
            scale = self.weight * (self.running_var + self.eps).rsqrt()
            bias = self.bias - self.running_mean * scale
            return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)

    def get_norm(norm, out_channels, **kw):
        if norm is None or (isinstance(norm, str) and not norm):
            return None
        if callable(norm) and not isinstance(norm, str):
            return norm(out_channels)
        return {
            "BN": lambda c: nn.BatchNorm2d(c, **kw),
            "SyncBN": lambda c: nn.BatchNorm2d(c, **kw),
            "FrozenBN": FrozenBatchNorm2d,
            "GN": lambda c: nn.GroupNorm(32, c),
        }[norm](out_channels)

    class Backbone(nn.Module):
        def __init__(self):
            super().__init__()

        def output_shape(self):
            return {}

        @property
        def size_divisibility(self):
            return 0

    class _Registry:
        def register(self, obj=None):
            if obj is None or isinstance(obj, str):
                return lambda f: f
            return obj

        def get(self, name):  # pragma: no cover
            raise KeyError(name)

    class DeformConv(nn.Module):  # pragma: no cover — never run in parity
        def __init__(self, *a, **kw):
            super().__init__()
            raise RuntimeError("DeformConv stub: not used in parity tests")

    class ModulatedDeformConv(nn.Module):
        """CPU reference DCNv2 (the d2/mmcv CUDA op is unavailable):
        offset channels are (dy, dx) pairs per row-major kernel tap, the
        modulation mask is applied as given (the caller sigmoids it), and
        out-of-image samples are zero (per-corner bilinear gating) —
        matching ops/deform_conv.py's sampling semantics so DLA parity
        tests exercise true deformed sampling, not just zero offsets."""

        def __init__(self, in_channels, out_channels, kernel_size=3,
                     stride=1, padding=1, dilation=1, groups=1,
                     deformable_groups=1, bias=True):
            super().__init__()
            assert groups == 1 and deformable_groups == 1
            k = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
            self.k, self.stride = k, stride
            self.padding, self.dilation = padding, dilation
            self.weight = nn.Parameter(
                torch.empty(out_channels, in_channels, k, k))
            self.bias = (
                nn.Parameter(torch.zeros(out_channels)) if bias else None
            )
            nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)

        @staticmethod
        def _bilinear(x, sy, sx):
            # x [B, C, H, W]; sy/sx [B, Ho, Wo] -> [B, C, Ho, Wo]
            B, C, H, W = x.shape
            y0 = torch.floor(sy)
            x0 = torch.floor(sx)
            wy = (sy - y0).unsqueeze(1)
            wx = (sx - x0).unsqueeze(1)

            def gather(yy, xx):
                inside = ((yy >= 0) & (yy <= H - 1)
                          & (xx >= 0) & (xx <= W - 1))
                yi = yy.clamp(0, H - 1).long()
                xi = xx.clamp(0, W - 1).long()
                bidx = torch.arange(B).view(B, 1, 1)
                vals = x[bidx, :, yi, xi]          # [B, Ho, Wo, C]
                vals = vals * inside.unsqueeze(-1)
                return vals.permute(0, 3, 1, 2)
            v00 = gather(y0, x0)
            v01 = gather(y0, x0 + 1)
            v10 = gather(y0 + 1, x0)
            v11 = gather(y0 + 1, x0 + 1)
            top = v00 * (1 - wx) + v01 * wx
            bot = v10 * (1 - wx) + v11 * wx
            return top * (1 - wy) + bot * wy

        def forward(self, x, offset, mask):
            import torch.nn.functional as F

            B, C, H, W = x.shape
            k, s, p, d = self.k, self.stride, self.padding, self.dilation
            Ho = (H + 2 * p - d * (k - 1) - 1) // s + 1
            Wo = (W + 2 * p - d * (k - 1) - 1) // s + 1
            base_y = (torch.arange(Ho, dtype=x.dtype) * s - p).view(1, -1, 1)
            base_x = (torch.arange(Wo, dtype=x.dtype) * s - p).view(1, 1, -1)
            out = None
            t = 0
            for i in range(k):
                for j in range(k):
                    sy = base_y + i * d + offset[:, 2 * t]
                    sx = base_x + j * d + offset[:, 2 * t + 1]
                    sampled = self._bilinear(x, sy, sx)
                    sampled = sampled * mask[:, t].unsqueeze(1)
                    w_t = self.weight[:, :, i, j].unsqueeze(-1).unsqueeze(-1)
                    o = F.conv2d(sampled, w_t)
                    out = o if out is None else out + o
                    t += 1
            if self.bias is not None:
                out = out + self.bias.view(1, -1, 1, 1)
            return out

    class _D2Registry:
        def __init__(self, name=""):
            self._name = name
            self._map = {}

        def register(self, obj=None):
            if obj is None:
                def deco(f):
                    self._map[f.__name__] = f
                    return f
                return deco
            self._map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._map[name]

    _stub("detectron2.utils.registry").Registry = _D2Registry
    _meta = _stub("detectron2.modeling.meta_arch")
    _meta.META_ARCH_REGISTRY = _D2Registry("META_ARCH")
    _stub("detectron2.modeling.meta_arch.build").META_ARCH_REGISTRY = (
        _meta.META_ARCH_REGISTRY)
    _stub("detectron2.layers.shape_spec").ShapeSpec = ShapeSpec

    # ---- import-time-only d2 names used by meta_arch/yolof.py (the loss
    # parity tests construct YOLOF via __new__ and call matcher/losses only,
    # so these never execute)
    def configurable(init_func=None, *, from_config=None):
        if init_func is not None:
            return init_func
        return lambda f: f

    _stub("detectron2.config").configurable = configurable
    _stub("detectron2.config.config").configurable = configurable

    # ---- detectron2.solver.build: the reference optimizer layer
    # (yolov7/optimizer/build.py:9-12) imports reduce_param_groups +
    # maybe_add_gradient_clipping. reduce_param_groups is a faithful
    # transcription of detectron2 solver/build.py (test-only, by design —
    # the optimizer differential drives the reference's OWN param-group
    # builder through torch.optim, tests/test_torch_parity_optim.py).
    from collections import defaultdict as _dd

    def _expand_param_groups(params):
        # per-parameter structure; later items overwrite earlier ones
        ret = _dd(dict)
        for item in params:
            assert "params" in item
            cur = {x: y for x, y in item.items() if x != "params"}
            for param in item["params"]:
                ret[param].update({"params": [param], **cur})
        return list(ret.values())

    def reduce_param_groups(params):
        # merge groups with identical hyperparameters
        params = _expand_param_groups(params)
        groups = _dd(list)
        for item in params:
            cur = tuple((x, y) for x, y in item.items() if x != "params")
            groups[cur].extend(item["params"])
        ret = []
        for param_keys, param_values in groups.items():
            cur = {kv[0]: kv[1] for kv in param_keys}
            cur["params"] = param_values
            ret.append(cur)
        return ret

    def d2_maybe_add_gradient_clipping(cfg, optimizer):
        if not cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
            return optimizer  # identity when disabled (the tested path)
        raise NotImplementedError(
            "stub: d2 clip-enabled path not needed by the parity tests")

    _solver_build = _stub("detectron2.solver.build")
    _solver_build.reduce_param_groups = reduce_param_groups
    _solver_build.maybe_add_gradient_clipping = d2_maybe_add_gradient_clipping

    _ddu = _stub("detectron2.data")
    _det_utils = _stub("detectron2.data.detection_utils")
    _det_utils.convert_image_to_rgb = lambda img, fmt: img
    _ddu.detection_utils = _det_utils
    _anchg = _stub("detectron2.modeling.anchor_generator")
    _anchg.build_anchor_generator = lambda *a, **k: None
    _postp = _stub("detectron2.modeling.postprocessing")
    _postp.detector_postprocess = lambda *a, **k: None
    _events = _stub("detectron2.utils.events")
    _events.get_event_storage = lambda: None

    def nonzero_tuple(x):  # real minimal impl (d2 layers/wrappers.py)
        if x.dim() == 0:
            return x.unsqueeze(0).nonzero().unbind(1)
        return x.nonzero(as_tuple=True)

    layers.ShapeSpec = ShapeSpec
    # solov2_head.py imports these from detectron2.layers; only cat() runs
    # in the parity path
    import torch as _t
    layers.cat = lambda ts, dim=0: _t.cat(ts, dim)

    def _greedy_nms(boxes, scores, iou_threshold):
        # torchvision.ops.nms semantics (descending score, suppress
        # IoU > threshold) — real minimal implementation for the
        # reference inference paths (YOLOF etc.)
        order = torch.argsort(scores, descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i)
            if order.numel() == 1:
                break
            rest = order[1:]
            lt = torch.max(boxes[i, :2], boxes[rest, :2])
            rb = torch.min(boxes[i, 2:], boxes[rest, 2:])
            wh = (rb - lt).clamp(min=0)
            inter = wh[:, 0] * wh[:, 1]
            area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            area_r = (boxes[rest, 2] - boxes[rest, 0]) * (
                boxes[rest, 3] - boxes[rest, 1])
            iou = inter / (area_i + area_r - inter)
            order = rest[iou <= iou_threshold]
        return torch.stack(keep) if keep else torch.zeros(0, dtype=torch.long)

    def _batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.zeros(0, dtype=torch.long)
        offset = idxs.to(boxes.dtype) * (boxes.max() + 1.0)
        return _greedy_nms(boxes + offset[:, None], scores, iou_threshold)

    layers.batched_nms = _batched_nms
    layers.paste_masks_in_image = None
    layers.nonzero_tuple = nonzero_tuple
    _anch = _stub("detectron2.modeling.anchor_generator")
    _anch.DefaultAnchorGenerator = type("DefaultAnchorGenerator",
                                        (nn.Module,), {})
    _boxreg = _stub("detectron2.modeling.box_regression")
    _boxreg.Box2BoxTransform = type("Box2BoxTransform", (), {})
    layers.DeformConv = DeformConv
    layers.ModulatedDeformConv = ModulatedDeformConv
    layers.get_norm = get_norm
    layers.BatchNorm2d = nn.BatchNorm2d
    layers.NaiveSyncBatchNorm = nn.BatchNorm2d
    layers.FrozenBatchNorm2d = FrozenBatchNorm2d
    layers.Conv2d = nn.Conv2d
    layers.batch_norm = bn_mod
    bn_mod.get_norm = get_norm
    bn_mod.FrozenBatchNorm2d = FrozenBatchNorm2d
    mb.Backbone = Backbone
    mb.build_backbone = lambda *a, **k: None  # never called in parity paths
    mb.BACKBONE_REGISTRY = _D2Registry("BACKBONE")
    # res2next.py imports `detectron2.modeling.backbone.backbone` directly
    _stub("detectron2.modeling.backbone.backbone").Backbone = Backbone
    # dla.py imports d2 resnet block types (only re-exported, never built)
    # and the FPN class (unused in the parity path)
    _res = _stub("detectron2.modeling.backbone.resnet")
    _res.BasicStem = type("BasicStem", (nn.Module,), {})
    _res.BottleneckBlock = type("BottleneckBlock", (nn.Module,), {})
    _res.DeformBottleneckBlock = type("DeformBottleneckBlock", (nn.Module,), {})
    # bifpn.py imports the d2 resnet builder (only used by its registered
    # build_* functions, never in the parity path)
    _res.build_resnet_backbone = lambda *a, **k: None
    _fpn = _stub("detectron2.modeling.backbone.fpn")
    _fpn.FPN = type("FPN", (nn.Module,), {})
    _fpn.LastLevelMaxPool = type("LastLevelMaxPool", (nn.Module,), {})
    _fpn.LastLevelP6P7 = type("LastLevelP6P7", (nn.Module,), {})
    mb.FPN = _fpn.FPN  # dlafpn.py: `from detectron2.modeling.backbone import FPN`
    mb.build = mbuild
    mb.BACKBONE_REGISTRY = _Registry()
    mbuild.BACKBONE_REGISTRY = _Registry()
    modeling.backbone = mb
    modeling.BACKBONE_REGISTRY = _Registry()
    modeling.META_ARCH_REGISTRY = _Registry()
    modeling.RPN_HEAD_REGISTRY = _Registry()
    modeling.Backbone = Backbone
    modeling.build_backbone = lambda *a, **k: None  # import-time only
    modeling.detector_postprocess = lambda *a, **k: None
    _structs.PolygonMasks = type("PolygonMasks", (), {})
    # import-time type markers for yolov7.py/yolo.py/yolov5.py
    modeling.ResNet = type("ResNet", (nn.Module,), {})
    modeling.ResNetBlockBase = type("ResNetBlockBase", (nn.Module,), {})
    _stub("detectron2.layers.nms").batched_nms = None
    modeling.ShapeSpec = ShapeSpec  # res2next.py imports it from modeling
    env.TORCH_VERSION = (2, 99)
    comm.get_world_size = lambda: 1
    comm.is_main_process = lambda: True
    d2.layers = layers
    d2.modeling = modeling
    d2.utils = utils

    _installed = True


def ref_module(dotted: str):
    """Import a reference leaf module (e.g.
    ``yolov7.modeling.backbone.darknetx``) with all parent package
    ``__init__`` files bypassed (they chain-import heavy deps)."""
    install_stubs()
    # pre-stub the backbone package chain: leaf modules in OTHER subpackages
    # (neck/, head/) relative-import `..backbone.layers.wrappers`, which
    # would otherwise execute the heavy backbone/__init__. The `layers`
    # package itself is NOT stubbed — its real __init__ is light (wrappers
    # + activations) and efficientnet.py does `from .layers import Conv2d`,
    # which needs the executed module, not an empty stub.
    for extra in ("yolov7", "yolov7.modeling", "yolov7.modeling.backbone"):
        _stub(extra, path=os.path.join(REF_ROOT, *extra.split(".")))
    parts = dotted.split(".")
    for i in range(1, len(parts)):
        name = ".".join(parts[:i])
        path = os.path.join(REF_ROOT, *parts[:i])
        _stub(name, path=path)
    return importlib.import_module(dotted)
