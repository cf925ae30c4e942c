"""Dependency shims that let the reference detectron2 (at /root/reference)
run on CPU torch in this environment, so it can serve as a golden ORACLE for
parity tests (dev/make_goldens.py).

The environment has torch (cpu) but not fvcore / yacs / torchvision /
pycocotools / iopath / omegaconf. Each shim below reimplements the minimal,
publicly-documented semantics the reference actually uses — written from the
documented behavior, not copied. The only shim whose numerics matter to the
goldens is torchvision.ops.roi_align / nms: both are implemented here as
direct, slow transcriptions of their published mathematical definitions
(bilinear sampling with aligned half-pixel offsets; greedy score-descending
IoU suppression) so they are an oracle independent of detectron2_tpu's own
implementations.

Usage:  from stubs import install; install()   # before importing detectron2
"""

import copy
import math
import os
import sys
import types

import numpy as np
import torch
import torch.nn as nn


# ---------------------------------------------------------------- yacs-style CfgNode


class CfgNode(dict):
    """Minimal yacs-compatible config node: attribute access, clone, freeze,
    merge_from_other_cfg/list, yaml dump. Enough for get_cfg() + tests."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None, new_allowed=False):
        init_dict = {} if init_dict is None else init_dict
        super().__init__(init_dict)
        self.__dict__[CfgNode.IMMUTABLE] = False

    def __getattr__(self, name):
        if name in self:
            return self[name]
        raise AttributeError(name)

    def __setattr__(self, name, value):
        if self.__dict__.get(CfgNode.IMMUTABLE):
            raise AttributeError(f"attempted to set {name} on immutable config")
        self[name] = value

    def clone(self):
        return copy.deepcopy(self)

    def freeze(self):
        self.__dict__[CfgNode.IMMUTABLE] = True
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self):
        self.__dict__[CfgNode.IMMUTABLE] = False
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self):
        return self.__dict__[CfgNode.IMMUTABLE]

    def merge_from_other_cfg(self, other):
        def _merge(src, dst):
            for k, v in src.items():
                if isinstance(v, CfgNode) and isinstance(dst.get(k), CfgNode):
                    _merge(v, dst[k])
                else:
                    dst[k] = v

        _merge(other, self)

    def merge_from_list(self, opts):
        for k, v in zip(opts[0::2], opts[1::2]):
            node = self
            keys = k.split(".")
            for sub in keys[:-1]:
                node = node[sub]
            old = node[keys[-1]]
            node[keys[-1]] = type(old)(v) if old is not None else v

    def dump(self, **kwargs):
        import json

        return json.dumps(self, default=str)

    @classmethod
    def load_yaml_with_base(cls, filename, allow_unsafe=False):
        """yaml load with recursive ``_BASE_`` resolution (fvcore
        CfgNode.load_yaml_with_base semantics) — lets the reference's
        merge_from_file work on the real config zoo under the stubs."""
        import os

        import yaml

        with open(filename) as f:
            try:
                raw = yaml.safe_load(f)
            except yaml.constructor.ConstructorError:
                f.seek(0)
                raw = yaml.unsafe_load(f)
        raw = raw or {}

        def leaf(v):
            # yacs literal-evals yaml strings, so "(512, 1024)" merges as a
            # tuple (yacs _decode_cfg_value semantics)
            if isinstance(v, str):
                import ast

                try:
                    w = ast.literal_eval(v)
                except (ValueError, SyntaxError):
                    return v
                if isinstance(w, (tuple, list, dict, int, float, bool)) or w is None:
                    return w
            return v

        def to_node(d):
            if isinstance(d, dict):
                return cls({k: to_node(v) for k, v in d.items()})
            return leaf(d)

        base = raw.pop("_BASE_", None)
        node = to_node(raw)
        if base is not None:
            base = os.path.expanduser(base)
            if not os.path.isabs(base):
                base = os.path.join(os.path.dirname(filename), base)
            base_cfg = cls.load_yaml_with_base(base, allow_unsafe)
            base_cfg.merge_from_other_cfg(node)
            return base_cfg
        return node

    @classmethod
    def load_cfg(cls, s):  # pragma: no cover
        raise NotImplementedError

    def __deepcopy__(self, memo):
        new = type(self)()
        for k, v in self.items():
            new[k] = copy.deepcopy(v, memo)
        return new


# ---------------------------------------------------------------- fvcore shims


def _c2_msra_fill(module):
    nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
    if module.bias is not None:
        nn.init.constant_(module.bias, 0)


def _c2_xavier_fill(module):
    nn.init.kaiming_uniform_(module.weight, a=1)
    if module.bias is not None:
        nn.init.constant_(module.bias, 0)


def _smooth_l1_loss(input, target, beta, reduction="none"):
    if beta < 1e-5:
        loss = torch.abs(input - target)
    else:
        n = torch.abs(input - target)
        cond = n < beta
        loss = torch.where(cond, 0.5 * n**2 / beta, n - 0.5 * beta)
    if reduction == "mean":
        loss = loss.mean() if loss.numel() > 0 else 0.0 * loss.sum()
    elif reduction == "sum":
        loss = loss.sum()
    return loss


def _giou_loss(boxes1, boxes2, reduction="none", eps=1e-7):
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
    intsctk[mask] = (xkis2[mask] - xkis1[mask]) * (ykis2[mask] - ykis1[mask])
    unionk = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsctk
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


def _sigmoid_focal_loss(inputs, targets, alpha=-1, gamma=2, reduction="none"):
    p = torch.sigmoid(inputs)
    ce_loss = torch.nn.functional.binary_cross_entropy_with_logits(
        inputs, targets, reduction="none"
    )
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


class Registry:
    def __init__(self, name):
        self._name = name
        self._map = {}

    def register(self, obj=None):
        if obj is None:

            def deco(fn_or_cls):
                self._map[fn_or_cls.__name__] = fn_or_cls
                return fn_or_cls

            return deco
        self._map[obj.__name__] = obj
        return obj

    def get(self, name):
        return self._map[name]

    def __contains__(self, name):
        return name in self._map

    def __iter__(self):
        return iter(self._map.items())


class HistoryBuffer:
    def __init__(self, max_length: int = 1000000):
        self._max_length = max_length
        self._data = []
        self._count = 0
        self._global_avg = 0.0

    def update(self, value, iteration=None):
        if iteration is None:
            iteration = self._count
        if len(self._data) == self._max_length:
            self._data.pop(0)
        self._data.append((value, iteration))
        self._count += 1
        self._global_avg += (value - self._global_avg) / self._count

    def latest(self):
        return self._data[-1][0]

    def median(self, window_size):
        return float(np.median([x[0] for x in self._data[-window_size:]]))

    def avg(self, window_size):
        return float(np.mean([x[0] for x in self._data[-window_size:]]))

    def global_avg(self):
        return self._global_avg

    def values(self):
        return self._data


# ---------------------------------------------------------------- torchvision shims


def _tv_nms(boxes: torch.Tensor, scores: torch.Tensor, iou_threshold: float):
    """Exact greedy NMS: score-descending scan, suppress IoU > threshold.
    Direct transcription of the documented torchvision.ops.nms contract."""
    order = scores.argsort(descending=True)
    boxes = boxes[order]
    x1, y1, x2, y2 = boxes.unbind(-1)
    areas = (x2 - x1) * (y2 - y1)
    keep = []
    alive = torch.ones(len(boxes), dtype=torch.bool)
    for i in range(len(boxes)):
        if not alive[i]:
            continue
        keep.append(order[i].item())
        xx1 = torch.max(x1[i], x1)
        yy1 = torch.max(y1[i], y1)
        xx2 = torch.min(x2[i], x2)
        yy2 = torch.min(y2[i], y2)
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas - inter)
        # suppress only on iou > threshold: 0/0 = NaN between two zero-area
        # boxes must NOT suppress (torchvision keeps zero-area boxes — their
        # IoU comparison 'NaN > thr' is false in the C++ kernel)
        alive &= ~(iou > iou_threshold)
        alive[i] = False
    return torch.as_tensor(keep, dtype=torch.int64)


def _tv_batched_nms(boxes, scores, idxs, iou_threshold):
    """Per-class NMS via the coordinate-offset trick (torchvision semantics)."""
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.int64)
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
    keep = _tv_nms(boxes + offsets[:, None], scores, iou_threshold)
    return keep


def _bilinear(plane: torch.Tensor, y: float, x: float) -> torch.Tensor:
    """Bilinear interpolation on [C, H, W] with zero padding outside,
    matching the ROIAlign sampling rule (points with y/x < -1 or > size
    contribute zero; coords are clamped at 0 on the low side)."""
    C, H, W = plane.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return plane.new_zeros(C)
    y = min(max(y, 0.0), H - 1)
    x = min(max(x, 0.0), W - 1)
    y0, x0 = int(math.floor(y)), int(math.floor(x))
    y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    return (
        plane[:, y0, x0] * (1 - ly) * (1 - lx)
        + plane[:, y0, x1] * (1 - ly) * lx
        + plane[:, y1, x0] * ly * (1 - lx)
        + plane[:, y1, x1] * ly * lx
    )


def _tv_roi_align(
    input, boxes, output_size, spatial_scale=1.0, sampling_ratio=-1, aligned=False
):
    """Exact ROIAlign from the published definition (Mask R-CNN paper +
    torchvision docs): average of bilinear samples on a regular grid inside
    each output bin; `aligned=True` shifts by half a pixel. Vectorized in
    numpy per roi (grid counts are per-roi when sampling_ratio <= 0)."""
    import numpy as np

    if isinstance(boxes, torch.Tensor):
        rois = boxes
    else:
        rois = torch.cat(
            [
                torch.cat([torch.full((len(b), 1), i, dtype=b.dtype), b], dim=1)
                for i, b in enumerate(boxes)
            ],
            dim=0,
        )
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph_n, pw_n = output_size
    N, C, H, W = input.shape
    feat = input.detach().cpu().numpy()
    out = np.zeros((len(rois), C, ph_n, pw_n), np.float32)
    offset = 0.5 if aligned else 0.0
    rois_np = rois.detach().cpu().numpy()

    def taps(coords, size):
        """bilinear taps with RoIAlign semantics: zero weight outside
        [-1, size]; coords clamped into [0, size-1]."""
        inside = (coords >= -1.0) & (coords <= size)
        c = np.clip(coords, 0.0, size - 1)
        lo = np.floor(c).astype(np.int64)
        hi = np.minimum(lo + 1, size - 1)
        frac = c - lo
        return lo, hi, frac, inside

    for r, roi in enumerate(rois_np):
        b = int(roi[0])
        x1 = roi[1] * spatial_scale - offset
        y1 = roi[2] * spatial_scale - offset
        x2 = roi[3] * spatial_scale - offset
        y2 = roi[4] * spatial_scale - offset
        roi_w, roi_h = x2 - x1, y2 - y1
        if not aligned:
            roi_w, roi_h = max(roi_w, 1.0), max(roi_h, 1.0)
        bin_h, bin_w = roi_h / ph_n, roi_w / pw_n
        gh = sampling_ratio if sampling_ratio > 0 else max(int(math.ceil(roi_h / ph_n)), 1)
        gw = sampling_ratio if sampling_ratio > 0 else max(int(math.ceil(roi_w / pw_n)), 1)
        ys = y1 + (np.arange(ph_n)[:, None] + (np.arange(gh)[None, :] + 0.5) / gh).reshape(-1) * bin_h
        xs = x1 + (np.arange(pw_n)[:, None] + (np.arange(gw)[None, :] + 0.5) / gw).reshape(-1) * bin_w
        ylo, yhi, fy, yin = taps(ys, H)
        xlo, xhi, fx, xin = taps(xs, W)
        plane = feat[b]  # [C, H, W]
        v = (
            plane[:, ylo[:, None], xlo[None, :]] * ((1 - fy)[:, None] * (1 - fx)[None, :])
            + plane[:, ylo[:, None], xhi[None, :]] * ((1 - fy)[:, None] * fx[None, :])
            + plane[:, yhi[:, None], xlo[None, :]] * (fy[:, None] * (1 - fx)[None, :])
            + plane[:, yhi[:, None], xhi[None, :]] * (fy[:, None] * fx[None, :])
        )  # [C, ph*gh, pw*gw]
        v = v * (yin[:, None] & xin[None, :])
        v = v.reshape(C, ph_n, gh, pw_n, gw).mean(axis=(2, 4))
        out[r] = v
    return torch.from_numpy(out).to(input.dtype)


# ---------------------------------------------------------------- install


def install():
    """Insert all shims into sys.modules (idempotent)."""
    if "fvcore" in sys.modules and getattr(sys.modules["fvcore"], "_d2tpu_stub", False):
        return

    def mod(name):
        m = types.ModuleType(name)
        m._d2tpu_stub = True
        sys.modules[name] = m
        return m

    fvcore = mod("fvcore")
    fvcore.__version__ = "0.1.6"
    fv_nn = mod("fvcore.nn")
    fv_wi = mod("fvcore.nn.weight_init")
    fv_dist = mod("fvcore.nn.distributed")
    fv_common = mod("fvcore.common")
    fv_cfg = mod("fvcore.common.config")
    fv_reg = mod("fvcore.common.registry")
    fv_hb = mod("fvcore.common.history_buffer")
    fv_tfm = mod("fvcore.transforms")
    fv_ps = mod("fvcore.common.param_scheduler")
    fv_timer = mod("fvcore.common.timer")
    fv_ckpt = mod("fvcore.common.checkpoint")
    fvcore.nn = fv_nn
    fvcore.common = fv_common

    fv_wi.c2_msra_fill = _c2_msra_fill
    fv_wi.c2_xavier_fill = _c2_xavier_fill
    fv_nn.weight_init = fv_wi
    fv_nn.smooth_l1_loss = _smooth_l1_loss
    fv_nn.giou_loss = _giou_loss
    fv_nn.sigmoid_focal_loss_jit = _sigmoid_focal_loss
    fv_nn.sigmoid_focal_loss = _sigmoid_focal_loss

    def _sigmoid_focal_loss_star(inputs, targets, alpha=-1, gamma=1, reduction="none"):
        # fvcore focal loss* (documented formula): -log_sigmoid(gamma * (2t-1) * x) / gamma
        shifted = gamma * (inputs * (2 * targets - 1))
        loss = torch.nn.functional.softplus(-shifted) / gamma
        if alpha >= 0:
            loss = loss * (alpha * targets + (1 - alpha) * (1 - targets))
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss

    fv_nn.sigmoid_focal_loss_star = _sigmoid_focal_loss_star
    fv_nn.sigmoid_focal_loss_star_jit = _sigmoid_focal_loss_star
    fv_dist.differentiable_all_reduce = lambda t: t
    fv_dist.differentiable_all_gather = lambda t: [t]  # world size 1
    fv_cfg.CfgNode = CfgNode
    fv_reg.Registry = Registry
    fv_hb.HistoryBuffer = HistoryBuffer

    import fvcore_transforms_stub as _ftt

    fv_tfm_t = mod("fvcore.transforms.transform")
    for name in _ftt.__all__:
        setattr(fv_tfm_t, name, getattr(_ftt, name))
        setattr(fv_tfm, name, getattr(_ftt, name))
    fv_tfm_t.__all__ = list(_ftt.__all__)
    fv_tfm.transform = fv_tfm_t

    class ParamScheduler:  # for solver imports
        pass

    for n in (
        "CosineParamScheduler",
        "MultiStepParamScheduler",
        "LinearParamScheduler",
        "CompositeParamScheduler",
        "ConstantParamScheduler",
        "StepWithFixedGammaParamScheduler",
        "PolynomialDecayParamScheduler",
    ):
        setattr(fv_ps, n, type(n, (ParamScheduler,), {}))
    fv_ps.ParamScheduler = ParamScheduler

    import time as _time

    class Timer:
        def __init__(self):
            self._start = _time.perf_counter()

        def reset(self):
            self._start = _time.perf_counter()

        def seconds(self):
            return _time.perf_counter() - self._start

    fv_timer.Timer = Timer

    class Checkpointer:  # only referenced by checkpoint code paths we don't run
        def __init__(self, *a, **k):
            raise NotImplementedError

    fv_ckpt.Checkpointer = Checkpointer
    fv_ckpt.PeriodicCheckpointer = type("PeriodicCheckpointer", (), {})
    fv_ckpt._IncompatibleKeys = type("_IncompatibleKeys", (), {})

    tv = mod("torchvision")
    tv.__version__ = "0.15.2"
    tv_ops = mod("torchvision.ops")
    tv_boxes = mod("torchvision.ops.boxes")
    tv.ops = tv_ops
    tv_ops.boxes = tv_boxes
    tv_ops.nms = _tv_nms
    tv_ops.roi_align = _tv_roi_align
    tv_boxes.batched_nms = _tv_batched_nms
    tv_boxes.nms = _tv_nms

    class RoIPool:  # referenced by poolers.py type hints only
        def __init__(self, *a, **k):
            raise NotImplementedError

    tv_ops.RoIPool = RoIPool

    def _deform_conv2d(*a, **k):  # layers/deform_conv.py import only
        raise NotImplementedError

    tv_ops.deform_conv2d = _deform_conv2d

    # pycocotools.mask: only needed when rasterizing polygon GT — route to
    # detectron2_tpu's own RLE codec where semantics allow; raise otherwise.
    pct = mod("pycocotools")
    pct_mask = mod("pycocotools.mask")
    pct.mask = pct_mask

    def _not_impl(*a, **k):
        raise NotImplementedError("pycocotools shim: not needed for goldens")

    for fn in ("encode", "decode", "merge", "frPyObjects", "area", "toBbox", "iou"):
        setattr(pct_mask, fn, _not_impl)

    iopath = mod("iopath")
    iop_common = mod("iopath.common")
    iop_fio = mod("iopath.common.file_io")
    iopath.common = iop_common

    class PathHandler:
        def _get_supported_prefixes(self):
            return []

    class PathManagerBase:
        def __init__(self):
            pass

        def register_handler(self, *a, **k):
            pass

        def get_local_path(self, path, **k):
            return path

        def open(self, path, mode="r", **k):
            return open(path, mode)

        def isfile(self, path):
            import os

            return os.path.isfile(path)

        def exists(self, path):
            import os

            return os.path.exists(path)

    iop_fio.PathHandler = PathHandler
    iop_fio.PathManager = PathManagerBase
    iop_fio.HTTPURLHandler = type("HTTPURLHandler", (PathHandler,), {})
    iop_fio.OneDrivePathHandler = type("OneDrivePathHandler", (PathHandler,), {})
    iop_fio.file_lock = lambda p: open("/dev/null")

    # ---- pkg_resources (detectron2/model_zoo/model_zoo.py:4 uses
    # resource_filename to locate its bundled configs)
    pr = mod("pkg_resources")

    def _resource_filename(package, resource):
        import importlib

        m = importlib.import_module(package)
        path = os.path.join(os.path.dirname(m.__file__), resource)
        if not os.path.exists(path) and package == "detectron2.model_zoo":
            # in-repo checkout: detectron2/model_zoo/configs is a symlink the
            # reference's setup.py creates at build time; fall back to the
            # repo's real configs tree
            alt = os.path.join(os.path.dirname(m.__file__), "..", "..", resource)
            if os.path.exists(alt):
                return os.path.normpath(alt)
        return path

    pr.resource_filename = _resource_filename

    # the Rethinking-BatchNorm configs name a torch alias that does not
    # exist in modern torch (retinanet_SyncBNhead.py:9 nn.SyncBatchNorm2d);
    # NB: install() later does a local `import torch.nn as nn`, so reference
    # torch.nn explicitly here
    if not hasattr(torch.nn, "SyncBatchNorm2d"):
        torch.nn.SyncBatchNorm2d = torch.nn.SyncBatchNorm

    # ---- fairscale (MViT/ViT wrap blocks in checkpoint_wrapper when
    # use_act_checkpoint; identity is fine for state_dict/eval purposes)
    fs = mod("fairscale")
    fs_nn = mod("fairscale.nn")
    fs_ckpt = mod("fairscale.nn.checkpoint")
    fs_ckpt.checkpoint_wrapper = lambda module, *a, **k: module
    fs.nn = fs_nn
    fs_nn.checkpoint = fs_ckpt

    # ---- compiled-extension shims: module-level `from X import _C` guards
    # (detectron2/layers/deform_conv.py:506, tensormask/__init__.py) succeed,
    # so the module classes register their parameters; the custom ops
    # themselves are never called when only state_dict shapes are read.
    for _cname in ("detectron2._C", "tensormask._C"):
        if _cname not in sys.modules:
            _cm = types.ModuleType(_cname)
            _cm._d2tpu_stub = True
            sys.modules[_cname] = _cm

    om = mod("omegaconf")

    import re as _re

    _INTERP = _re.compile(r"^\$\{([^}]+)\}$")

    class DictConfig(dict):
        """dict with attribute access, parent-tracked ``${..path}``
        interpolation resolution, and the _metadata hook the reference's
        instantiate() checks for dataclass-backed structured configs."""

        def __init__(self, content=None, flags=None, parent=None):
            super().__init__()
            self.__dict__["_metadata"] = types.SimpleNamespace(object_type=None)
            self.__dict__["_parent"] = None
            for k, v in (content or {}).items():
                self[k] = v

        # -- parent/interpolation machinery -------------------------------
        def __setitem__(self, k, v):
            # recursively wrap plain containers (omegaconf auto-conversion):
            # nested dict literals in config files must support attribute
            # access and must parent their children for ${..} resolution
            if type(v) is dict:
                v = DictConfig(v)
            elif type(v) is list:
                v = ListConfig([DictConfig(u) if type(u) is dict else u for u in v])
            super().__setitem__(k, v)
            if isinstance(v, DictConfig):
                v.__dict__["_parent"] = self
            elif isinstance(v, ListConfig):
                # a list IS a level in omegaconf's interpolation tree
                v._parent = self
                for u in v:
                    if isinstance(u, DictConfig):
                        u.__dict__["_parent"] = v

        def update(self, *args, **kwargs):
            # route through __setitem__ so wrapping/parenting still happens
            # (the reference's cascade_rcnn.py mutates via .update())
            for k, v in dict(*args, **kwargs).items():
                self[k] = v

        def _root(self):
            node = self
            while getattr(node, "_parent", None) is not None:
                node = node._parent if isinstance(node, ListConfig) else node.__dict__["_parent"]
            return node

        def _resolve(self, v):
            if isinstance(v, str):
                m = _INTERP.match(v)
                if m:
                    expr = m.group(1)
                    ndots = len(expr) - len(expr.lstrip("."))
                    if ndots == 0:
                        node = self._root()
                    else:
                        node = self
                        for _ in range(ndots - 1):
                            node = node._parent if isinstance(node, ListConfig) else node.__dict__["_parent"]
                    cur = node
                    for part in expr[ndots:].split("."):
                        cur = cur[part]
                    return cur
            return v

        def __getitem__(self, k):
            return self._resolve(super().__getitem__(k))

        def get(self, k, default=None):
            try:
                return self[k]
            except KeyError:
                return default

        def items(self):
            return [(k, self[k]) for k in super().keys()]

        def values(self):
            return [self[k] for k in super().keys()]

        # -- attribute access ----------------------------------------------
        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name)

        def __setattr__(self, name, value):
            self[name] = value

        def __delattr__(self, name):
            try:
                del self[name]
            except KeyError:
                raise AttributeError(name)

        def __deepcopy__(self, memo):
            new = type(self)()
            memo[id(self)] = new
            for k in super().keys():
                new[k] = copy.deepcopy(super().__getitem__(k), memo)
            return new

    class ListConfig(list):
        def __init__(self, content=None, flags=None):
            super().__init__(content or [])

    class OmegaConf:
        @staticmethod
        def create(x=None, flags=None):
            def wrap(v):
                if isinstance(v, DictConfig) or isinstance(v, ListConfig):
                    return v
                if isinstance(v, dict):
                    return DictConfig({k: wrap(u) for k, u in v.items()})
                if isinstance(v, (list, tuple)):
                    return ListConfig([wrap(u) for u in v])
                return v

            return wrap(x if x is not None else {})

        @staticmethod
        def to_container(x, resolve=False, **k):
            def unwrap(v):
                if isinstance(v, dict):
                    return {kk: unwrap(u) for kk, u in v.items()}
                if isinstance(v, (list, tuple)):
                    return [unwrap(u) for u in v]
                return v

            return unwrap(x)

        @staticmethod
        def is_config(x):
            return isinstance(x, (DictConfig, ListConfig))

        @staticmethod
        def select(cfg, key, default=None):
            node = cfg
            for part in key.split("."):
                if not isinstance(node, dict) or part not in node:
                    return default
                node = node[part]
            return node

        @staticmethod
        def update(cfg, key, value, merge=True):
            parts = key.split(".")
            node = cfg
            for part in parts[:-1]:
                if part not in node or not isinstance(node[part], dict):
                    node[part] = DictConfig()
                node = node[part]
            node[parts[-1]] = value

        @staticmethod
        def merge(*cfgs):
            out = DictConfig()

            def _merge(dst, src):
                for k, v in src.items():
                    if isinstance(v, dict) and isinstance(dst.get(k), dict):
                        _merge(dst[k], v)
                    else:
                        dst[k] = v

            for c in cfgs:
                _merge(out, c)
            return out

        @staticmethod
        def to_object(x):
            return OmegaConf.to_container(x)

    om.DictConfig = DictConfig
    om.ListConfig = ListConfig
    om.OmegaConf = OmegaConf
    om.SCMode = types.SimpleNamespace(INSTANTIATE=1, DICT=2)

    # ---- timm (ViT/Swin/MViT backbones import DropPath + Mlp from it)
    import torch.nn as nn

    class DropPath(nn.Module):
        """Stochastic depth; identity in eval / at drop_prob 0 (the only
        modes the oracle exercises)."""

        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

    class Mlp(nn.Module):
        """timm MLP: fc1 -> act -> fc2 (dropout omitted; oracle runs eval)."""

        def __init__(self, in_features, hidden_features=None, out_features=None, act_layer=nn.GELU, drop=0.0, **kw):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    timm = mod("timm")
    timm_models = mod("timm.models")
    timm_layers = mod("timm.models.layers")
    timm.models = timm_models
    timm_models.layers = timm_layers
    timm_layers.DropPath = DropPath
    timm_layers.Mlp = Mlp
    timm_layers.trunc_normal_ = lambda t, std=1.0: nn.init.trunc_normal_(t, std=std)
    timm_layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)

    # pycocotools.coco / .cocoeval: imported (not exercised) by evaluator
    # modules pulled in through package __init__ chains (e.g. densepose)
    pct_coco = mod("pycocotools.coco")
    pct_coco.COCO = object
    pct.coco = pct_coco
    pct_ce = mod("pycocotools.cocoeval")
    pct_ce.COCOeval = object
    pct_ce.maskUtils = pct_mask
    pct.cocoeval = pct_ce

    # av (PyAV): densepose's video data pipeline imports it at package-import
    # time for type aliases only
    av = mod("av")
    av.frame = types.SimpleNamespace(Frame=object)
    av.container = types.SimpleNamespace(Container=object)
    av.video = types.SimpleNamespace(frame=types.SimpleNamespace(VideoFrame=object))
    av.open = lambda *a, **k: (_ for _ in ()).throw(NotImplementedError("av shim"))

    # panopticapi: imported by panoptic dataset mappers for rgb2id only
    papi = mod("panopticapi")
    papi_utils = mod("panopticapi.utils")
    papi_utils.rgb2id = lambda c: c[:, :, 0] + 256 * c[:, :, 1] + 256 * 256 * c[:, :, 2]
    papi_utils.id2rgb = lambda i: i  # not exercised
    papi.utils = papi_utils

    # cv2/psutil/pydoc are real; nothing else needed.
