"""Import machinery to run the PyTorch reference (/root/reference) on CPU.

The reference's package ``__init__`` chains pull in detectron2 and the compiled
CUDA extension ``adet._C`` — neither exists here. This loader pre-seeds
``sys.modules`` with skeleton packages whose ``__path__`` points at the real
source tree, so individual reference *modules* import and execute verbatim
while the heavyweight package initializers are bypassed:

  - ``adet`` / ``adet.modeling`` / ``adet.modeling.model`` become path-only
    skeletons (their real ``__init__``s import detectron2 meta-archs).
  - ``adet._C`` (csrc/vision.cpp:52-55) is replaced by the reference's own
    CPU oracle ``ms_deform_attn_core_pytorch`` (ms_deform_attn.py:40-60) —
    upstream Deformable-DETR's documented numerical spec for the kernel.
  - ``torchvision.ops.boxes.box_area`` (the only torchvision symbol the
    needed modules use, adet/utils/misc.py:4) gets a 3-line equivalent.

Only used by the one-shot golden dump scripts in this directory; the tests
themselves read the committed .npz files and never import torch-reference code.
"""

from __future__ import annotations

import sys
import types

REF = "/root/reference"
REF_TP = f"{REF}/third_party"


def _skeleton(name: str, path: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    sys.modules[name] = mod
    return mod


def load_reference_adet():
    """Make ``adet.layers.*`` / ``adet.modeling.model.*`` importable; returns the
    ``adet`` skeleton (with ``_C`` CPU-stubbed)."""
    if "adet" in sys.modules:
        return sys.modules["adet"]
    if REF_TP not in sys.path:
        sys.path.insert(0, REF_TP)

    import torch

    # torchvision stub (adet/utils/misc.py:4 imports box_area only)
    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_boxes = types.ModuleType("torchvision.ops.boxes")

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    tv_boxes.box_area = box_area
    tv_ops.boxes = tv_boxes
    tv.ops = tv_ops
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tv_ops)
    sys.modules.setdefault("torchvision.ops.boxes", tv_boxes)

    adet = _skeleton("adet", f"{REF_TP}/adet")
    _skeleton("adet.modeling", f"{REF_TP}/adet/modeling")
    _skeleton("adet.modeling.model", f"{REF_TP}/adet/modeling/model")
    adet._C = types.SimpleNamespace()

    import adet.layers.ms_deform_attn as mda  # noqa: E402 (needs skeletons)

    def ms_deform_attn_forward(value, shapes, level_start_index, loc, attn, step):
        shape_list = [(int(h), int(w)) for h, w in shapes.tolist()]
        return mda.ms_deform_attn_core_pytorch(value, shape_list, loc, attn)

    adet._C.ms_deform_attn_forward = ms_deform_attn_forward
    return adet


def load_reference_gomatching_roi_modules():
    """Import the reference tracker modules that need a detectron2 façade:
    ``gomatching.modeling.roi_heads.{transformer,association_head}``.

    detectron2.layers.Linear IS nn.Linear in d2 (a legacy alias); ShapeSpec is
    a plain namedtuple-style record; fvcore's c2 init fillers only affect
    *initial* values, which the golden dumps overwrite — so trivial stand-ins
    preserve the reference's runtime math exactly.
    """
    load_reference_adet()
    import torch
    from torch import nn

    if "detectron2" not in sys.modules:
        d2 = types.ModuleType("detectron2")
        d2_layers = types.ModuleType("detectron2.layers")
        d2_layers.Linear = nn.Linear

        class ShapeSpec:
            def __init__(self, channels=None, height=None, width=None, stride=None):
                self.channels, self.height = channels, height
                self.width, self.stride = width, stride

        d2_layers.ShapeSpec = ShapeSpec
        d2.layers = d2_layers
        sys.modules["detectron2"] = d2
        sys.modules["detectron2.layers"] = d2_layers

    if "fvcore" not in sys.modules:
        fv = types.ModuleType("fvcore")
        fv_nn = types.ModuleType("fvcore.nn")
        fv_wi = types.ModuleType("fvcore.nn.weight_init")

        def c2_xavier_fill(module):  # caffe2 XavierFill == kaiming_uniform fan_in
            nn.init.kaiming_uniform_(module.weight, a=1)
            if module.bias is not None:
                nn.init.constant_(module.bias, 0)

        def c2_msra_fill(module):
            nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
            if module.bias is not None:
                nn.init.constant_(module.bias, 0)

        fv_wi.c2_xavier_fill = c2_xavier_fill
        fv_wi.c2_msra_fill = c2_msra_fill
        fv_nn.weight_init = fv_wi
        fv.nn = fv_nn
        sys.modules["fvcore"] = fv
        sys.modules["fvcore.nn"] = fv_nn
        sys.modules["fvcore.nn.weight_init"] = fv_wi

    _skeleton("gomatching", f"{REF}/gomatching")
    _skeleton("gomatching.modeling", f"{REF}/gomatching/modeling")
    _skeleton("gomatching.modeling.roi_heads", f"{REF}/gomatching/modeling/roi_heads")

    import gomatching.modeling.roi_heads.association_head as association_head
    import gomatching.modeling.roi_heads.transformer as transformer

    return transformer, association_head


def load_reference_gom_meta():
    """Import the reference ``GoMatching`` meta-arch and ``LSTMatcher`` roi-head
    with a faithful minimal detectron2 façade.

    The façade implements only the small runtime *data structures* the tracker
    methods touch — Instances / Boxes / pairwise_iou / nms, straight from their
    documented semantics — plus inert import-time names (registries, the
    ``@configurable`` decorator, builder functions). All tracking *logic*
    (detection fusion, short/long-term matching, id bookkeeping) runs from the
    reference source verbatim; the harness constructs the objects via
    ``__new__`` + ``_init_asso_head`` so no backbone is ever built.

    Returns (gom_lstmatcher_module, lstmatcher_module, d2_structures_namespace).
    """
    load_reference_gomatching_roi_modules()
    import torch
    from torch import nn

    d2 = sys.modules["detectron2"]

    class Boxes:
        def __init__(self, tensor):
            self.tensor = tensor

        def __len__(self):
            return self.tensor.shape[0]

        def __getitem__(self, item):
            return Boxes(self.tensor[item])

        def clone(self):
            return Boxes(self.tensor.clone())

        def area(self):
            t = self.tensor
            return (t[:, 2] - t[:, 0]) * (t[:, 3] - t[:, 1])

        @property
        def device(self):
            return self.tensor.device

    def pairwise_iou(boxes1, boxes2):
        area1, area2 = boxes1.area(), boxes2.area()
        lt = torch.max(boxes1.tensor[:, None, :2], boxes2.tensor[None, :, :2])
        rb = torch.min(boxes1.tensor[:, None, 2:], boxes2.tensor[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        union = area1[:, None] + area2[None, :] - inter
        return torch.where(inter > 0, inter / union, torch.zeros_like(inter))

    class Instances:
        def __init__(self, image_size, **kwargs):
            self._image_size = tuple(image_size)
            self._fields = {}
            for k, v in kwargs.items():
                self.set(k, v)

        @property
        def image_size(self):
            return self._image_size

        def __setattr__(self, name, val):
            if name.startswith("_"):
                super().__setattr__(name, val)
            else:
                self.set(name, val)

        def __getattr__(self, name):
            if name == "_fields" or name not in self._fields:
                raise AttributeError(name)
            return self._fields[name]

        def set(self, name, value):
            self._fields[name] = value

        def has(self, name):
            return name in self._fields

        def remove(self, name):
            del self._fields[name]

        def get(self, name):
            return self._fields[name]

        def __len__(self):
            for v in self._fields.values():
                return len(v)
            return 0

        def __getitem__(self, item):
            ret = Instances(self._image_size)
            for k, v in self._fields.items():
                if isinstance(v, list):
                    if isinstance(item, torch.Tensor) and item.dtype == torch.bool:
                        ret.set(k, [x for x, m in zip(v, item.tolist()) if m])
                    else:
                        ret.set(k, [v[i] for i in item])
                else:
                    ret.set(k, v[item])
            return ret

    def nms(boxes, scores, iou_threshold):
        """torchvision.ops.nms semantics: greedy by descending score."""
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i.item())
            if order.numel() == 1:
                break
            ious = pairwise_iou(Boxes(boxes[i : i + 1]), Boxes(boxes[order[1:]]))[0]
            order = order[1:][ious <= iou_threshold]
        return torch.as_tensor(keep, dtype=torch.int64)

    class _Registry:
        def register(self, obj=None):
            if obj is None:
                return lambda o: o
            return obj

        def get(self, name):
            raise KeyError(name)

    def configurable(init_func=None, *, from_config=None):
        if init_func is not None:
            return init_func
        return lambda f: f

    class ImageList:
        pass

    # structures / config / modeling / data / layers / utils facades
    d2_structures = types.ModuleType("detectron2.structures")
    d2_structures.Boxes = Boxes
    d2_structures.pairwise_iou = pairwise_iou
    d2_structures.Instances = Instances
    d2_structures.ImageList = ImageList
    d2_config = types.ModuleType("detectron2.config")
    d2_config.configurable = configurable
    d2_modeling = types.ModuleType("detectron2.modeling")
    d2_modeling.build_backbone = lambda *a, **k: None
    d2_modeling.build_roi_heads = lambda *a, **k: None
    d2_mm_build = types.ModuleType("detectron2.modeling.meta_arch.build")
    d2_mm_build.META_ARCH_REGISTRY = _Registry()
    d2_mm = types.ModuleType("detectron2.modeling.meta_arch")
    d2_mm.build = d2_mm_build
    d2_roi = types.ModuleType("detectron2.modeling.roi_heads.roi_heads")
    d2_roi.ROI_HEADS_REGISTRY = _Registry()

    class ROIHeads(nn.Module):
        def __init__(self, **kwargs):
            super().__init__()

    d2_roi.ROIHeads = ROIHeads
    d2_roi_pkg = types.ModuleType("detectron2.modeling.roi_heads")
    d2_roi_pkg.roi_heads = d2_roi
    d2_pg_utils = types.ModuleType("detectron2.modeling.proposal_generator.proposal_utils")
    d2_pg_utils.add_ground_truth_to_proposals = lambda *a, **k: None
    d2_pg = types.ModuleType("detectron2.modeling.proposal_generator")
    d2_pg.proposal_utils = d2_pg_utils
    d2_matcher = types.ModuleType("detectron2.modeling.matcher")

    class Matcher:
        def __init__(self, *a, **k):
            pass

    d2_matcher.Matcher = Matcher
    d2_sampling = types.ModuleType("detectron2.modeling.sampling")
    d2_sampling.subsample_labels = lambda *a, **k: None
    d2_events = types.ModuleType("detectron2.utils.events")
    d2_events.get_event_storage = lambda: types.SimpleNamespace(
        put_scalar=lambda *a, **k: None
    )
    d2_comm = types.ModuleType("detectron2.utils.comm")
    d2_comm.get_world_size = lambda: 1
    d2_utils = types.ModuleType("detectron2.utils")
    d2_utils.events = d2_events
    d2_utils.comm = d2_comm
    d2_data = types.ModuleType("detectron2.data")

    class _Metadata:
        def get(self, name):
            return types.SimpleNamespace(name=name)

    d2_data.MetadataCatalog = _Metadata()
    sys.modules["detectron2.layers"].nms = nms

    for name, mod in {
        "detectron2.structures": d2_structures,
        "detectron2.config": d2_config,
        "detectron2.modeling": d2_modeling,
        "detectron2.modeling.meta_arch": d2_mm,
        "detectron2.modeling.meta_arch.build": d2_mm_build,
        "detectron2.modeling.roi_heads": d2_roi_pkg,
        "detectron2.modeling.roi_heads.roi_heads": d2_roi,
        "detectron2.modeling.proposal_generator": d2_pg,
        "detectron2.modeling.proposal_generator.proposal_utils": d2_pg_utils,
        "detectron2.modeling.matcher": d2_matcher,
        "detectron2.modeling.sampling": d2_sampling,
        "detectron2.utils": d2_utils,
        "detectron2.utils.events": d2_events,
        "detectron2.utils.comm": d2_comm,
        "detectron2.data": d2_data,
    }.items():
        sys.modules.setdefault(name, mod)
    d2.structures = d2_structures
    d2.config = d2_config
    d2.modeling = d2_modeling
    d2.data = d2_data

    _skeleton("gomatching.modeling.meta_arch", f"{REF}/gomatching/modeling/meta_arch")

    import gomatching.modeling.meta_arch.gom_lstmatcher as gom_lstmatcher
    import gomatching.modeling.roi_heads.lstmatcher as lstmatcher

    return gom_lstmatcher, lstmatcher, d2_structures


def load_reference_backbones():
    """Import the reference Swin / ViTAEv2 backbones with timm + d2-Backbone
    facades (DropPath/to_2tuple/trunc_normal_ and a plain nn.Module base —
    init-only or inert-at-eval helpers; all weights come from dumped
    state_dicts). Returns (swin_transformer_module, vitae_v2_module)."""
    load_reference_gomatching_roi_modules()  # installs the d2/adet skeletons
    import collections.abc

    import torch
    from torch import nn

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")

        def to_2tuple(x):
            if isinstance(x, collections.abc.Iterable):
                return tuple(x)
            return (x, x)

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

        class DropPath(nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob or 0.0

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
                mask.floor_()
                return x.div(keep) * mask

        timm_layers.DropPath = DropPath
        timm_layers.to_2tuple = to_2tuple
        timm_layers.trunc_normal_ = trunc_normal_
        timm_models.layers = timm_layers
        timm.models = timm_models
        sys.modules.update({"timm": timm, "timm.models": timm_models,
                            "timm.models.layers": timm_layers})

    if "detectron2.modeling.backbone" not in sys.modules:
        d2_bb = types.ModuleType("detectron2.modeling.backbone")

        class Backbone(nn.Module):
            def __init__(self):
                super().__init__()

        d2_bb.Backbone = Backbone
        d2_bb_build = types.ModuleType("detectron2.modeling.backbone.build")

        class _Registry:
            def register(self, obj=None):
                if obj is None:
                    return lambda o: o
                return obj

        d2_bb_build.BACKBONE_REGISTRY = _Registry()
        d2_bb.build = d2_bb_build
        sys.modules["detectron2.modeling.backbone"] = d2_bb
        sys.modules["detectron2.modeling.backbone.build"] = d2_bb_build

    _skeleton("adet.modeling.swin", f"{REF_TP}/adet/modeling/swin")
    _skeleton("adet.modeling.vitae_v2", f"{REF_TP}/adet/modeling/vitae_v2")
    import adet.modeling.swin.swin_transformer as swin_mod
    import adet.modeling.vitae_v2.vitae_v2 as vitae_mod

    return swin_mod, vitae_mod


def tiny_cfg():
    """Small-dims config shared by the dump scripts and the JAX-side tests.

    GroupNorm(32, d_model) in the reference input_proj forces d_model % 32 == 0.
    """
    sys.path.insert(0, ".")
    from gomatching_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.DEVICE = "cpu"
    t = cfg.MODEL.TRANSFORMER
    t.HIDDEN_DIM = 64
    t.NHEADS = 4
    t.ENC_LAYERS = 2
    t.DEC_LAYERS = 2
    t.DIM_FEEDFORWARD = 64
    t.NUM_QUERIES = 8
    t.NUM_POINTS = 5
    t.VOC_SIZE = 10
    t.DROPOUT = 0.0
    a = cfg.MODEL.ASSO_HEAD
    a.FC_DIM = 64
    a.NUM_FC = 2
    a.NUM_HEADS = 4
    a.NUM_WEIGHT_LAYERS = 0  # every shipped YAML sets 0
    a.NO_POS_EMB = True  # every shipped YAML sets True
    a.DROPOUT = 0.0
    return cfg
