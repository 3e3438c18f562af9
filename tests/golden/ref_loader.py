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
    return cfg
