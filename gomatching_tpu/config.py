"""Configuration system.

A small, dependency-free re-implementation of the yacs ``CfgNode`` surface that the
reference stack uses (detectron2 ``get_cfg`` + ``add_deepsolo_cfg`` at
third_party/adet/config/config.py:15 + ``add_gom_config`` at gomatching/config.py:3),
so the reference's YAML files under ``configs/`` parse unchanged.

Only the keys the GoMatching stack actually reads are modeled; unknown keys in a YAML
raise, matching yacs' strictness.
"""

from __future__ import annotations

import copy
from typing import Any, List

import yaml


class CfgNode(dict):
    """A dict with attribute access, deep merge from YAML, and freeze support."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None):
        init_dict = {} if init_dict is None else init_dict
        super().__init__()
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        for k, v in init_dict.items():
            self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute protocol ------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"Config key not found: {name}")

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(f"Attempted to set {name} on an immutable CfgNode")
        self[name] = CfgNode(value) if isinstance(value, dict) and not isinstance(value, CfgNode) else value

    def __setitem__(self, name, value):
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(f"Attempted to set {name} on an immutable CfgNode")
        super().__setitem__(name, value)

    # -- lifecycle ---------------------------------------------------------
    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def __deepcopy__(self, memo):
        out = CfgNode()
        for k, v in self.items():
            out[k] = copy.deepcopy(v, memo)
        return out

    def freeze(self) -> None:
        object.__setattr__(self, CfgNode.IMMUTABLE, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self) -> None:
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, CfgNode.IMMUTABLE)

    # -- merging -----------------------------------------------------------
    def _merge_dict(self, other: dict, path: str = "") -> None:
        for k, v in other.items():
            full = f"{path}.{k}" if path else k
            if k not in self:
                raise KeyError(f"Unknown config key: {full}")
            cur = self[k]
            if isinstance(cur, CfgNode):
                if not isinstance(v, dict):
                    raise TypeError(f"Cannot overwrite config subtree {full} with a scalar")
                cur._merge_dict(v, full)
            else:
                self[k] = _coerce(v, cur, full)

    def merge_from_file(self, cfg_file: str) -> None:
        with open(cfg_file, "r") as f:
            loaded = yaml.safe_load(f)
        if loaded:
            base = loaded.pop("_BASE_", None)
            if base is not None:
                import os

                self.merge_from_file(os.path.join(os.path.dirname(cfg_file), base))
            self._merge_dict(loaded)

    def merge_from_list(self, opts: List[Any]) -> None:
        assert len(opts) % 2 == 0, f"Override list has odd length: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Unknown config key: {key}")
            if isinstance(value, str):
                value = yaml.safe_load(value)
            node[leaf] = _coerce(value, node[leaf], key)

    def dump(self) -> str:
        def plain(n):
            return {k: plain(v) if isinstance(v, CfgNode) else v for k, v in n.items()}

        return yaml.safe_dump(plain(self), sort_keys=False)


def _coerce(value: Any, old: Any, key: str) -> Any:
    """Light type reconciliation mirroring yacs (list<->tuple, int->float).

    Like yacs, strings that parse as python literals (e.g. the tuple syntax
    ``("icdar15_train",)`` used in the reference YAMLs) are literal-eval'd first.
    """
    if isinstance(value, str):
        import ast

        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
    if old is None or value is None:
        return value
    if isinstance(old, tuple) and isinstance(value, list):
        return tuple(value)
    if isinstance(old, list) and isinstance(value, tuple):
        return list(value)
    if isinstance(old, float) and isinstance(value, int):
        return float(value)
    if isinstance(old, bool) != isinstance(value, bool) and (
        isinstance(old, bool) or isinstance(value, bool)
    ):
        raise TypeError(f"Type mismatch for {key}: {type(old)} vs {type(value)}")
    return value


# ---------------------------------------------------------------------------
# Defaults. The union of the detectron2 base keys the stack touches, the
# DeepSolo additions (third_party/adet/config/config.py:15-131) and the
# GoMatching additions (gomatching/config.py:3-81).
# ---------------------------------------------------------------------------


def get_cfg() -> CfgNode:
    c = CfgNode()

    c.VERSION = 2
    c.OUTPUT_DIR = "./output"
    c.SEED = -1
    c.CUDNN_BENCHMARK = False
    c.VIS_PERIOD = 0

    # ---- MODEL -----------------------------------------------------------
    c.MODEL = CfgNode()
    c.MODEL.DEVICE = "tpu"
    c.MODEL.META_ARCHITECTURE = "GoMatching"
    c.MODEL.WEIGHTS = ""
    c.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
    c.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]
    c.MODEL.MASK_ON = False
    c.MODEL.KEYPOINT_ON = False
    c.MODEL.LOAD_PROPOSALS = False
    # compute dtype for the frozen spotter ("float32" | "bfloat16"); TPU-native knob
    c.MODEL.PRECISION = "float32"

    c.MODEL.BACKBONE = CfgNode()
    c.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    c.MODEL.BACKBONE.FREEZE_AT = 2

    c.MODEL.RESNETS = CfgNode()
    c.MODEL.RESNETS.DEPTH = 50
    c.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    c.MODEL.RESNETS.NUM_GROUPS = 1
    c.MODEL.RESNETS.NORM = "FrozenBN"
    c.MODEL.RESNETS.WIDTH_PER_GROUP = 64
    c.MODEL.RESNETS.STRIDE_IN_1X1 = True
    c.MODEL.RESNETS.RES5_DILATION = 1
    c.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
    c.MODEL.RESNETS.STEM_OUT_CHANNELS = 64
    c.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [False, False, False, False]
    c.MODEL.RESNETS.DEFORM_MODULATED = False
    c.MODEL.RESNETS.DEFORM_NUM_GROUPS = 1
    c.MODEL.RESNETS.DEFORM_INTERVAL = 1

    c.MODEL.ROI_HEADS = CfgNode()
    c.MODEL.ROI_HEADS.NAME = "LSTMatcher"
    c.MODEL.ROI_HEADS.NUM_CLASSES = 1
    c.MODEL.ROI_HEADS.IOU_THRESHOLDS = [0.5]
    c.MODEL.ROI_HEADS.IOU_LABELS = [0, 1]
    c.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT = False
    c.MODEL.ROI_HEADS.WITH_RESR = True

    c.MODEL.ROI_BOX_HEAD = CfgNode()
    c.MODEL.ROI_BOX_HEAD.USE_SIGMOID_CE = False
    c.MODEL.ROI_BOX_HEAD.PRIOR_PROB = 0.01
    c.MODEL.ROI_BOX_HEAD.MULT_PROPOSAL_SCORE = False

    # association head (gomatching/config.py:7-27)
    c.MODEL.ASSO_ON = False
    c.MODEL.ASSO_HEAD = CfgNode()
    c.MODEL.ASSO_HEAD.FC_DIM = 1024
    c.MODEL.ASSO_HEAD.NUM_FC = 2
    c.MODEL.ASSO_HEAD.NUM_ENCODER_LAYERS = 1
    c.MODEL.ASSO_HEAD.NUM_DECODER_LAYERS = 1
    c.MODEL.ASSO_HEAD.NUM_WEIGHT_LAYERS = 2
    c.MODEL.ASSO_HEAD.NUM_HEADS = 8
    c.MODEL.ASSO_HEAD.DROPOUT = 0.1
    c.MODEL.ASSO_HEAD.NORM = False
    c.MODEL.ASSO_HEAD.ASSO_THRESH = 0.1
    c.MODEL.ASSO_HEAD.ASSO_WEIGHT = 1.0
    c.MODEL.ASSO_HEAD.NEG_UNMATCHED = False
    c.MODEL.ASSO_HEAD.NO_DECODER_SELF_ATT = True
    c.MODEL.ASSO_HEAD.NO_ENCODER_SELF_ATT = False
    c.MODEL.ASSO_HEAD.WITH_TEMP_EMB = False
    c.MODEL.ASSO_HEAD.NO_POS_EMB = False
    c.MODEL.ASSO_HEAD.ASSO_THRESH_TEST = -1.0
    c.MODEL.ASSO_HEAD.CTRS_WEIGHT = 1.0
    c.MODEL.ASSO_HEAD.ASSO_WEIGHT_LOCAL = 1.0

    # Swin (gomatching/config.py:29-32 + adet config.py:64-66)
    c.MODEL.SWIN = CfgNode()
    c.MODEL.SWIN.SIZE = "B"
    c.MODEL.SWIN.USE_CHECKPOINT = False
    c.MODEL.SWIN.OUT_FEATURES = (1, 2, 3)
    c.MODEL.SWIN.TYPE = "tiny"
    c.MODEL.SWIN.DROP_PATH_RATE = 0.2

    c.MODEL.ViTAEv2 = CfgNode()
    c.MODEL.ViTAEv2.TYPE = "vitaev2_s"
    c.MODEL.ViTAEv2.DROP_PATH_RATE = 0.2

    c.MODEL.FREEZE_TYPE = ""
    c.MODEL.MOBILENET = False

    # (Deformable) transformer options (adet config.py:78-114)
    t = CfgNode()
    t.ENABLED = False
    t.INFERENCE_TH_TRAIN = 0.3
    t.INFERENCE_TH_TEST = 0.4
    t.AUX_LOSS = True
    t.ENC_LAYERS = 6
    t.DEC_LAYERS = 6
    t.DIM_FEEDFORWARD = 1024
    t.HIDDEN_DIM = 256
    t.DROPOUT = 0.0
    t.NHEADS = 8
    t.NUM_QUERIES = 100
    t.ENC_N_POINTS = 4
    t.DEC_N_POINTS = 4
    t.POSITION_EMBEDDING_SCALE = 6.283185307179586
    t.NUM_FEATURE_LEVELS = 4
    t.VOC_SIZE = 37
    t.CUSTOM_DICT = ""
    t.NUM_POINTS = 25
    t.TEMPERATURE = 10000
    t.BOUNDARY_HEAD = True
    t.LOSS = CfgNode()
    t.LOSS.AUX_LOSS = True
    t.LOSS.FOCAL_ALPHA = 0.25
    t.LOSS.FOCAL_GAMMA = 2.0
    t.LOSS.BEZIER_CLASS_WEIGHT = 1.0
    t.LOSS.BEZIER_COORD_WEIGHT = 1.0
    t.LOSS.BEZIER_SAMPLE_POINTS = 25
    t.LOSS.POINT_CLASS_WEIGHT = 1.0
    t.LOSS.POINT_COORD_WEIGHT = 1.0
    t.LOSS.POINT_TEXT_WEIGHT = 0.5
    t.LOSS.BOUNDARY_WEIGHT = 0.5
    c.MODEL.TRANSFORMER = t

    # ---- INPUT -----------------------------------------------------------
    c.INPUT = CfgNode()
    c.INPUT.FORMAT = "BGR"
    c.INPUT.MIN_SIZE_TRAIN = (800,)
    c.INPUT.MAX_SIZE_TRAIN = 1333
    c.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
    c.INPUT.MIN_SIZE_TEST = 800
    c.INPUT.MAX_SIZE_TEST = 1333
    c.INPUT.MASK_FORMAT = "polygon"
    c.INPUT.HFLIP_TRAIN = False
    c.INPUT.ROTATE = True
    c.INPUT.CROP = CfgNode()
    c.INPUT.CROP.ENABLED = False
    c.INPUT.CROP.TYPE = "relative_range"
    c.INPUT.CROP.SIZE = [0.9, 0.9]
    c.INPUT.CROP.CROP_INSTANCE = True
    c.INPUT.CUSTOM_AUG = ""
    c.INPUT.TRAIN_SIZE = 640
    c.INPUT.TRAIN_H = -1
    c.INPUT.TRAIN_W = -1
    c.INPUT.TEST_SIZE = 640
    c.INPUT.TEST_H = -1
    c.INPUT.TEST_W = -1
    c.INPUT.SCALE_RANGE = (0.1, 2.0)
    c.INPUT.TEST_INPUT_TYPE = "default"
    c.INPUT.NOT_CLAMP_BOX = False
    c.INPUT.VIDEO = CfgNode()
    c.INPUT.VIDEO.TRAIN_LEN = 8
    c.INPUT.VIDEO.TEST_LEN = 16
    c.INPUT.VIDEO.SAMPLE_RANGE = 2.0
    c.INPUT.VIDEO.DYNAMIC_SCALE = True
    c.INPUT.VIDEO.GEN_IMAGE_MOTION = True

    # ---- DATASETS / DATALOADER -------------------------------------------
    c.DATASETS = CfgNode()
    c.DATASETS.TRAIN = ()
    c.DATASETS.TEST = ()
    c.DATALOADER = CfgNode()
    c.DATALOADER.NUM_WORKERS = 4
    c.DATALOADER.SAMPLER_TRAIN = "TrainingSampler"
    c.DATALOADER.REPEAT_THRESHOLD = 0.0
    c.DATALOADER.FILTER_EMPTY_ANNOTATIONS = True
    c.DATALOADER.SOURCE_AWARE = False
    c.DATALOADER.DATASET_RATIO = [1, 1]

    # ---- SOLVER ----------------------------------------------------------
    s = CfgNode()
    s.MAX_ITER = 40000
    s.BASE_LR = 0.001
    s.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
    s.MOMENTUM = 0.9
    s.NESTEROV = False
    s.WEIGHT_DECAY = 0.0001
    s.WEIGHT_DECAY_NORM = 0.0
    s.WEIGHT_DECAY_BIAS = 0.0001
    s.GAMMA = 0.1
    s.STEPS = (30000,)
    s.WARMUP_FACTOR = 1.0 / 1000
    s.WARMUP_ITERS = 1000
    s.WARMUP_METHOD = "linear"
    s.CHECKPOINT_PERIOD = 5000
    s.IMS_PER_BATCH = 16
    s.REFERENCE_WORLD_SIZE = 0
    s.BIAS_LR_FACTOR = 1.0
    s.RESET_ITER = False
    s.TRAIN_ITER = -1
    s.USE_CUSTOM_SOLVER = False
    s.OPTIMIZER = "SGD"
    s.BACKBONE_MULTIPLIER = 1.0
    s.CUSTOM_MULTIPLIER = 1.0
    s.CUSTOM_MULTIPLIER_NAME = []
    s.CLIP_GRADIENTS = CfgNode()
    s.CLIP_GRADIENTS.ENABLED = False
    s.CLIP_GRADIENTS.CLIP_TYPE = "value"
    s.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    s.CLIP_GRADIENTS.NORM_TYPE = 2.0
    c.SOLVER = s

    # ---- TEST / VIDEO ----------------------------------------------------
    c.TEST = CfgNode()
    c.TEST.EVAL_PERIOD = 0
    c.TEST.DETECTIONS_PER_IMAGE = 100
    c.TEST.LEXICON_TYPE = 1

    c.VIDEO_INPUT = False
    v = CfgNode()
    v.OVERLAP_THRESH = 0.1
    v.NOT_MULT_THRESH = False
    v.MIN_TRACK_LEN = 5
    v.MAX_CENTER_DIST = -1.0
    v.DECAY_TIME = -1.0
    v.WITH_IOU = False
    v.LOCAL_TRACK = False
    v.LOCAL_IOU_ONLY = False
    v.LOCAL_NO_IOU = False
    v.NMS_THRESH = 0.5
    c.VIDEO_TEST = v

    c.VIS_THRESH = 0.3
    c.NOT_EVAL = False
    c.FIND_UNUSED_PARAM = True

    # ---- TPU runtime (new; no reference analogue) ------------------------
    r = CfgNode()
    r.MESH_DATA = -1  # -1: all devices on the data axis
    r.MESH_MODEL = 1
    # frames spotted per device step during video inference: 3 amortizes the
    # per-call RPC overheads best with the round-3 kernels (7.05 vs 6.57 fps
    # at 2); >=4 faults the tunneled worker (docs/PERF_NOTES.md)
    r.SPOT_BATCH = 3
    # SPOT_BATCH-sized batches folded into ONE device dispatch (lax.map) during
    # video inference: each RPC through the tunneled TPU costs ~30-40 ms fixed,
    # so per-batch dispatch taxes a window by #batches round trips; the map
    # keeps the per-step compute shape at SPOT_BATCH (>= 4 faults the worker)
    r.SPOT_SUPER = 2
    r.MAX_INST = 100  # static per-frame instance capacity after thresholding
    # video inference meta-fetch compaction: per frame, ship only the top-K
    # packed metadata rows (valid slots first, stable in slot order, plus
    # their original slot ids) instead of all NUM_QUERIES rows — typically
    # ~20 slots/frame survive the threshold, so most of the ~1.7 MB/24-frame
    # meta fetch is never read. Exact: if any frame has more than K valid
    # slots the predictor falls back to the full fetch for the window, and
    # otherwise the reconstructed rows are the same f32 values (invalid
    # rows are zeros, which no consumer reads). 0 disables.
    r.META_TOPK = 48
    r.MAX_GT = 60  # static per-image GT capacity for pretraining targets
    r.PAD_TO = 32  # frame padding multiple for static feature shapes
    # deformable-attention sampling implementation: 'vmem' (fused VMEM
    # outer-product Pallas kernels — encoder tiled-footprint + decoder
    # full-level one-hot, exact within TILED_HALO for the encoder and exact
    # everywhere else; the production inference default, see
    # ops/deform_attn_vmem.py + ops/deform_attn_dec_vmem.py), 'tiled' (XLA
    # one-hot MXU encoder path, same exactness contract, differentiable —
    # training paths force this, ops/deform_attn_tiled.py), 'xla'
    # (gather-based, exact, works everywhere), or 'pallas' (VMEM-gather
    # kernel; ops/deform_attn_pallas.py)
    r.SAMPLING_IMPL = "vmem"
    # sampler for paths that differentiate THROUGH the spotter (image/video
    # pretraining). '' (default) derives from SAMPLING_IMPL: 'xla'/'tiled'/
    # 'vmem' are honored as-is and the non-differentiable 'pallas' maps to
    # 'tiled'. The production default therefore trains through the fused
    # vmem kernels' custom VJPs (ops/deform_attn_{vmem,dec_vmem}.py; grad
    # parity in tests/test_deform_attn_grads.py), measured 1.17x faster than
    # 'tiled' at training shapes on the real TPU (tools/bench_train.py
    # --pretrain --impl both; PERF_NOTES round 5).
    r.TRAIN_SAMPLING_IMPL = ""
    # max |sampling offset| (target-level cells) resolved exactly by the
    # tiled/vmem encoder samplers; size it with tools/certify_halo.py
    # (ops.deform_attn_tiled.deform_attn_dropped_mass). The init scheme caps
    # offsets at 4 cells (P * unit radial); a 300-iter synthetic pretrain
    # (tools/synthetic_pretrain.py) learns offsets to ~4.2 cells with ZERO
    # dropped attention mass at halo>=4 — 5 keeps a margin. Raise it (or use
    # 'xla') if certify_halo flags a converted checkpoint.
    r.TILED_HALO = 5
    # vmem encoder footprint x-origin alignment (cells). The footprint width
    # rounds up to a multiple of max(this, 8) — Mosaic requires the window's
    # second-minor dim be 8-aligned — so blocks < 8 only loosen the x-origin
    # grid (rarely shrinking Fw) while weakening the window-start alignment
    # hints; measured on-par-or-slower than 8 on v5e. Sweep on the target
    # hardware (tools/bench_vmem_v2.py --block).
    r.ENC_BLOCK = 8
    # decoder hybrid: route this many FINEST levels of the decoder's vmem
    # cross-attention through the gather core instead of the full-level
    # one-hot kernel (exact linear split; level 0 is ~75% of the one-hot G
    # build's token mass while decoder gathers are tiny). 0 = all fused.
    r.DEC_GATHER_LEVELS = 0
    # host->device frame wire format for video inference: 'rgb' ships raw
    # uint8 frames (bit-exact reference parity), 'yuv420' ships planar I420
    # (half the bytes; video sources are 4:2:0 at origin, and the device-side
    # decode matches cv2's own I420 roundtrip — see data/preprocess.py
    # encode_i420/decode_i420). Use yuv420 when the host link is the e2e
    # bottleneck (e.g. a tunneled TPU at ~35 MB/s). Falls back to rgb for
    # odd frame dimensions.
    r.UPLOAD_FORMAT = "rgb"
    # indexed association: keep the per-window reid embeddings resident on
    # device as a row pool and ship the tracker's matcher requests as row
    # INDICES (a few KB) instead of re-uploading (B, Npad, 1024) f32 feature
    # tensors the device just produced (~3-4 MB per long-match round at the
    # tunnel's ~35 MB/s), and skip the host reid fetch entirely. Bit-identical
    # logits (the gathered rows are the same f32 values); disabled
    # automatically under a mesh (sharded inference keeps the fetch path).
    r.ASSOC_INDEXED = True
    # association matcher compute precision: '' follows MODEL.PRECISION,
    # or set 'float32'/'bfloat16' explicitly. The short/long matcher pass is
    # COMPUTE-bound (d=1024 enc+dec matmuls dominate the measured
    # short_match/long_match wall, not the RPC), so bf16 roughly halves it
    # on the MXU. Applies only to the matcher transformers + affinity heads
    # (reid/rescore stay f32: gomatching.py spot path casts reid inputs to
    # f32 explicitly) and only with ASSO_HEAD.NO_POS_EMB=True (all shipped
    # YAMLs; the interpolated pos-emb path would silently promote back to
    # f32). Affinity logits return as f32; drift is bf16-eps on the
    # activation scores (tests/test_production_parity.py bounds the e2e id
    # consistency for the production bf16 configuration).
    r.ASSOC_PRECISION = ""
    # cross-window pipelining in process_video: 0 = strict spot-then-track;
    # 1 = overlap the next window's encode + host->device wire with the
    # current window's fetch + tracking (safe: compute ordering unchanged);
    # 2 = also dispatch the next window's compute ahead of tracking (keeps
    # the device busy through the tracker phase; the tracker's batched
    # association calls then wait behind it — measure per deployment).
    r.PIPELINE_WINDOWS = 1
    # host->device frame wire format for TRAINING (train_net.py loops):
    # True ships clips as raw uint8 (4x fewer tunnel bytes) and normalizes
    # in-graph — the reference's own order (gom_lstmatcher.py:159-169
    # normalizes per-image on device, then ImageList.from_tensors zero-pads),
    # with the canvas padding re-zeroed from image_hw so numerics match the
    # host normalize-then-pad path exactly. False keeps the host-side f32
    # normalize (bit-identical when source pixels are integral either way).
    r.TRAIN_UPLOAD_UINT8 = True
    # training clip wire format: 'rgb' ships raw uint8 (reference-parity
    # numerics), 'yuv420' ships planar I420 (half the bytes; same codec and
    # error bound as UPLOAD_FORMAT=yuv420 — the sources are 4:2:0 at origin).
    # Needs TRAIN_UPLOAD_UINT8 and even frame dims; falls back to rgb
    # otherwise. Production-throughput knob: with double-buffered uploads
    # the training step is upload-bound, and halving the wire bytes moves it
    # to compute-bound (PERF_NOTES round 5).
    r.TRAIN_UPLOAD_FORMAT = "rgb"
    # double-buffered training uploads: decode + dispatch clip i+1's
    # host->device transfer while the device runs step i, and defer the
    # metrics fetch by one iteration (engine/train.py step_begin/step_finish).
    # Numerics identical to the sequential loop — only dispatch order changes.
    r.TRAIN_OVERLAP_UPLOAD = True
    c.TPU = r

    return c


def add_deepsolo_cfg(cfg: CfgNode) -> None:
    """Parity shim: defaults already include the DeepSolo keys."""
    return None


def add_gom_config(cfg: CfgNode) -> None:
    """Parity shim: defaults already include the GoMatching keys."""
    return None


def setup_train_cfg(config_file: str, opts: List[Any] | None = None) -> CfgNode:
    """Mirror of train_net.py:158-172: merge + derived TH_TEST:=TH_TRAIN."""
    cfg = get_cfg()
    cfg.merge_from_file(config_file)
    if opts:
        cfg.merge_from_list(list(opts))
    cfg.MODEL.TRANSFORMER.INFERENCE_TH_TEST = cfg.MODEL.TRANSFORMER.INFERENCE_TH_TRAIN
    cfg.freeze()
    return cfg


def setup_eval_cfg(config_file: str, opts: List[Any] | None = None) -> CfgNode:
    """Mirror of eval.py:212-222: merge + derived ASSO_THRESH_TEST:=INFERENCE_TH_TEST."""
    cfg = get_cfg()
    cfg.merge_from_file(config_file)
    if opts:
        cfg.merge_from_list(list(opts))
    cfg.MODEL.ASSO_HEAD.ASSO_THRESH_TEST = cfg.MODEL.TRANSFORMER.INFERENCE_TH_TEST
    cfg.freeze()
    return cfg
