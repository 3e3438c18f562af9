"""GoMatching meta-architecture: frozen spotter + rescoring + tracker head.

Re-design of ``GoMatching`` (gomatching/modeling/meta_arch/gom_lstmatcher.py:113).
The reference runs inference frame-by-frame with dynamic per-frame instance counts;
here the whole device path is fixed-shape:

  spot_and_detect(images (B,H,W,3)) ->
      per-frame slot arrays over the static nq query axis + a validity mask

covering: backbone -> 2D sine pos enc -> DeepSolo spotter -> rescoring head -> score
fusion max(score, re_score) (gom_lstmatcher.py:595-599) -> threshold -> NMS keep-mask
(gom_lstmatcher.py:316-326) -> reid embedding (lstmatcher.py:280-290). The
sequential track association lives in ``tracking/tracker.py`` on the host; the
padded association transformer runs back on device via ``associate``.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.boxes import nms_mask
from .lst_matcher import LSTMatcherHead
from .pos_encoding import position_encoding_2d
from .resnet import ResNet
from .spotter import DeepSoloSpotter

BACKBONE_CHANNELS = {
    "build_resnet_backbone": (512, 1024, 2048),
    "build_swin_backbone": (192, 384, 768),
    "build_vitaev2_backbone": (128, 256, 512),
}
BACKBONE_STRIDES = (8, 16, 32)


class GoMatchingModel(nn.Module):
    """Backbone + spotter + tracker-head parameter bundle."""

    backbone_name: str = "build_resnet_backbone"
    resnet_depth: int = 50
    hidden_dim: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    num_queries: int = 100
    num_points: int = 25
    voc_size: int = 37
    temperature: float = 10000.0
    boundary_head: bool = True
    # tracker head
    asso_feature_dim: int = 1024
    asso_num_fc: int = 2
    asso_num_heads: int = 8
    asso_num_encoder_layers: int = 1
    asso_num_decoder_layers: int = 1
    asso_num_weight_layers: int = 0
    roi_head_variant: str = "lst"  # "lst" (GoMatching) | "shared" (GoMatching++)
    with_rescore: bool = True
    asso_dropout: float = 0.0
    asso_no_pos_emb: bool = True
    asso_with_temp_emb: bool = False
    swin_type: str = "tiny"
    # inference thresholds
    test_score_threshold: float = 0.3
    nms_thresh: float = 0.5
    # compute dtype for the frozen spotter path
    compute_dtype: str = "float32"
    sampling_impl: str = "xla"
    tiled_halo: int = 8
    enc_block: int = 8
    dec_gather_levels: int = 0

    def setup(self):
        if self.backbone_name == "build_resnet_backbone":
            self.backbone = ResNet(
                depth=self.resnet_depth, out_features=("res3", "res4", "res5"), name="backbone"
            )
        elif self.backbone_name == "build_swin_backbone":
            from .swin import SwinTransformer

            self.backbone = SwinTransformer(
                depths=(2, 2, 18, 2) if self.swin_type == "small" else (2, 2, 6, 2),
                name="backbone",
            )
        elif self.backbone_name == "build_vitaev2_backbone":
            from .vitae import ViTAEv2

            self.backbone = ViTAEv2(name="backbone")
        else:
            raise ValueError(self.backbone_name)
        self.spotter = DeepSoloSpotter(
            d_model=self.hidden_dim,
            n_heads=self.n_heads,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            dim_feedforward=self.dim_feedforward,
            num_feature_levels=self.num_feature_levels,
            enc_n_points=self.enc_n_points,
            dec_n_points=self.dec_n_points,
            num_queries=self.num_queries,
            num_points=self.num_points,
            voc_size=self.voc_size,
            temperature=self.temperature,
            in_channels=BACKBONE_CHANNELS[self.backbone_name],
            boundary_head=self.boundary_head,
            sampling_impl=self.sampling_impl,
            tiled_halo=self.tiled_halo,
            enc_block=self.enc_block,
            dec_gather_levels=self.dec_gather_levels,
            name="detection_transformer",
        )
        self.tracker = LSTMatcherHead(
            hidden_dim=self.hidden_dim,
            num_points=self.num_points,
            feature_dim=self.asso_feature_dim,
            num_fc=self.asso_num_fc,
            num_heads=self.asso_num_heads,
            num_encoder_layers=self.asso_num_encoder_layers,
            num_decoder_layers=self.asso_num_decoder_layers,
            num_weight_layers=self.asso_num_weight_layers,
            variant=self.roi_head_variant,
            with_rescore=self.with_rescore,
            dropout_rate=self.asso_dropout,
            no_pos_emb=self.asso_no_pos_emb,
            with_temp_emb=self.asso_with_temp_emb,
            name="roi_heads",
        )

    # ------------------------------------------------------------------
    def _level_masks(self, pad_hw: Tuple[int, int], image_hw: Optional[jnp.ndarray], batch: int):
        """Padding masks per backbone level (True = padded), mirroring
        MaskedBackbone.mask_out_padding (gom_lstmatcher.py:63-76)."""
        if image_hw is None:
            return None
        masks = []
        for stride in BACKBONE_STRIDES:
            fh = -(-pad_hw[0] // stride)
            fw = -(-pad_hw[1] // stride)
            vh = jnp.ceil(image_hw[:, 0].astype(jnp.float32) / stride)
            vw = jnp.ceil(image_hw[:, 1].astype(jnp.float32) / stride)
            yy = jnp.arange(fh, dtype=jnp.float32)[None, :, None]
            xx = jnp.arange(fw, dtype=jnp.float32)[None, None, :]
            valid = (yy < vh[:, None, None]) & (xx < vw[:, None, None])
            masks.append(~valid)
        return masks

    def spot(self, images: jnp.ndarray, image_hw: Optional[jnp.ndarray] = None):
        """Run backbone + spotter (+ rescoring head) on normalized images (B,H,W,3).

        ``image_hw``: optional (B, 2) true (h, w) per frame before padding; None
        means the full canvas is valid (square test inputs).
        """
        b, H, W, _ = images.shape
        dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        feats = self.backbone(images.astype(dtype))
        feats = [feats["res3"], feats["res4"], feats["res5"]]
        masks = self._level_masks((H, W), image_hw, b)
        pos = [
            position_encoding_2d(
                (b, f.shape[1], f.shape[2]),
                self.hidden_dim // 2,
                self.temperature,
                None if masks is None else masks[i],
            ).astype(dtype)
            for i, f in enumerate(feats)
        ]
        out = self.spotter(feats, pos, masks)
        if self.with_rescore:
            out["re_pred_logits"] = self.tracker.rescore(out["query_features"])
        else:
            out["re_pred_logits"] = None
        return out

    def detect(self, out, image_hw_scale: jnp.ndarray, score_thresh=None):
        """Score fusion + threshold + NMS + reid over the static query axis.

        Parity: GoMatching.detection (gom_lstmatcher.py:579-651) + the NMS/proposal
        packing in inference (:299-332) + reid (lstmatcher.py:271-290).

        ``image_hw_scale``: (B, 2) true (h, w) used to scale normalized points.
        Returns a dict of per-slot arrays + ``valid`` mask.
        """
        logits = out["pred_logits"].astype(jnp.float32)  # (B, nq, npts, 1)
        scores = jax.nn.sigmoid(jnp.mean(logits, axis=2))[..., 0]  # (B, nq)
        if out["re_pred_logits"] is not None:
            re = jax.nn.sigmoid(jnp.mean(out["re_pred_logits"].astype(jnp.float32), axis=2))[..., 0]
            final_scores = jnp.maximum(scores, re)
        else:
            final_scores = scores

        h = image_hw_scale[:, 0].astype(jnp.float32)  # (B,)
        w = image_hw_scale[:, 1].astype(jnp.float32)
        wh = jnp.stack([w, h], -1)[:, None, None, :]  # (B, 1, 1, 2)
        ctrl = out["pred_ctrl_points"].astype(jnp.float32) * wh
        recs = jnp.argmax(out["pred_text_logits"], axis=-1).astype(jnp.int32)  # (B, nq, npts)
        bd = out["pred_bd_points"].astype(jnp.float32) * jnp.concatenate([wh, wh], -1)

        pts = bd.reshape(*bd.shape[:2], -1, 2)  # (B, nq, 2*npts, 2)
        x_min = jnp.min(pts[..., 0], axis=-1)
        x_max = jnp.max(pts[..., 0], axis=-1)
        y_min = jnp.min(pts[..., 1], axis=-1)
        y_max = jnp.max(pts[..., 1], axis=-1)
        boxes = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)  # (B, nq, 4)

        thresh = self.test_score_threshold if score_thresh is None else score_thresh
        sel = final_scores > thresh
        keep = jax.vmap(lambda bx, sc, va: nms_mask(bx, sc, va, self.nms_thresh))(
            boxes, final_scores, sel
        )
        valid = sel & keep

        reid = self.tracker.reid(out["query_features"].astype(jnp.float32))  # (B, nq, F)

        return {
            "scores": final_scores,
            "valid": valid,
            "boxes": boxes,
            "ctrl_points": ctrl.reshape(*ctrl.shape[:2], -1),
            "recs": recs,
            "bd": bd,
            "reid": reid,
        }

    def spot_and_detect(self, images, image_hw: Optional[jnp.ndarray] = None, score_thresh=None):
        out = self.spot(images, image_hw)
        b = images.shape[0]
        if image_hw is None:
            hw = jnp.tile(
                jnp.asarray([[images.shape[1], images.shape[2]]], jnp.float32), (b, 1)
            )
        else:
            hw = image_hw.astype(jnp.float32)
        return self.detect(out, hw, score_thresh)

    def associate(self, reid_tokens, valid, short_term: bool, train: bool = False,
                  boxes=None, times=None):
        """Padded association transformer pass (see LSTMatcherHead.associate)."""
        return self.tracker.associate(reid_tokens, valid, short_term, train,
                                      boxes=boxes, times=times)

    # thin method aliases used by the training engine
    def rescore_features(self, query_features):
        return self.tracker.rescore(query_features)

    def reid_features(self, query_features):
        return self.tracker.reid(query_features)

    def associate_tokens(self, tokens, valid, short_term: bool, train: bool = False,
                         boxes=None, times=None):
        return self.tracker.associate(tokens, valid, short_term, train,
                                      boxes=boxes, times=times)

    def __call__(self, images, image_hw=None):
        """Full forward touching every submodule (also the init path)."""
        det = self.spot_and_detect(images, image_hw)
        toks = det["reid"][:, : min(4, det["reid"].shape[1])]
        valid = jnp.ones(toks.shape[:2], bool)
        det["asso_short"] = self.associate(toks, valid, True)
        det["asso_long"] = self.associate(toks, valid, False)
        return det


class SpotterPretrainModel(nn.Module):
    """Image-spotter pretraining meta-arch (TransformerPureDetector equivalent,
    third_party/adet/modeling/text_spotter.py:106): backbone + DeepSolo spotter
    emitting last-layer + aux-layer + encoder outputs for ``SpotterCriterion``.
    No tracker head; the whole model trains (no freezing)."""

    backbone_name: str = "build_resnet_backbone"
    resnet_depth: int = 50
    hidden_dim: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    num_queries: int = 100
    num_points: int = 25
    voc_size: int = 37
    temperature: float = 10000.0
    boundary_head: bool = True
    sampling_impl: str = "xla"
    tiled_halo: int = 8
    enc_block: int = 8
    dec_gather_levels: int = 0
    swin_type: str = "tiny"
    swin_drop_path: float = 0.0

    def setup(self):
        if self.backbone_name == "build_resnet_backbone":
            self.backbone = ResNet(
                depth=self.resnet_depth, out_features=("res3", "res4", "res5"), name="backbone"
            )
        elif self.backbone_name == "build_swin_backbone":
            from .swin import SwinTransformer

            self.backbone = SwinTransformer(
                depths=(2, 2, 18, 2) if self.swin_type == "small" else (2, 2, 6, 2),
                drop_path_rate=self.swin_drop_path,
                name="backbone",
            )
        elif self.backbone_name == "build_vitaev2_backbone":
            from .vitae import ViTAEv2

            self.backbone = ViTAEv2(name="backbone")
        else:
            raise ValueError(self.backbone_name)
        self.spotter = DeepSoloSpotter(
            d_model=self.hidden_dim,
            n_heads=self.n_heads,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            dim_feedforward=self.dim_feedforward,
            num_feature_levels=self.num_feature_levels,
            enc_n_points=self.enc_n_points,
            dec_n_points=self.dec_n_points,
            num_queries=self.num_queries,
            num_points=self.num_points,
            voc_size=self.voc_size,
            temperature=self.temperature,
            in_channels=BACKBONE_CHANNELS[self.backbone_name],
            boundary_head=self.boundary_head,
            return_enc_outputs=True,
            return_aux_outputs=True,
            sampling_impl=self.sampling_impl,
            tiled_halo=self.tiled_halo,
            enc_block=self.enc_block,
            dec_gather_levels=self.dec_gather_levels,
            name="detection_transformer",
        )

    def __call__(self, images: jnp.ndarray, image_hw: Optional[jnp.ndarray] = None,
                 train: bool = False):
        b, H, W, _ = images.shape
        if self.backbone_name == "build_swin_backbone":
            feats = self.backbone(images, train=train)  # drop-path active in train
        else:
            feats = self.backbone(images)
        feats = [feats["res3"], feats["res4"], feats["res5"]]
        masks = GoMatchingModel._level_masks(self, (H, W), image_hw, b)
        pos = [
            position_encoding_2d(
                (b, f.shape[1], f.shape[2]),
                self.hidden_dim // 2,
                self.temperature,
                None if masks is None else masks[i],
            )
            for i, f in enumerate(feats)
        ]
        return self.spotter(feats, pos, masks)


def build_pretrain_model(cfg) -> SpotterPretrainModel:
    t = cfg.MODEL.TRANSFORMER
    # pretraining differentiates THROUGH the spotter: TRAIN_SAMPLING_IMPL
    # selects the sampler; '' derives it from SAMPLING_IMPL, honoring an
    # explicit 'xla' (exact-everywhere gather) and keeping 'vmem' — the fused
    # kernels' custom-VJP backwards measured 1.17x faster than 'tiled' at
    # training shapes on the real TPU (tools/bench_train.py --pretrain
    # --impl both, 736px: vmem 1378 vs tiled 1611 ms/iter; PERF_NOTES round
    # 5). 'pallas' (no VJP) still maps to 'tiled'.
    impl = cfg.TPU.TRAIN_SAMPLING_IMPL or cfg.TPU.SAMPLING_IMPL
    if impl == "pallas":
        impl = "tiled"
    return SpotterPretrainModel(
        backbone_name=cfg.MODEL.BACKBONE.NAME,
        resnet_depth=cfg.MODEL.RESNETS.DEPTH,
        hidden_dim=t.HIDDEN_DIM,
        n_heads=t.NHEADS,
        num_encoder_layers=t.ENC_LAYERS,
        num_decoder_layers=t.DEC_LAYERS,
        dim_feedforward=t.DIM_FEEDFORWARD,
        num_feature_levels=t.NUM_FEATURE_LEVELS,
        enc_n_points=t.ENC_N_POINTS,
        dec_n_points=t.DEC_N_POINTS,
        num_queries=t.NUM_QUERIES,
        num_points=t.NUM_POINTS,
        voc_size=t.VOC_SIZE,
        temperature=float(t.TEMPERATURE),
        boundary_head=t.BOUNDARY_HEAD,
        sampling_impl=impl,
        tiled_halo=cfg.TPU.TILED_HALO,
        enc_block=cfg.TPU.ENC_BLOCK,
        dec_gather_levels=cfg.TPU.DEC_GATHER_LEVELS,
        swin_type=cfg.MODEL.SWIN.TYPE,
        swin_drop_path=cfg.MODEL.SWIN.DROP_PATH_RATE,
    )


def build_model(cfg) -> GoMatchingModel:
    """Construct the meta-arch from a reference-schema config."""
    t = cfg.MODEL.TRANSFORMER
    a = cfg.MODEL.ASSO_HEAD
    variant = {"LSTMatcher": "lst", "SHA_FFN_CRSATTN": "shared"}[cfg.MODEL.ROI_HEADS.NAME]
    return GoMatchingModel(
        backbone_name=cfg.MODEL.BACKBONE.NAME,
        resnet_depth=cfg.MODEL.RESNETS.DEPTH,
        hidden_dim=t.HIDDEN_DIM,
        n_heads=t.NHEADS,
        num_encoder_layers=t.ENC_LAYERS,
        num_decoder_layers=t.DEC_LAYERS,
        dim_feedforward=t.DIM_FEEDFORWARD,
        num_feature_levels=t.NUM_FEATURE_LEVELS,
        enc_n_points=t.ENC_N_POINTS,
        dec_n_points=t.DEC_N_POINTS,
        num_queries=t.NUM_QUERIES,
        num_points=t.NUM_POINTS,
        voc_size=t.VOC_SIZE,
        temperature=float(t.TEMPERATURE),
        boundary_head=t.BOUNDARY_HEAD,
        asso_feature_dim=a.FC_DIM,
        asso_num_fc=a.NUM_FC,
        asso_num_heads=a.NUM_HEADS,
        asso_num_encoder_layers=a.NUM_ENCODER_LAYERS,
        asso_num_decoder_layers=a.NUM_DECODER_LAYERS,
        asso_num_weight_layers=a.NUM_WEIGHT_LAYERS,
        roi_head_variant=variant,
        with_rescore=cfg.MODEL.ROI_HEADS.WITH_RESR,
        asso_dropout=a.DROPOUT,
        asso_no_pos_emb=a.NO_POS_EMB,
        asso_with_temp_emb=a.WITH_TEMP_EMB,
        swin_type=cfg.MODEL.SWIN.TYPE,
        test_score_threshold=t.INFERENCE_TH_TEST,
        nms_thresh=cfg.VIDEO_TEST.NMS_THRESH,
        compute_dtype=cfg.MODEL.PRECISION,
        sampling_impl=cfg.TPU.SAMPLING_IMPL,
        tiled_halo=cfg.TPU.TILED_HALO,
        enc_block=cfg.TPU.ENC_BLOCK,
        dec_gather_levels=cfg.TPU.DEC_GATHER_LEVELS,
    )
