"""Training engine: freeze partition, optimizer, LR schedule, train step.

Parity targets:
  - ``build_custom_optimizer`` (gomatching/costom_solver.py:20-77): AdamW, base LR
    5e-5, per-group backbone multiplier, full-model grad-norm clip 0.1;
  - WarmupCosineLR (detectron2 semantics: linear warmup 1000 iters factor 1e-3,
    cosine decay to 0 over MAX_ITER);
  - ``check_if_freeze_model`` FREEZE_TYPE=ExceptROIheads
    (gomatching/modeling/freeze_layers.py:139,20) — realized the JAX way: frozen
    params simply are not in the optimized pytree (SURVEY.md §5);
  - the training forward of ``GoMatching.forward`` (gom_lstmatcher.py:213-266):
    spotter (no grad) -> rescore + loss_res -> thresholded proposals -> long/short
    association losses.

The step is SPMD-ready: under a Mesh it takes pmean of grads/num_inst over the
'data' axis (replacing DDP + the manual all_reduce at losses.py:260-262).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.gomatching import GoMatchingModel
from .losses import asso_ce_loss, rescore_loss


class TrainState(NamedTuple):
    trainable: Any  # roi_heads param subtree
    frozen: Any  # everything else
    opt_state: Any
    step: jnp.ndarray


def normalize_wire_frames(images, pixel_mean, pixel_std, image_hw=None):
    """uint8 wire frames -> normalized f32 on device.

    Training clips ship as raw uint8 (4x fewer bytes over a slow host link)
    and are normalized in-graph — the reference's own order: the meta-arch
    normalizes per-image on device, THEN ImageList.from_tensors zero-pads
    (gom_lstmatcher.py:159-169). ``image_hw`` (B, 2) true (h, w) re-zeroes
    the canvas padding so numerics match the host normalize-then-pad path
    exactly; None means the frames fill the canvas.
    """
    x = images.astype(jnp.float32)
    x = (x - jnp.asarray(pixel_mean, jnp.float32)) / jnp.asarray(pixel_std, jnp.float32)
    if image_hw is not None:
        b, h, w = x.shape[:3]
        rows = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
        cols = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
        hw = image_hw.astype(jnp.float32)
        valid = (rows < hw[:, 0, None, None]) & (cols < hw[:, 1, None, None])
        x = x * valid[..., None].astype(jnp.float32)
    return x


def encode_train_clip(images_u8: np.ndarray, input_format: str = "RGB"):
    """HOST: raw uint8 clip (B, H, W, 3) -> planar I420 (B, H*3//2, W) for the
    TPU.TRAIN_UPLOAD_FORMAT=yuv420 wire (half the tunnel bytes; decoded
    in-graph by ``Trainer._spot_fn``). Returns the clip unchanged when a dim
    is odd — the device decode is keyed on ndim, so the fallback is safe."""
    h, w = images_u8.shape[1:3]
    if h % 2 or w % 2:
        return images_u8
    from ..data.preprocess import encode_i420

    x = images_u8[..., ::-1] if input_format == "RGB" else images_u8
    return encode_i420(np.ascontiguousarray(x))


def split_params(params, freeze_type: str = "ExceptROIheads"):
    """Partition the param tree into (trainable, frozen) per the named freeze
    policy (gomatching/modeling/freeze_layers.py:139-172). In JAX, freezing is
    simply which subtrees enter the optimized pytree.

    Policies: ExceptROIheads / ExceptROIheadsID train only roi_heads (the
    GoMatching recipe; :20-37 and :3-18 — identical for this architecture);
    ROIheads freezes roi_heads and trains the rest (:39-49); Backbone /
    BackboneBottomup freeze the backbone trunk (:51-73); '' trains everything.
    The cascade-classifier variants (:75-137) target a CenterNet2
    ``roi_heads.box_predictor`` that does not exist in the GoMatching
    architecture (they would raise in the reference too) and are rejected.
    """
    p = params["params"]
    if freeze_type in ("ExceptROIheads", "ExceptROIheadsID"):
        train_keys = {"roi_heads"}
    elif freeze_type == "ROIheads":
        train_keys = set(p) - {"roi_heads"}
    elif freeze_type in ("Backbone", "BackboneBottomup"):
        train_keys = set(p) - {"backbone"}
    elif freeze_type == "":
        train_keys = set(p)
    else:
        raise NotImplementedError(
            f"FREEZE_TYPE={freeze_type!r} targets CenterNet2 submodules absent "
            "from the GoMatching architecture"
        )
    trainable = {k: v for k, v in p.items() if k in train_keys}
    frozen = {k: v for k, v in p.items() if k not in train_keys}
    return trainable, frozen


def merge_params(trainable, frozen):
    return {"params": {**frozen, **trainable}}


def unpack_spot_meta(meta: np.ndarray) -> Dict[str, Optional[np.ndarray]]:
    """Split the packed single-fetch host_meta (…, nq, npts, K) back into the
    named spot fields prepare_batch reads (K=8 with a rescore head, else 7)."""
    meta = np.asarray(meta, np.float32)
    has_re = meta.shape[-1] == 8
    o = 2 if has_re else 1
    return {
        "pred_logits": meta[..., :1],
        "re_pred_logits": meta[..., 1:2] if has_re else None,
        "pred_ctrl_points": meta[..., o : o + 2],
        "pred_bd_points": meta[..., o + 2 : o + 6],
    }


def pack_host_batch(batch: Dict[str, np.ndarray]):
    """Flatten the host-built batch (everything but query_features) into ONE
    f32 vector + a static meta describing how to restore it. The tunneled TPU
    charges ~30-40 ms FIXED per transfer RPC, so uploading ~10 small arrays
    separately cost ~0.3 s/step; one packed upload costs one RPC. All packed
    values are small integers/bools/normalized floats — exact in f32."""
    keys = tuple(sorted(batch))
    meta = tuple((k, tuple(batch[k].shape), str(np.asarray(batch[k]).dtype)) for k in keys)
    flat = (
        np.concatenate([np.asarray(batch[k], np.float32).ravel() for k in keys])
        if keys
        else np.zeros((0,), np.float32)
    )
    return flat, meta


def unpack_host_batch(flat: jnp.ndarray, meta) -> Dict[str, jnp.ndarray]:
    """Inverse of pack_host_batch inside jit (static shapes/dtypes; int64
    restores as int32 — jax x64 is off and all values are small indices)."""
    out, pos = {}, 0
    for k, shape, dtype in meta:
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        x = flat[pos : pos + n].reshape(shape)
        dt = {"int64": jnp.int32, "bool": jnp.bool_}.get(dtype, jnp.dtype(dtype))
        out[k] = x.astype(dt)
        pos += n
    return out


def fetch_metrics(pending) -> Dict[str, float]:
    """Materialize a deferred metrics handle from ``Trainer.step_finish(...,
    blocking=False)`` — one device fetch for the whole stacked vector."""
    keys, packed = pending
    return dict(zip(keys, np.asarray(packed, np.float32).tolist()))


def warmup_cosine_schedule(base_lr: float, max_iter: int, warmup_iters: int = 1000,
                           warmup_factor: float = 1e-3):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_factor + (1 - warmup_factor) * jnp.minimum(step, warmup_iters) / warmup_iters
        cos = 0.5 * (1 + jnp.cos(jnp.pi * jnp.clip(step / max_iter, 0, 1)))
        return base_lr * jnp.where(step < warmup_iters, warm, cos)

    return schedule


def build_optimizer(cfg):
    """Parity: build_custom_optimizer (costom_solver.py:20-54) — per-parameter
    LR groups: params under 'backbone' x BACKBONE_MULTIPLIER, params whose path
    contains a CUSTOM_MULTIPLIER_NAME keyword x CUSTOM_MULTIPLIER, SGD or AdamW,
    optional full-model grad-norm clip (:55-77)."""
    s = cfg.SOLVER
    sched = (
        warmup_cosine_schedule(s.BASE_LR, s.MAX_ITER, s.WARMUP_ITERS, s.WARMUP_FACTOR)
        if s.LR_SCHEDULER_NAME == "WarmupCosineLR"
        else optax.piecewise_constant_schedule(
            s.BASE_LR, {int(st): s.GAMMA for st in s.STEPS}
        )
    )

    def make(mult: float):
        lr = (lambda step: sched(step) * mult) if mult != 1.0 else sched
        if s.OPTIMIZER.upper() == "ADAMW":
            return optax.adamw(lr, weight_decay=s.WEIGHT_DECAY)
        return optax.sgd(lr, momentum=s.MOMENTUM)

    custom_names = list(s.CUSTOM_MULTIPLIER_NAME)
    needs_groups = s.BACKBONE_MULTIPLIER != 1.0 or (
        custom_names and s.CUSTOM_MULTIPLIER != 1.0
    )
    if needs_groups:
        def label_fn(params):
            def label(path, _):
                keys = "/".join(str(getattr(p, "key", p)) for p in path)
                if "backbone" in keys.split("/")[:2]:
                    return "backbone"
                if any(name in keys for name in custom_names):
                    return "custom"
                return "rest"

            return jax.tree_util.tree_map_with_path(label, params)

        opt = optax.multi_transform(
            {
                "backbone": make(s.BACKBONE_MULTIPLIER),
                "custom": make(s.CUSTOM_MULTIPLIER),
                "rest": make(1.0),
            },
            label_fn,
        )
    else:
        opt = make(1.0)

    chain = []
    if s.CLIP_GRADIENTS.ENABLED and s.CLIP_GRADIENTS.CLIP_TYPE == "full_model":
        chain.append(optax.clip_by_global_norm(s.CLIP_GRADIENTS.CLIP_VALUE))
    chain.append(opt)
    return optax.chain(*chain), sched


class Trainer:
    """Orchestrates the 3-phase step:
    1. jit spotter forward (frozen) -> detections/query features
    2. host: Hungarian rescore match + association GT (no-grad numpy)
    3. jit loss+grad on the trainable subtree + optax update

    Note: the tracker losses only reach the roi_heads subtree (the spotter
    forward is stop_gradient'ed, matching the reference's frozen-spotter
    recipe). FREEZE_TYPE values that mark spotter/backbone params trainable
    keep those params in the optimizer but only the spotter-pretraining path
    (engine/pretrain.py) produces gradients for them.
    """

    def __init__(self, cfg, model: GoMatchingModel, params, mesh=None):
        self.cfg = cfg
        self.model = model
        self.mesh = mesh
        trainable, frozen = split_params(params, cfg.MODEL.FREEZE_TYPE)
        # MODEL.PRECISION=bfloat16 runs the FROZEN spotter forward in bf16,
        # exactly like production inference (predictor.cast_frozen_params):
        # the spot phase is pure frozen MXU work and stop_gradient'ed, so
        # bf16 halves its time without touching optimizer numerics (the
        # trainable roi_heads subtree stays f32). ``frozen_f32`` keeps the
        # original-precision copy for checkpointing.
        self.frozen_f32 = None
        if cfg.MODEL.PRECISION == "bfloat16":
            self.frozen_f32 = frozen
            frozen = {
                k: (jax.tree.map(lambda x: x.astype(jnp.bfloat16), v)
                    if k in ("backbone", "detection_transformer") else v)
                for k, v in frozen.items()
            }
        self.tx, self.schedule = build_optimizer(cfg)
        self.state = TrainState(
            trainable=trainable,
            frozen=frozen,
            opt_state=self.tx.init(trainable),
            step=jnp.zeros((), jnp.int32),
        )
        self.asso_thresh = cfg.MODEL.ASSO_HEAD.ASSO_THRESH
        self.train_thresh = cfg.MODEL.TRANSFORMER.INFERENCE_TH_TRAIN
        self.asso_weight = cfg.MODEL.ASSO_HEAD.ASSO_WEIGHT
        self.asso_weight_local = cfg.MODEL.ASSO_HEAD.ASSO_WEIGHT_LOCAL
        self.neg_unmatched = cfg.MODEL.ASSO_HEAD.NEG_UNMATCHED
        self.focal_alpha = cfg.MODEL.TRANSFORMER.LOSS.FOCAL_ALPHA
        self.focal_gamma = cfg.MODEL.TRANSFORMER.LOSS.FOCAL_GAMMA
        self.with_rescore = cfg.MODEL.ROI_HEADS.WITH_RESR
        # ASSO_HEAD.DROPOUT (default 0.1, not overridden by any shipped YAML)
        # is active during training, like the reference's nn.Dropout modules
        # (roi_heads/transformer.py:166-258)
        self.use_dropout = cfg.MODEL.ASSO_HEAD.DROPOUT > 0.0
        # with NO_POS_EMB=False the reference applies the interpolated box
        # (+temporal) embeddings in forward_train too (_forward_transformer,
        # lstmatcher.py:338-346) — mirror that so pos_emb/temp_emb get gradient
        # and train/infer agree
        self.use_pos_emb = not model.asso_no_pos_emb
        self.with_temp_emb = model.asso_with_temp_emb
        self.pixel_mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
        self.pixel_std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
        self.input_format = cfg.INPUT.FORMAT  # channel order of rgb-wire clips
        self.phase_t: Dict[str, float] = {}  # last step's wall-time split

        self._spot = jax.jit(self._spot_fn)
        self._update = jax.jit(self._update_fn)
        self._packed_updates: Dict[Any, Any] = {}  # batch meta -> jitted update

    # ------------------------------------------------------------------
    def _decode_wire(self, images, image_hw):
        """Planar I420 training wire (B, H*3//2, W) uint8 -> normalized f32
        frames: device-side decode (same codec as the inference wire,
        data/preprocess.py decode_i420, returns BGR in [0, 255]), channel
        order to INPUT.FORMAT, then normalize + re-zero padding."""
        from ..data.preprocess import decode_i420

        x = decode_i420(images)
        if self.input_format == "RGB":
            x = x[..., ::-1]
        return normalize_wire_frames(x, self.pixel_mean, self.pixel_std, image_hw)

    def _spot_fn(self, frozen, trainable, images, image_hw):
        if images.ndim == 3:
            # yuv420 wire (TPU.TRAIN_UPLOAD_FORMAT): decode + normalize
            images = self._decode_wire(images, image_hw)
        elif images.dtype == jnp.uint8:
            # raw wire format (TPU.TRAIN_UPLOAD_UINT8): normalize + re-zero
            # padding in-graph; dtype is static so the f32 path is untouched
            images = normalize_wire_frames(
                images, self.pixel_mean, self.pixel_std, image_hw
            )
        params = merge_params(trainable, frozen)
        out = self.model.apply(
            params, images, image_hw, method=GoMatchingModel.spot
        )
        # host_meta packs every field prepare_batch's host phase reads into
        # ONE small f32 fetch ([logit | re_logit? | ctrl xy | bd xyxy] on the
        # last axis). query_features — 32-64x larger — stays device-resident:
        # over the ~35 MB/s tunnel, round-tripping a (8,100,25,256) f32 qf
        # cost ~1.2 s of the measured 1.5 s tracker step (PERF_NOTES round 4).
        meta = [out["pred_logits"]]
        if out["re_pred_logits"] is not None:
            meta.append(out["re_pred_logits"])
        meta += [out["pred_ctrl_points"], out["pred_bd_points"]]
        return {
            "query_features": jax.lax.stop_gradient(out["query_features"]),
            "host_meta": jax.lax.stop_gradient(
                jnp.concatenate([m.astype(jnp.float32) for m in meta], axis=-1)
            ),
            "pred_logits": jax.lax.stop_gradient(out["pred_logits"]),
            "pred_ctrl_points": jax.lax.stop_gradient(out["pred_ctrl_points"]),
            "pred_bd_points": jax.lax.stop_gradient(out["pred_bd_points"]),
            "re_pred_logits": out["re_pred_logits"],
        }

    # ------------------------------------------------------------------
    def _loss_fn(self, trainable, frozen, batch, rng=None):
        """batch: dict of fixed-shape arrays prepared on host. ``rng``: a
        'dropout' PRNG key enabling ASSO_HEAD.DROPOUT in the matcher layers;
        None = deterministic (eval semantics)."""
        model = self.model
        train = rng is not None
        call_idx = [0]

        def apply(method, *args):
            rngs = None
            if train:
                rngs = {"dropout": jax.random.fold_in(rng, call_idx[0])}
                call_idx[0] += 1
            return model.apply(merge_params(trainable, frozen), *args, method=method, rngs=rngs)

        qf = batch["query_features"]  # (T, nq, npts, C)
        T, nq = qf.shape[:2]
        losses = {}
        if self.with_rescore:
            re_logits = apply(GoMatchingModel.rescore_features, qf)
            losses["loss_res"] = rescore_loss(
                re_logits,
                batch["res_match_mask"],
                batch["num_inst"],
                self.focal_alpha,
                self.focal_gamma,
            )

        # reid over all slots, padded association
        reid = apply(GoMatchingModel.reid_features, qf)  # (T, nq, F)
        tokens = reid.reshape(1, T * nq, -1)
        valid = batch["prop_valid"].reshape(1, T * nq)

        boxes = batch.get("prop_boxes") if self.use_pos_emb else None  # (T, nq, 4)
        times = (
            batch.get("prop_times")
            if self.use_pos_emb and self.with_temp_emb
            else None
        )  # (T, nq)

        long_logits = apply(
            GoMatchingModel.associate_tokens,
            tokens,
            valid,
            False,
            train,
            None if boxes is None else boxes.reshape(1, T * nq, 4),
            None if times is None else times.reshape(1, T * nq),
        )
        long_logits = long_logits.reshape(T * nq, T, nq)
        loss_long = asso_ce_loss(
            long_logits,
            batch["prop_valid"].reshape(-1),
            batch["prop_valid"],
            batch["asso_gt"],
            batch["match_cues"].reshape(-1),
            batch["track_valid"],
            self.neg_unmatched,
        )
        losses["loss_long_asso"] = self.asso_weight * loss_long

        # short-term: adjacent pairs
        loss_short = 0.0
        for t in range(T - 1):
            pair_tokens = reid[t : t + 2].reshape(1, 2 * nq, -1)
            pair_valid = batch["prop_valid"][t : t + 2].reshape(1, 2 * nq)
            pair_boxes = (
                None if boxes is None else boxes[t : t + 2].reshape(1, 2 * nq, 4)
            )
            # a 2-frame pass has time fractions (0, 1/2), like the inference
            # tracker's _pos_inputs over [prev, cur]
            pair_times = (
                None
                if times is None
                else jnp.concatenate(
                    [jnp.zeros((nq,), jnp.float32), jnp.full((nq,), 0.5, jnp.float32)]
                ).reshape(1, 2 * nq)
            )
            lg = apply(
                GoMatchingModel.associate_tokens, pair_tokens, pair_valid, True,
                train, pair_boxes, pair_times,
            )
            lg = lg.reshape(2 * nq, 2, nq)
            loss_short = loss_short + asso_ce_loss(
                lg,
                batch["prop_valid"][t : t + 2].reshape(-1),
                batch["prop_valid"][t : t + 2],
                batch["asso_gt_pairs"][t],
                batch["match_cues"][t : t + 2].reshape(-1),
                batch["track_valid_pairs"][t],
                self.neg_unmatched,
            )
        losses["loss_short_asso"] = self.asso_weight_local * loss_short / max(T - 1, 1)

        total = sum(losses.values())
        return total, losses

    def _update_fn(self, state: TrainState, batch):
        rng = (
            jax.random.fold_in(jax.random.PRNGKey(17), state.step)
            if self.use_dropout
            else None
        )
        grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
        (total, losses), grads = grad_fn(state.trainable, state.frozen, batch, rng)
        if self.mesh is not None and "data" in getattr(self.mesh, "axis_names", ()):
            grads = jax.lax.pmean(grads, "data")
            losses = jax.lax.pmean(losses, "data")
        updates, opt_state = self.tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(trainable, state.frozen, opt_state, state.step + 1)
        return new_state, {**losses, "total_loss": total}

    # ------------------------------------------------------------------
    def prepare_batch(self, spot_out: Dict[str, np.ndarray], targets: Dict,
                      frame_valid: Optional[np.ndarray] = None) -> Dict:
        """Host phase: score fusion, proposal threshold, Hungarian + asso GT.

        ``frame_valid`` (T,) masks padding frames appended so clips of unequal
        length can stack on the SPMD 'data' axis — their proposals are dropped
        and they carry no GT, so they contribute nothing to any loss."""
        from .losses import build_asso_targets, match_rescore

        logits = np.asarray(spot_out["pred_logits"], np.float32)  # (T, nq, npts, 1)
        T, nq = logits.shape[:2]
        scores = 1 / (1 + np.exp(-logits.mean(2)[..., 0]))
        if self.with_rescore and spot_out["re_pred_logits"] is not None:
            re = np.asarray(spot_out["re_pred_logits"], np.float32)
            re_s = 1 / (1 + np.exp(-re.mean(2)[..., 0]))
            fused = np.maximum(scores, re_s)
        else:
            re = None
            fused = scores
        # proposal selection: detection threshold then asso threshold (same value
        # chain as gom_lstmatcher.py:608 + lstmatcher.py:276-278)
        prop_valid = (fused > self.train_thresh) & (fused > self.asso_thresh)
        if frame_valid is not None:
            prop_valid &= np.asarray(frame_valid, bool)[:, None]

        # boxes from boundary extremes, normalized
        bd = np.asarray(spot_out["pred_bd_points"], np.float32)  # (T, nq, npts, 4) in [0,1]
        pts = bd.reshape(T, nq, -1, 2)
        boxes = np.stack(
            [pts[..., 0].min(-1), pts[..., 1].min(-1), pts[..., 0].max(-1), pts[..., 1].max(-1)],
            axis=-1,
        )

        num_inst = max(sum(len(g) for g in targets["gt_ctrl"]), 1)

        res_match_mask = np.zeros((T, nq), np.float32)
        if self.with_rescore and re is not None:
            # 4GM matcher cost uses the configured class/coord weights
            # (build_point_matcher, matcher.py:255-261)
            lw = self.cfg.MODEL.TRANSFORMER.LOSS
            matches = match_rescore(
                re, np.asarray(spot_out["pred_ctrl_points"]), targets["gt_ctrl"],
                class_weight=lw.POINT_CLASS_WEIGHT,
                coord_weight=lw.POINT_COORD_WEIGHT,
                focal_alpha=lw.FOCAL_ALPHA,
                focal_gamma=lw.FOCAL_GAMMA,
            )
            for t, (qi, _) in enumerate(matches):
                res_match_mask[t, qi] = 1.0

        max_tracks = nq
        asso_gt, match_cues, track_valid = build_asso_targets(
            boxes, prop_valid, targets["gt_boxes"], targets["gt_ids"], max_tracks
        )
        # per adjacent pair GT
        asso_gt_pairs = np.zeros((max(T - 1, 1), max_tracks, 2), np.int64)
        track_valid_pairs = np.zeros((max(T - 1, 1), max_tracks), bool)
        for t in range(T - 1):
            gp, _, tv = build_asso_targets(
                boxes[t : t + 2],
                prop_valid[t : t + 2],
                targets["gt_boxes"][t : t + 2],
                targets["gt_ids"][t : t + 2],
                max_tracks,
            )
            asso_gt_pairs[t] = gp
            track_valid_pairs[t] = tv

        # host-side numpy throughout: step() packs these into ONE upload
        # (pack_host_batch) instead of ~10 per-field transfer RPCs
        out = {
            "prop_valid": prop_valid,
            "res_match_mask": res_match_mask,
            "num_inst": np.float32(num_inst),
            "asso_gt": asso_gt,
            "match_cues": match_cues,
            "track_valid": track_valid,
            "asso_gt_pairs": asso_gt_pairs,
            "track_valid_pairs": track_valid_pairs,
        }
        if self.use_pos_emb:
            # normalized xyxy proposal boxes + frame-time fractions for the
            # interpolated pos-embedding path (boxes are already in [0, 1]
            # because pred_bd_points are normalized)
            out["prop_boxes"] = np.asarray(boxes, np.float32)
            out["prop_times"] = np.broadcast_to(
                (np.arange(T, dtype=np.float32) / T)[:, None], (T, nq)
            ).copy()
        return out

    # ------------------------------------------------------------------
    def put_clip(self, images: np.ndarray):
        """Dispatch the clip's host->device transfer NOW (async). The
        overlapped train loop uploads clip i+1 while the device runs step i
        (tools/probe_upload_overlap.py measures whether the runtime overlaps
        the wire with compute on this worker)."""
        return jax.device_put(images, jax.devices()[0])

    def step_begin(self, images, image_hw) -> None:
        """Phase 1 of a step: dispatch the frozen spot forward. Non-blocking —
        the caller may do host work (decode/upload the next clip) before
        calling ``step_finish``, which blocks on the packed meta fetch."""
        self._t_begin = time.perf_counter()
        self._pending_spot = self._spot(
            self.state.frozen, self.state.trainable, images, image_hw
        )

    def step_finish(self, targets: Dict, blocking: bool = True,
                    begin_next=None):
        """Phases 2+3: fetch spot meta, host Hungarian/GT phase, dispatch the
        packed update. ``blocking=False`` returns the metrics as device
        scalars WITHOUT waiting for the update to execute — the overlapped
        loop fetches them one iteration later, after the next step's spot is
        already in the device queue.

        ``begin_next``: optional (device images, image_hw) of the NEXT clip;
        its frozen spot forward is dispatched immediately AFTER this step's
        update so its compute hides behind the whole inter-iteration host
        window (metrics drain, clip decode/upload, next meta fetch) instead
        of only the slice between loop-top and fetch. Dispatch order keeps
        numerics identical to the sequential chain: the update runs first on
        the in-order device stream, and the next spot reads the post-update
        trainable handles (the rescore head inside ``spot`` is trainable)."""
        spot_out, self._pending_spot = self._pending_spot, None
        t0 = self._t_begin
        host = unpack_spot_meta(np.asarray(spot_out["host_meta"]))
        t1 = time.perf_counter()
        batch = self.prepare_batch(host, targets)
        flat, meta = pack_host_batch(batch)
        t2 = time.perf_counter()
        entry = self._packed_updates.get(meta)
        if entry is None:
            keybox: list = []  # metric-name order, captured at trace time

            def upd(state, flat, qf, _meta=meta, _kb=keybox):
                b = unpack_host_batch(flat, _meta)
                b["query_features"] = qf
                ns, m = self._update_fn(state, b)
                ks = tuple(sorted(m))
                if not _kb:
                    _kb.append(ks)
                # metrics leave the device as ONE stacked f32 vector — a
                # per-key float() fetch costs one tunnel RPC each
                return ns, jnp.stack([m[k].astype(jnp.float32) for k in ks])

            entry = self._packed_updates.setdefault(meta, (jax.jit(upd), keybox))
        fn, keybox = entry
        self.state, packed = fn(self.state, flat, spot_out["query_features"])
        if begin_next is not None:
            self.step_begin(*begin_next)
        keys = keybox[0] if keybox else ()
        out = (
            dict(zip(keys, np.asarray(packed, np.float32).tolist()))
            if blocking
            else (keys, packed)
        )
        t3 = time.perf_counter()
        # phase wall-times of the LAST step (tools/bench_train.py breakdown):
        # spot = upload+spot jit+meta fetch; host = Hungarian/GT numpy phase;
        # update = packed upload + matcher fwd/bwd/Adam + metrics fetch
        self.phase_t = {"spot": t1 - t0, "host": t2 - t1, "update": t3 - t2}
        return out

    def step(self, images: np.ndarray, image_hw, targets: Dict) -> Dict[str, float]:
        """One full training iteration on one clip.

        Tunnel-aware dataflow (PERF_NOTES round 4): the spot jit returns a
        packed host_meta fetched in ONE RPC; query_features stays device-
        resident; the host-built targets go back up as ONE packed f32 upload
        unpacked inside the update jit."""
        self.step_begin(images, image_hw)
        return self.step_finish(targets)

    # ------------------------------------------------------------------
    # SPMD data-parallel path: one clip per mesh 'data' slot per iteration —
    # the TPU equivalent of the reference's DDP launch (train_net.py:186-209).
    # Loss is the mean over clips, so XLA's gradient psum reproduces DDP's
    # averaged all-reduce exactly.
    def shard_state(self):
        """Replicate trainable/frozen/opt_state across the mesh (DP weights)."""
        from ..parallel import replicate

        assert self.mesh is not None
        repl = replicate(self.mesh)
        put = lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x
        self.state = TrainState(
            trainable=jax.tree.map(put, self.state.trainable),
            frozen=jax.tree.map(put, self.state.frozen),
            opt_state=jax.tree.map(put, self.state.opt_state),
            step=self.state.step,
        )

    def _sharded_update_fn(self, trainable, frozen, opt_state, batch, rng):
        def loss_fn(tr):
            if self.use_dropout:
                nclip = jax.tree.leaves(batch)[0].shape[0]
                rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(nclip))
                total, losses = jax.vmap(
                    lambda b, r: self._loss_fn(tr, frozen, b, r)
                )(batch, rngs)
            else:
                total, losses = jax.vmap(lambda b: self._loss_fn(tr, frozen, b))(batch)
            return total.mean(), jax.tree.map(lambda x: x.mean(), losses)

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        updates, opt_state = self.tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {**losses, "total_loss": total}

    def _build_sharded_update(self):
        from ..parallel import clip_sharding, replicate

        repl = replicate(self.mesh)
        dsh = clip_sharding(self.mesh)
        self._update_multi = jax.jit(
            self._sharded_update_fn,
            in_shardings=(repl, repl, None, dsh, None),
            out_shardings=(repl, None, repl),
        )
        # ONE sharded spot dispatch for all clips: each mesh slot runs its own
        # clip's full frozen-spotter forward concurrently (the DDP-concurrent
        # per-GPU forward, reference train_net.py:186-191) instead of N
        # sequential replicated passes
        self._spot_multi = jax.jit(
            jax.vmap(self._spot_fn, in_axes=(None, None, 0, 0)),
            in_shardings=(repl, repl, dsh, dsh),
            out_shardings=dsh,
        )
        self._data_sharding = dsh

    def step_multi(self, clips) -> Dict[str, float]:
        """One iteration over ``len(clips)`` clips sharded on the 'data' axis.

        ``clips``: list of (images (T,H,W,3), image_hw or None, targets); all
        clips must share (T, H, W) — the caller pads to a common canvas.
        """
        assert self.mesh is not None, "step_multi requires a mesh"
        if not hasattr(self, "_update_multi"):
            self._build_sharded_update()
            self.shard_state()
        imgs = np.stack([c[0] for c in clips])  # (N, T, H, W, 3)
        hws = np.stack(
            [
                np.asarray(hw, np.float32)
                if hw is not None
                else np.tile(np.asarray(im.shape[1:3], np.float32)[None], (im.shape[0], 1))
                for im, hw, _ in clips
            ]
        )  # (N, T, 2)
        spot_all = self._spot_multi(
            self.state.frozen,
            self.state.trainable,
            jax.device_put(imgs, self._data_sharding),
            jax.device_put(hws, self._data_sharding),
        )
        # single packed fetch for every clip's host phase (see step())
        meta_all = unpack_spot_meta(np.asarray(spot_all["host_meta"]))
        batches = []
        for i, (_, _, targets) in enumerate(clips):
            spot = {k: (None if v is None else v[i]) for k, v in meta_all.items()}
            b = self.prepare_batch(spot, targets, frame_valid=targets.get("frame_valid"))
            batches.append(jax.tree.map(np.asarray, b))
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
        stacked = jax.tree.map(lambda x: jax.device_put(x, self._data_sharding), stacked)
        # device-resident, already sharded on 'data' by _spot_multi's
        # out_shardings — never fetched to host
        stacked["query_features"] = spot_all["query_features"]
        rng = jax.random.fold_in(jax.random.PRNGKey(17), self.state.step)
        trainable, opt_state, metrics = self._update_multi(
            self.state.trainable, self.state.frozen, self.state.opt_state, stacked, rng
        )
        self.state = TrainState(trainable, self.state.frozen, opt_state, self.state.step + 1)
        return {k: float(v) for k, v in metrics.items()}
