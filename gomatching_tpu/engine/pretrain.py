"""DeepSolo spotter pretraining step (image text spotting).

Parity: the training side of ``TransformerPureDetector``
(third_party/adet/modeling/text_spotter.py:106-265): full-model AdamW with the
backbone LR multiplier (costom_solver.py:35-44), SetCriterion losses over
final + aux decoder layers + encoder proposals, full-model grad-norm clip.

Multi-chip: shard the batch with a data-axis NamedSharding before calling
``step`` (GSPMD inserts the gradient/num_inst reductions, replacing DDP + the
all_reduce at losses.py:260-262); see ``__graft_entry__.dryrun_multichip`` for
the pattern.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.gomatching import SpotterPretrainModel, build_pretrain_model
from .spotter_losses import SpotterCriterion
from .train import build_optimizer, warmup_cosine_schedule


def build_spotter_targets(record: Dict, max_gt: int, num_points: int, voc_size: int):
    """Padded SpotterCriterion targets from one loaded dataset record
    (data/datasets.py load_video_json fields), coordinates normalized to [0,1].

    Returns a dict of (max_gt, ...) arrays + 'valid'.
    """
    h, w = float(record["height"]), float(record["width"])
    annos = [a for a in record.get("annotations", []) if "beziers" in a]
    n = min(len(annos), max_gt)
    t_len = annos[0]["texts"].shape[0] if annos else 25
    out = {
        "valid": np.zeros((max_gt,), bool),
        "labels": np.zeros((max_gt,), np.int32),
        "ctrl_points": np.zeros((max_gt, num_points, 2), np.float32),
        "bd_points": np.zeros((max_gt, num_points, 4), np.float32),
        "texts": np.full((max_gt, t_len), voc_size, np.int32),
        "beziers": np.zeros((max_gt, 4, 2), np.float32),
    }
    wh = np.asarray([w, h], np.float32)
    for i, a in enumerate(annos[:n]):
        out["valid"][i] = True
        out["ctrl_points"][i] = np.asarray(a["polyline"], np.float32).reshape(num_points, 2) / wh
        out["bd_points"][i] = np.asarray(a["boundary"], np.float32).reshape(num_points, 4) / np.concatenate([wh, wh])
        out["texts"][i] = a["texts"]
        out["beziers"][i] = np.asarray(a["beziers"], np.float32).reshape(4, 2) / wh
    return out


def build_video_spotter_targets(sample, max_gt: int, num_points: int, voc_size: int):
    """Per-frame padded SpotterCriterion targets from a video ClipSample,
    stacked on the frame axis -> dict of (T, max_gt, ...) arrays.

    TransformerPureVideoDetector parity: the reference's video pretraining
    meta-arch (video_text_spotter.py:106) is byte-identical to the image one
    (text_spotter.py:106) — the 'video' part is only that the batch dimension
    carries the frames of one clip, which is exactly what this builds.
    """
    h, w = sample.image_hw
    wh = np.asarray([w, h], np.float32)
    T = len(sample.images)
    t_len = sample.gt_texts[0].shape[1] if len(sample.gt_texts) and sample.gt_texts[0].ndim == 2 else 25
    out = {
        "valid": np.zeros((T, max_gt), bool),
        "labels": np.zeros((T, max_gt), np.int32),
        "ctrl_points": np.zeros((T, max_gt, num_points, 2), np.float32),
        "bd_points": np.zeros((T, max_gt, num_points, 4), np.float32),
        "texts": np.full((T, max_gt, t_len), voc_size, np.int32),
        "beziers": np.zeros((T, max_gt, 4, 2), np.float32),
    }
    for t in range(T):
        n = min(len(sample.gt_ctrl[t]), max_gt)
        for i in range(n):
            out["valid"][t, i] = True
            out["ctrl_points"][t, i] = sample.gt_ctrl[t][i] / wh
            # mapper holds the boundary as (2*npts, 2) point pairs; the loss
            # wants the dataset's (npts, 4) (top-xy, bottom-xy) rows
            out["bd_points"][t, i] = (
                sample.gt_boundary[t][i].reshape(num_points, 4)
                / np.concatenate([wh, wh])
            )
            out["texts"][t, i] = sample.gt_texts[t][i]
            out["beziers"][t, i] = sample.gt_beziers[t][i] / wh
    return out


class PretrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class SpotterPretrainer:
    """Full-model pretraining driver (no freezing).

    Single-device by construction; multi-chip pretraining shards clips through
    the same GSPMD pattern as ``__graft_entry__.dryrun_multichip`` (device_put
    the batch with a data sharding before ``step``)."""

    def __init__(self, cfg, model: Optional[SpotterPretrainModel] = None, params=None):
        self.cfg = cfg
        self.model = model if model is not None else build_pretrain_model(cfg)
        self.criterion = SpotterCriterion(cfg)

        # same optimizer construction as the tracker trainer: backbone/custom
        # LR groups, SGD/AdamW, schedule selection, full-model clip semantics
        # (build_optimizer, costom_solver.py parity)
        self.tx, self.schedule = build_optimizer(cfg)
        tx = self.tx
        if params is None:
            from .predictor import init_params

            params = init_params(self.model)
        self.use_drop_path = (
            cfg.MODEL.BACKBONE.NAME == "build_swin_backbone"
            and cfg.MODEL.SWIN.DROP_PATH_RATE > 0.0
        )
        self.state = PretrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        # two-phase on accelerators: the Hungarian LSAP runs on the host
        # BETWEEN two jits (cost forward -> solve -> loss+grad with fixed
        # matches) instead of as an in-graph pure_callback — the tunneled
        # axon TPU client supports no host callbacks, and a mid-graph
        # host sync is a pipeline bubble on any accelerator
        self.two_phase = jax.default_backend() != "cpu"
        self.pixel_mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
        self.pixel_std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
        self._step_fn = jax.jit(self._update)
        self._costs_fn = jax.jit(self._costs)

    # ------------------------------------------------------------------
    def _forward(self, params, images, image_hw, rng):
        if images.dtype == jnp.uint8:
            # raw uint8 wire format (TPU.TRAIN_UPLOAD_UINT8): normalize +
            # re-zero canvas padding in-graph (reference order,
            # gom_lstmatcher.py:159-169); static dtype gate, f32 path untouched
            from .train import normalize_wire_frames

            images = normalize_wire_frames(
                images, self.pixel_mean, self.pixel_std, image_hw
            )
        # drop-path (Swin) needs a 'dropout' rng and train=True; other backbones
        # have no train-time stochasticity so the deterministic path is identical
        if rng is not None:
            return self.model.apply(
                params, images, image_hw, True, rngs={"dropout": rng}
            )
        return self.model.apply(params, images, image_hw)

    def _loss(self, params, images, image_hw, targets, rng=None, matches=None):
        out = self._forward(params, images, image_hw, rng)
        # under GSPMD the batch arrays are globally sharded, so this sum already
        # spans all data shards — the explicit all_reduce of the reference
        # (losses.py:260-262) falls out of the programming model
        num_inst = jnp.sum(targets["valid"]).astype(jnp.float32)
        losses = self.criterion(
            out, targets, num_inst=jnp.maximum(num_inst, 1.0), matches=matches
        )
        total = sum(jax.tree.leaves(losses))
        return total, losses

    def _rng(self, state):
        return (
            jax.random.fold_in(jax.random.PRNGKey(23), state.step)
            if self.use_drop_path
            else None
        )

    def _costs(self, state: PretrainState, images, image_hw, targets):
        out = self._forward(state.params, images, image_hw, self._rng(state))
        return self.criterion.costs(out, targets)

    def _update(self, state: PretrainState, images, image_hw, targets, matches=None):
        (total, losses), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, images, image_hw, targets, self._rng(state), matches
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        losses["total_loss"] = total
        return PretrainState(params, opt_state, state.step + 1), losses

    def step(self, images: np.ndarray, targets: Dict, image_hw=None) -> Dict[str, float]:
        """One full-model training step; targets are the padded arrays described
        in ``SpotterCriterion.__call__``."""
        images = jnp.asarray(images)
        targets = jax.tree.map(jnp.asarray, targets)
        matches = None
        if self.two_phase:
            from .spotter_losses import _solve_padded

            costs = self._costs_fn(self.state, images, image_hw, targets)
            matches = {
                k: jnp.asarray(_solve_padded(np.asarray(c), np.asarray(nv)))
                for k, (c, nv) in costs.items()
            }
        self.state, losses = self._step_fn(
            self.state, images, image_hw, targets, matches
        )
        return {k: float(v) for k, v in losses.items()}
