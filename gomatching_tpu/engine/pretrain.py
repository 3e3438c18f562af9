"""DeepSolo spotter pretraining step (image text spotting).

Parity: the training side of ``TransformerPureDetector``
(third_party/adet/modeling/text_spotter.py:106-265): full-model AdamW with the
backbone LR multiplier (costom_solver.py:35-44), SetCriterion losses over
final + aux decoder layers + encoder proposals, full-model grad-norm clip.

SPMD: under a Mesh the step pmeans grads and the instance-count normalizer over
the 'data' axis (replacing DDP + the all_reduce at losses.py:260-262).
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


class PretrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class SpotterPretrainer:
    """Full-model pretraining driver (no freezing)."""

    def __init__(self, cfg, model: Optional[SpotterPretrainModel] = None, params=None, mesh=None):
        self.cfg = cfg
        self.model = model if model is not None else build_pretrain_model(cfg)
        self.criterion = SpotterCriterion(cfg)
        self.mesh = mesh

        solver = cfg.SOLVER
        schedule = warmup_cosine_schedule(
            solver.BASE_LR, solver.MAX_ITER, getattr(solver, "WARMUP_ITERS", 1000)
        )
        mult = solver.BACKBONE_MULTIPLIER

        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "backbone" if "backbone" in str(path[:2]) else "rest",
                params,
            )

        tx = optax.chain(
            optax.clip_by_global_norm(solver.CLIP_GRADIENTS.CLIP_VALUE)
            if solver.CLIP_GRADIENTS.ENABLED
            else optax.identity(),
            optax.multi_transform(
                {
                    "backbone": optax.adamw(
                        lambda s: schedule(s) * mult, weight_decay=solver.WEIGHT_DECAY
                    ),
                    "rest": optax.adamw(schedule, weight_decay=solver.WEIGHT_DECAY),
                },
                label_fn,
            ),
        )
        self.tx = tx
        if params is None:
            from .predictor import init_params

            params = init_params(self.model)
        self.state = PretrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        self._step_fn = jax.jit(self._update)

    # ------------------------------------------------------------------
    def _loss(self, params, images, image_hw, targets):
        out = self.model.apply(params, images, image_hw)
        # under GSPMD the batch arrays are globally sharded, so this sum already
        # spans all data shards — the explicit all_reduce of the reference
        # (losses.py:260-262) falls out of the programming model
        num_inst = jnp.sum(targets["valid"]).astype(jnp.float32)
        losses = self.criterion(out, targets, num_inst=jnp.maximum(num_inst, 1.0))
        total = sum(jax.tree.leaves(losses))
        return total, losses

    def _update(self, state: PretrainState, images, image_hw, targets):
        (total, losses), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, images, image_hw, targets
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        losses["total_loss"] = total
        return PretrainState(params, opt_state, state.step + 1), losses

    def step(self, images: np.ndarray, targets: Dict, image_hw=None) -> Dict[str, float]:
        """One full-model training step; targets are the padded arrays described
        in ``SpotterCriterion.__call__``."""
        self.state, losses = self._step_fn(
            self.state, jnp.asarray(images), image_hw, jax.tree.map(jnp.asarray, targets)
        )
        return {k: float(v) for k, v in losses.items()}
