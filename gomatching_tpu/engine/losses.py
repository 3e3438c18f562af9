"""Training losses for the GoMatching tracker head.

Parity targets:
  - rescore focal loss ``loss_res`` (lstmatcher.py:237-268) with the 4GM Hungarian
    matcher cost (matcher.py:158-198): focal class cost from re_pred_logits +
    L1 control-point cost;
  - association CE ``detr_asso_loss`` (lstmatcher.py:431-460) with
    NEG_UNMATCHED semantics, and the IoU-based GT construction ``_get_asso_gt``
    (lstmatcher.py:384-428).

Split of responsibilities: Hungarian matching and association-GT construction are
no-grad and tiny, so they run on host numpy; the differentiable losses are pure
fixed-shape JAX functions taking the matched indices / targets as dense arrays with
masks. ``num_inst`` normalization is psum'd over the data mesh axis by the caller.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hungarian import solve
from ..utils.boxes import pairwise_iou_np


# ---------------------------------------------------------------------------
# host-side matching (no-grad)
# ---------------------------------------------------------------------------


def match_rescore(
    re_logits: np.ndarray,  # (T, nq, npts, 1)
    pred_ctrl: np.ndarray,  # (T, nq, npts, 2) normalized
    gt_ctrl: list,  # per frame: (g_t, npts, 2) normalized
    class_weight: float = 1.0,
    coord_weight: float = 1.0,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> list:
    """4GM Hungarian per frame -> list of (query_idx, gt_idx)."""
    T, nq = re_logits.shape[:2]
    out = []
    for t in range(T):
        g = len(gt_ctrl[t])
        if g == 0:
            out.append((np.zeros(0, np.int64), np.zeros(0, np.int64)))
            continue
        prob = 1.0 / (1.0 + np.exp(-re_logits[t].reshape(nq, -1)))  # (nq, npts)
        neg = (1 - focal_alpha) * prob**focal_gamma * (-np.log(1 - prob + 1e-8))
        pos = focal_alpha * (1 - prob) ** focal_gamma * (-np.log(prob + 1e-8))
        cost_class = (pos - neg).mean(-1, keepdims=True)  # (nq, 1)
        a = pred_ctrl[t].reshape(nq, -1)
        b = np.asarray(gt_ctrl[t]).reshape(g, -1)
        cost_kpts = np.abs(a[:, None] - b[None, :]).sum(-1)  # (nq, g)
        C = class_weight * cost_class + coord_weight * cost_kpts
        out.append(solve(C))
    return out


def build_asso_targets(
    boxes: np.ndarray,  # (T, nq, 4) proposal boxes, normalized xyxy
    prop_valid: np.ndarray,  # (T, nq) bool
    gt_boxes: list,  # per frame (g_t, 4) normalized
    gt_ids: list,  # per frame (g_t,) instance ids (>0 tracked)
    max_tracks: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Association GT (lstmatcher.py:384-428) on the padded (T, nq) grid.

    Returns:
      asso_gt (K, T) int: per track the proposal slot in frame t (nq == background)
      match_cues (T, nq) int: track index k for matched proposal slots else -1
      track_valid (K,) bool
    """
    T, nq = prop_valid.shape
    inst_ids = np.unique(np.concatenate([np.asarray(g) for g in gt_ids])) if gt_ids else np.zeros(0)
    inst_ids = inst_ids[inst_ids > 0][:max_tracks]
    K = len(inst_ids)
    asso_gt = np.full((max_tracks, T), nq, np.int64)
    match_cues = np.full((T, nq), -1, np.int64)
    track_valid = np.zeros(max_tracks, bool)
    track_valid[:K] = True
    for k, iid in enumerate(inst_ids):
        for t in range(T):
            ids_t = np.asarray(gt_ids[t])
            sel = ids_t == iid
            if not sel.any():
                continue
            gb = np.asarray(gt_boxes[t])[sel]  # (1, 4)
            pv = prop_valid[t]
            if not pv.any():
                continue
            ious = pairwise_iou_np(boxes[t][pv], gb)[:, 0]
            j = int(np.argmax(ious))
            if ious[j] > 0.0:
                slot = np.where(pv)[0][j]
                asso_gt[k, t] = slot
                match_cues[t, slot] = k
    return asso_gt, match_cues, track_valid


# ---------------------------------------------------------------------------
# differentiable losses (jit)
# ---------------------------------------------------------------------------


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Elementwise focal loss (lstmatcher.py:26-57 numerics, no reduction)."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss


def optax_sigmoid_ce(logits, labels):
    # binary cross entropy with logits, elementwise
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def rescore_loss(
    re_logits: jnp.ndarray,  # (T, nq, npts, 1)
    match_mask: jnp.ndarray,  # (T, nq) 1.0 where matched to a gt
    num_inst: jnp.ndarray,  # scalar
    alpha: float = 0.25,
    gamma: float = 2.0,
):
    """loss_res: focal on the rescoring logits, matched slots positive
    (lstmatcher.py:248-268). Scaled by nq like the reference."""
    nq = re_logits.shape[1]
    tgt = jnp.broadcast_to(match_mask[:, :, None, None], re_logits.shape)
    loss = sigmoid_focal_loss(re_logits, tgt.astype(re_logits.dtype), alpha, gamma)
    loss = loss.mean(axis=(1, 2)).sum() / num_inst * nq
    return loss


def asso_ce_loss(
    asso_logits: jnp.ndarray,  # (M, T, nq) query rows vs per-frame slots
    row_valid: jnp.ndarray,  # (M,) bool - real query rows
    col_valid: jnp.ndarray,  # (T, nq) bool - real key slots
    asso_gt: jnp.ndarray,  # (K, T) slot index per track (nq = bg)
    match_cues: jnp.ndarray,  # (M,) track index per row or -1
    track_valid: jnp.ndarray,  # (K,) bool
    neg_unmatched: bool = True,
):
    """detr_asso_loss (lstmatcher.py:431-460) on the padded grid.

    For each frame t: softmax over that frame's slots + a zero background column;
    rows matched to track k target asso_gt[k, t], unmatched rows target background
    (NEG_UNMATCHED=True path, the shipped configs' setting).
    """
    M, T, nq = asso_logits.shape
    # per-frame logits with bg column; invalid slots masked to -inf
    neg_inf = jnp.asarray(-1e9, asso_logits.dtype)
    logits = jnp.where(col_valid[None, :, :], asso_logits, neg_inf)
    bg = jnp.zeros((M, T, 1), asso_logits.dtype)
    logits = jnp.concatenate([logits, bg], axis=-1)  # (M, T, nq+1)
    logp = jax.nn.log_softmax(logits, axis=-1)

    # target per (row, frame): asso_gt[match_cues[m], t] if matched else bg(nq)
    cue = jnp.clip(match_cues, 0, None)
    tgt = jnp.where(
        (match_cues >= 0)[:, None],
        asso_gt[cue],  # (M, T)
        jnp.full((M, T), nq, asso_gt.dtype),
    )
    if not neg_unmatched:
        # only matched rows contribute
        row_mask = (match_cues >= 0) & row_valid
    else:
        row_mask = row_valid
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]  # (M, T)
    nll = jnp.where(row_mask[:, None], nll, 0.0)
    num_objs = jnp.sum(jnp.where(row_mask[:, None], (tgt != nq).astype(jnp.float32), 0.0))
    return nll.sum() / (num_objs + 1e-4)
