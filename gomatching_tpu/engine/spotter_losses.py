"""DeepSolo spotter pretraining criterion (SetCriterion equivalent) — TPU-native.

Parity targets:
  - losses: third_party/adet/modeling/model/losses.py:10-296 (focal point-class
    loss, CTC text loss with the '###'-ignore rule, ctrl-point / boundary L1,
    sampled-Bezier L1; aux-layer and encoder loss loops :272-295, distributed
    num_inst normalization :258-262)
  - matchers: third_party/adet/modeling/model/matcher.py:11-156
    (CtrlPointHungarianMatcher with per-(query,gt) CTC cost matrix;
    BezierHungarianMatcher over the encoder token proposals)
  - weights/loss lists: third_party/adet/modeling/text_spotter.py:133-178

TPU design: targets are fixed-shape padded arrays (B, G, ...) with a validity
mask; all cost matrices are computed on device (the CTC cost matrix batches
nq x G optax.ctc_loss evaluations instead of the reference's per-pair CPU
loop); only the LSAP solve itself goes to the host via ``pure_callback``
(scipy, as in the reference). The match is represented as ``gt_of_query``
(B, nq) int32 with -1 for unmatched — everything downstream is gather + mask,
no ragged tensors.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.spotter import bernstein_matrix
from ..ops import hungarian

UNK_INDEX = 36  # the reference hardcodes 36 for the '###' ignore rule
# (losses.py:185, matcher.py:67) regardless of VOC_SIZE


def _ctc_feasible(labels: jnp.ndarray, lengths: jnp.ndarray, T: int) -> jnp.ndarray:
    """CTC alignment feasibility: T >= L + #adjacent-repeats (a repeat needs a
    blank between its frames). Infeasible pairs get +inf loss from CTC; the
    reference zeroes them via torch's zero_infinity=True (losses.py:177,
    matcher.py:55-62) — optax has no such flag, so mask explicitly.

    labels: (..., N) with padding already replaced by a valid index;
    lengths: (...,) true label lengths."""
    N = labels.shape[-1]
    pos = jnp.arange(1, N)
    rep = (labels[..., 1:] == labels[..., :-1]) & (pos < lengths[..., None])
    need = lengths + jnp.sum(rep, axis=-1)
    return need <= T


# ---------------------------------------------------------------------------
# assignment
# ---------------------------------------------------------------------------
def _solve_padded(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Host LSAP on a padded (B, nq, G) cost; returns gt_of_query (B, nq), -1 pad."""
    B, nq, G = cost.shape
    out = np.full((B, nq), -1, np.int32)
    for b in range(B):
        g = int(n_valid[b])
        if g == 0:
            continue
        r, c = hungarian.solve(np.asarray(cost[b, :, :g], np.float64))
        out[b, r] = c
    return out


def assign(cost: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """pure_callback wrapper: (B, nq, G) cost + (B,) #valid-gts -> (B, nq) match."""
    B, nq, _ = cost.shape
    # matching is not differentiated (reference: torch.no_grad, matcher.py:28);
    # stop_gradient also keeps JVP away from the host callback
    cost = jax.lax.stop_gradient(cost)
    cost = jnp.nan_to_num(cost, nan=1e9, posinf=1e9, neginf=-1e9)
    return jax.pure_callback(
        _solve_padded,
        jax.ShapeDtypeStruct((B, nq), jnp.int32),
        cost,
        n_valid,
        vmap_method="sequential",
    )


# ---------------------------------------------------------------------------
# cost pieces
# ---------------------------------------------------------------------------
def focal_class_cost(prob: jnp.ndarray, alpha: float, gamma: float) -> jnp.ndarray:
    """pos_cost - neg_cost of the focal matching cost (matcher.py:85-90).
    ``prob``: sigmoid class probabilities, any shape."""
    neg = (1 - alpha) * (prob**gamma) * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    return pos - neg


def ctc_cost_matrix(
    text_logits: jnp.ndarray,  # (nq, T, K) raw logits, K = voc+1 (blank last)
    texts: jnp.ndarray,  # (G, T) int32, padded with voc
    voc_size: int,
) -> jnp.ndarray:
    """(nq, G) CTC cost, averaged by target length, with the '###' rule zeroed.

    Replaces the reference's per-image CPU loop (matcher.py:44-78) with one
    batched optax.ctc_loss over all nq x G pairs.
    """
    nq, T, K = text_logits.shape
    G, Tl = texts.shape  # label length is independent of the logit length
    lengths = jnp.sum(texts != voc_size, axis=-1)  # (G,)

    logits = jnp.broadcast_to(text_logits[:, None], (nq, G, T, K)).reshape(nq * G, T, K)
    labels = jnp.broadcast_to(texts[None], (nq, G, Tl)).reshape(nq * G, Tl)
    label_pad = (labels == voc_size).astype(jnp.float32)
    # optax requires labels to be valid indices even when padded
    labels = jnp.where(labels == voc_size, 0, labels)
    logit_pad = jnp.zeros((nq * G, T), jnp.float32)
    loss = optax.ctc_loss(logits, logit_pad, labels, label_pad, blank_id=voc_size)
    loss = loss.reshape(nq, G)

    ignore = (lengths == 1) & (texts[:, 0] == UNK_INDEX)  # '###' instances
    empty = lengths == 0
    feasible = _ctc_feasible(
        jnp.where(texts == voc_size, 0, texts), lengths, T
    )  # zero_infinity semantics
    loss = jnp.where((ignore | empty | ~feasible)[None, :], 0.0, loss)
    return loss / jnp.maximum(lengths, 1)[None, :]


# ---------------------------------------------------------------------------
# matchers
# ---------------------------------------------------------------------------
def match_ctrl_points_cost(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    voc_size: int,
    class_weight: float,
    coord_weight: float,
    text_weight: float,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Decoder Hungarian match (CtrlPointHungarianMatcher, matcher.py:11-97).

    Returns the padded (B, nq, G) cost matrix + (B,) valid-gt counts; feed
    to ``assign`` (in-graph callback) or solve on the host (two-phase step).
    """
    logits = outputs["pred_logits"].astype(jnp.float32)  # (B, nq, npts, 1)
    prob = jax.nn.sigmoid(logits)
    # class cost: mean over points of (pos - neg) focal terms (matcher.py:88-90)
    cost_class = jnp.mean(focal_class_cost(prob, alpha, gamma)[..., 0], axis=-1)  # (B, nq)

    out_pts = outputs["pred_ctrl_points"].astype(jnp.float32)  # (B, nq, npts, 2)
    tgt_pts = targets["ctrl_points"].astype(jnp.float32)  # (B, G, npts, 2)
    B, nq = out_pts.shape[:2]
    G = tgt_pts.shape[1]
    cost_kpts = jnp.sum(
        jnp.abs(
            out_pts.reshape(B, nq, 1, -1) - tgt_pts.reshape(B, 1, G, -1)
        ),
        axis=-1,
    )  # (B, nq, G)

    cost_text = jax.vmap(partial(ctc_cost_matrix, voc_size=voc_size))(
        outputs["pred_text_logits"].astype(jnp.float32), targets["texts"]
    )  # (B, nq, G)

    C = class_weight * cost_class[..., None] + coord_weight * cost_kpts + text_weight * cost_text
    C = jnp.where(targets["valid"][:, None, :], C, 1e9)
    return C, jnp.sum(targets["valid"], axis=1)


def match_beziers_cost(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    num_sample_points: int,
    class_weight: float,
    coord_weight: float,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Encoder-proposal Hungarian match (BezierHungarianMatcher, matcher.py:100-156).

    outputs: enc_logits (B, S, 1), enc_beziers (B, S, 8) (sigmoided).
    Returns the padded (B, S, G) cost matrix + (B,) valid-gt counts.
    """
    prob = jax.nn.sigmoid(outputs["enc_logits"].astype(jnp.float32))[..., 0]  # (B, S)
    cost_class = focal_class_cost(prob, alpha, gamma)  # labels are all class 0

    bern = jnp.asarray(bernstein_matrix(num_sample_points))  # (nsp, 4)
    out_bez = outputs["enc_beziers"].astype(jnp.float32)
    B, S, _ = out_bez.shape
    G = targets["beziers"].shape[1]
    out_s = jnp.einsum("pk,bskc->bspc", bern, out_bez.reshape(B, S, 4, 2))
    tgt_s = jnp.einsum("pk,bgkc->bgpc", bern, targets["beziers"].astype(jnp.float32))
    cost_coord = jnp.sum(
        jnp.abs(out_s.reshape(B, S, 1, -1) - tgt_s.reshape(B, 1, G, -1)), axis=-1
    )

    C = class_weight * cost_class[..., None] + coord_weight * cost_coord
    C = jnp.where(targets["valid"][:, None, :], C, 1e9)
    return C, jnp.sum(targets["valid"], axis=1)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------
def _sigmoid_focal(inputs, target01, alpha, gamma):
    prob = jax.nn.sigmoid(inputs)
    ce = optax.sigmoid_binary_cross_entropy(inputs, target01)
    p_t = prob * target01 + (1 - prob) * (1 - target01)
    loss = ce * ((1 - p_t) ** gamma)
    alpha_t = alpha * target01 + (1 - alpha) * (1 - target01)
    return alpha_t * loss


def loss_labels(logits, gt_of_query, num_inst, alpha=0.25, gamma=2.0):
    """Focal class loss (losses.py:87-118): matched queries' points positive.

    logits: (B, nq, npts, 1) or (B, S, 1) for the encoder variant."""
    matched = (gt_of_query >= 0).astype(logits.dtype)  # (B, nq)
    if logits.ndim == 4:
        target = jnp.broadcast_to(matched[:, :, None, None], logits.shape)
        loss = _sigmoid_focal(logits.astype(jnp.float32), target, alpha, gamma)
        # mean over (nq, npts), sum over batch, x nq (losses.py:36-38, :117)
        return jnp.mean(loss, axis=(1, 2)).sum() / num_inst * logits.shape[1]
    target = jnp.broadcast_to(matched[:, :, None], logits.shape)
    loss = _sigmoid_focal(logits.astype(jnp.float32), target, alpha, gamma)
    return jnp.mean(loss, axis=1).sum() / num_inst * logits.shape[1]


def _gather_gt(tgt, gt_of_query):
    """tgt (B, G, ...) gathered to (B, nq, ...) via gt_of_query (B, nq), 0 when -1."""
    idx = jnp.maximum(gt_of_query, 0)
    return jnp.take_along_axis(
        tgt, idx.reshape(idx.shape + (1,) * (tgt.ndim - 2)), axis=1
    )


def loss_ctrl_points(pred, tgt, gt_of_query, num_inst):
    """Matched L1, summed, / num_inst (losses.py:202-211)."""
    g = _gather_gt(tgt.astype(jnp.float32), gt_of_query)
    mask = (gt_of_query >= 0).reshape(gt_of_query.shape + (1,) * (pred.ndim - 2))
    l1 = jnp.abs(pred.astype(jnp.float32) - g) * mask
    return jnp.sum(l1) / num_inst


def loss_texts(text_logits, texts, gt_of_query, voc_size):
    """CTC over matched pairs, mean over matched instances (losses.py:152-191)."""
    B, nq, T, K = text_logits.shape
    Tl = texts.shape[-1]  # label length is independent of the logit length
    g_texts = _gather_gt(texts, gt_of_query)  # (B, nq, Tl)
    flat_logits = text_logits.astype(jnp.float32).reshape(B * nq, T, K)
    flat_texts = g_texts.reshape(B * nq, Tl)
    lengths = jnp.sum(flat_texts != voc_size, axis=-1)
    label_pad = (flat_texts == voc_size).astype(jnp.float32)
    labels = jnp.where(flat_texts == voc_size, 0, flat_texts)
    losses = optax.ctc_loss(
        flat_logits, jnp.zeros((B * nq, T), jnp.float32), labels, label_pad, blank_id=voc_size
    )
    matched = (gt_of_query >= 0).reshape(B * nq)
    ignore = (lengths == 1) & (flat_texts[:, 0] == UNK_INDEX)
    feasible = _ctc_feasible(labels, lengths, T)  # zero_infinity semantics
    keep = matched & ~ignore & (lengths > 0) & feasible
    # reference: loss_texts = mean over all matched pairs, with ignored pairs
    # contributing zero to the numerator but still counted (losses.py:190-191)
    n = jnp.maximum(jnp.sum(matched), 1)
    return jnp.sum(jnp.where(keep, losses, 0.0)) / n


def loss_beziers(enc_beziers, tgt_beziers, gt_of_token, num_inst, num_sample_points):
    """L1 on curve-sampled points of matched encoder proposals (losses.py:120-136)."""
    bern = jnp.asarray(bernstein_matrix(num_sample_points))
    B, S, _ = enc_beziers.shape
    g = _gather_gt(tgt_beziers.astype(jnp.float32), gt_of_token)  # (B, S, 4, 2)
    pred_s = jnp.einsum("pk,bskc->bspc", bern, enc_beziers.astype(jnp.float32).reshape(B, S, 4, 2))
    tgt_s = jnp.einsum("pk,bskc->bspc", bern, g)
    mask = (gt_of_token >= 0)[..., None, None]
    return jnp.sum(jnp.abs(pred_s - tgt_s) * mask) / num_inst


# ---------------------------------------------------------------------------
# criterion
# ---------------------------------------------------------------------------
class SpotterCriterion:
    """Full pretraining criterion: dec losses on the final + aux decoder layers,
    enc losses on the two-stage proposals (losses.py:250-297)."""

    def __init__(self, cfg):
        t = cfg.MODEL.TRANSFORMER
        lw = t.LOSS
        self.voc_size = t.VOC_SIZE
        self.alpha = lw.FOCAL_ALPHA
        self.gamma = lw.FOCAL_GAMMA
        self.num_sample_points = lw.BEZIER_SAMPLE_POINTS
        self.boundary = t.BOUNDARY_HEAD
        self.aux = lw.AUX_LOSS
        self.weights = {
            "loss_ce": lw.POINT_CLASS_WEIGHT,
            "loss_texts": lw.POINT_TEXT_WEIGHT,
            "loss_ctrl_points": lw.POINT_COORD_WEIGHT,
            "loss_bd_points": lw.BOUNDARY_WEIGHT,
            "loss_bezier_enc": lw.BEZIER_COORD_WEIGHT,
            "loss_ce_enc": lw.BEZIER_CLASS_WEIGHT,
        }
        self.match_class_w = lw.POINT_CLASS_WEIGHT
        self.match_coord_w = lw.POINT_COORD_WEIGHT
        self.match_text_w = lw.POINT_TEXT_WEIGHT
        self.enc_class_w = lw.BEZIER_CLASS_WEIGHT
        self.enc_coord_w = lw.BEZIER_COORD_WEIGHT

    def _dec_cost(self, out, targets):
        return match_ctrl_points_cost(
            out, targets, self.voc_size,
            self.match_class_w, self.match_coord_w, self.match_text_w,
            self.alpha, self.gamma,
        )

    def costs(self, outputs: Dict, targets: Dict) -> Dict[str, tuple]:
        """All Hungarian cost matrices of one step, keyed like the matches
        dict ``__call__`` accepts: 'dec', 'aux_<i>', 'enc'. Lets a host-side
        driver solve the LSAPs outside the jit (two-phase step — the axon
        TPU client supports no in-graph host callbacks)."""
        cs = {"dec": self._dec_cost(outputs, targets)}
        if self.aux:
            for i, aux in enumerate(outputs.get("aux_outputs", ())):
                cs[f"aux_{i}"] = self._dec_cost(aux, targets)
        if "enc_logits" in outputs:
            enc = {"enc_logits": outputs["enc_logits"], "enc_beziers": outputs["enc_beziers"]}
            cs["enc"] = match_beziers_cost(
                enc, targets, self.num_sample_points,
                self.enc_class_w, self.enc_coord_w, self.alpha, self.gamma,
            )
        return cs

    def _dec_losses(self, out, targets, num_inst, suffix="", gt_of_q=None):
        if gt_of_q is None:
            gt_of_q = assign(*self._dec_cost(out, targets))
        gt_of_q = jax.lax.stop_gradient(gt_of_q)
        d = {
            f"loss_ce{suffix}": self.weights["loss_ce"]
            * loss_labels(out["pred_logits"], gt_of_q, num_inst, self.alpha, self.gamma),
            f"loss_texts{suffix}": self.weights["loss_texts"]
            * loss_texts(out["pred_text_logits"], targets["texts"], gt_of_q, self.voc_size),
            f"loss_ctrl_points{suffix}": self.weights["loss_ctrl_points"]
            * loss_ctrl_points(out["pred_ctrl_points"], targets["ctrl_points"], gt_of_q, num_inst),
        }
        if self.boundary and out.get("pred_bd_points") is not None:
            d[f"loss_bd_points{suffix}"] = self.weights["loss_bd_points"] * loss_ctrl_points(
                out["pred_bd_points"], targets["bd_points"], gt_of_q, num_inst
            )
        return d

    def __call__(
        self, outputs: Dict, targets: Dict, num_inst: Optional[jnp.ndarray] = None,
        matches: Optional[Dict] = None,
    ) -> Dict[str, jnp.ndarray]:
        """targets: labels/valid (B, G), ctrl_points (B, G, npts, 2),
        texts (B, G, T), beziers (B, G, 4, 2), bd_points (B, G, npts, 4).

        num_inst: pre-reduced instance count (pass psum(valid)/world over the data
        mesh for the distributed normalization, losses.py:258-262); defaults to
        the local count.

        matches: optional pre-solved assignments keyed like ``costs`` — the
        two-phase step supplies them; None = in-graph host callback."""
        if num_inst is None:
            num_inst = jnp.sum(targets["valid"]).astype(jnp.float32)
        num_inst = jnp.maximum(num_inst, 1.0)
        m = matches or {}

        losses = self._dec_losses(outputs, targets, num_inst, gt_of_q=m.get("dec"))
        if self.aux:
            for i, aux in enumerate(outputs.get("aux_outputs", ())):
                losses.update(
                    self._dec_losses(aux, targets, num_inst, suffix=f"_{i}",
                                     gt_of_q=m.get(f"aux_{i}"))
                )
        if "enc_logits" in outputs:
            enc = {"enc_logits": outputs["enc_logits"], "enc_beziers": outputs["enc_beziers"]}
            gt_of_tok = m.get("enc")
            if gt_of_tok is None:
                gt_of_tok = assign(
                    *match_beziers_cost(
                        enc, targets, self.num_sample_points,
                        self.enc_class_w, self.enc_coord_w, self.alpha, self.gamma,
                    )
                )
            gt_of_tok = jax.lax.stop_gradient(gt_of_tok)
            losses["loss_ce_enc"] = self.weights["loss_ce_enc"] * loss_labels(
                outputs["enc_logits"], gt_of_tok, num_inst, self.alpha, self.gamma
            )
            losses["loss_bezier_enc"] = self.weights["loss_bezier_enc"] * loss_beziers(
                outputs["enc_beziers"], targets["beziers"], gt_of_tok, num_inst,
                self.num_sample_points,
            )
        return losses
