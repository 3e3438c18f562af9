"""Axis-aligned box math, vectorized for XLA (no dynamic shapes).

Replaces the detectron2 ``Boxes`` / ``pairwise_iou`` / ``nms`` calls used by the
reference tracker (gomatching/modeling/meta_arch/gom_lstmatcher.py:321,:439-445) with
mask-aware fixed-shape equivalents.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pairwise_iou(boxes_a, boxes_b):
    """IoU between two sets of xyxy boxes -> (A, B). Degenerate boxes give 0."""
    area_a = jnp.clip(boxes_a[:, 2] - boxes_a[:, 0], 0) * jnp.clip(boxes_a[:, 3] - boxes_a[:, 1], 0)
    area_b = jnp.clip(boxes_b[:, 2] - boxes_b[:, 0], 0) * jnp.clip(boxes_b[:, 3] - boxes_b[:, 1], 0)
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def pairwise_iou_np(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`pairwise_iou` for the host-side tracker loop."""
    area_a = np.clip(boxes_a[:, 2] - boxes_a[:, 0], 0, None) * np.clip(boxes_a[:, 3] - boxes_a[:, 1], 0, None)
    area_b = np.clip(boxes_b[:, 2] - boxes_b[:, 0], 0, None) * np.clip(boxes_b[:, 3] - boxes_b[:, 1], 0, None)
    lt = np.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = np.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)
    return iou


def nms_mask(boxes, scores, valid, iou_threshold: float):
    """Fixed-shape class-agnostic NMS.

    Replaces detectron2.layers.nms (gom_lstmatcher.py:321). Instead of returning a
    dynamically-sized keep index list it returns a boolean keep mask over the fixed
    (N,) slot axis. Matches torchvision NMS semantics: boxes are processed in
    descending score order and a box is suppressed if it overlaps a *kept*
    higher-scoring box with IoU > threshold.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    boxes_sorted = boxes[order]
    valid_sorted = valid[order]
    iou = pairwise_iou(boxes_sorted, boxes_sorted)

    def body(i, keep):
        # suppressed if any kept earlier box overlaps > threshold
        sup = jnp.any((iou[i] > iou_threshold) & keep & (jnp.arange(n) < i))
        keep = keep.at[i].set(valid_sorted[i] & ~sup)
        return keep

    import jax

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), dtype=bool))
    # scatter back to the original slot order
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


def nms_np(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Host NMS returning kept indices in descending-score order (torchvision semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for idx in order:
        if suppressed[idx]:
            continue
        keep.append(idx)
        ious = pairwise_iou_np(boxes[idx : idx + 1], boxes[order]).ravel()
        suppressed[order[ious > iou_threshold]] = True
        suppressed[idx] = True
    return np.asarray(keep, dtype=np.int64)
