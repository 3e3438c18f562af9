"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest


def test_polygon_iou_concave():
    """Sutherland-Hodgman needs a convex clip; concave operands must take the
    rasterized path and agree in both argument orders."""
    from gomatching_tpu.evaluation.mot_metrics import polygon_iou

    # U-shaped (concave) polygon: 4x4 square minus a 2x3 notch from the top
    u = np.asarray(
        [[0, 0], [4, 0], [4, 4], [3, 4], [3, 1], [1, 1], [1, 4], [0, 4]], np.float64
    )
    bar = np.asarray([[0, 2], [4, 2], [4, 3], [0, 3]], np.float64)  # crosses the notch
    # true intersection: two 1x1 squares = 2; union = 10 + 4 - 2 = 12
    i1 = polygon_iou(bar, u)
    i2 = polygon_iou(u, bar)
    assert abs(i1 - 2 / 12) < 0.02, i1
    assert abs(i1 - i2) < 1e-6


def test_mot_accumulator_no_double_match():
    """Two GTs whose last_match points at the same hypothesis must not both
    claim it (previously produced MOTA > 1 and negative FP)."""
    from gomatching_tpu.evaluation.mot_metrics import MOTAccumulator

    sq = lambda x: np.asarray([x, 0, x + 10, 0, x + 10, 10, x, 10], np.float64)
    acc = MOTAccumulator()
    acc.update(["A"], [sq(0)], ["X"], [sq(0)])
    acc.update(["B"], [sq(0)], ["X"], [sq(0)])  # B inherits X
    # both A and B present, one X overlapping both
    acc.update(["A", "B"], [sq(0), sq(1)], ["X"], [sq(0)])
    m = acc.metrics()
    assert acc.num_fp >= 0
    assert m["MOTA"] <= 1.0 + 1e-9


def test_ctc_infeasible_zeroed_like_torch():
    """Targets needing more frames than T (length + adjacent repeats) must
    contribute zero, matching torch zero_infinity=True."""
    import jax.numpy as jnp

    from gomatching_tpu.engine.spotter_losses import ctc_cost_matrix, loss_texts

    rng = np.random.RandomState(0)
    voc, T = 10, 4
    logits = rng.randn(2, T, voc + 1).astype(np.float32)
    texts = np.full((2, T), voc, np.int64)
    texts[0, :4] = [1, 1, 2, 2]  # needs 4 + 2 repeats = 6 > T=4 -> infeasible
    texts[1, :2] = [3, 4]  # feasible

    cost = np.asarray(ctc_cost_matrix(jnp.asarray(logits), jnp.asarray(texts), voc))
    assert np.all(cost[:, 0] == 0.0)
    assert np.all(np.isfinite(cost)) and np.all(cost[:, 1] > 0)

    tl = np.broadcast_to(logits[None], (1, 2, T, voc + 1))
    loss = float(
        loss_texts(
            jnp.asarray(tl), jnp.asarray(texts[None]), jnp.asarray([[0, 1]]), voc
        )
    )
    assert np.isfinite(loss) and loss < 1e4


def test_deform_attn_width_one_level():
    """A 1-wide pyramid level must keep zero-padding semantics (no cross-level
    leak, no phantom +x corner weight); oracle = torch grid_sample."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from gomatching_tpu.ops.deform_attn import ms_deform_attn_core

    shapes = [(4, 6), (3, 1)]  # second level is 1 wide
    S = sum(h * w for h, w in shapes)
    B, M, D, L, P = 1, 2, 4, 2, 3
    rng = np.random.RandomState(1)
    value = rng.randn(B, S, M, D).astype(np.float32)
    loc = rng.uniform(-0.2, 1.2, (B, 5, M, L, P, 2)).astype(np.float32)
    w = rng.rand(B, 5, M, L * P).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    w = w.reshape(B, 5, M, L, P)

    got = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    )

    # torch grid_sample oracle
    out = torch.zeros(B, 5, M, D)
    start = 0
    for lvl, (h, wd) in enumerate(shapes):
        v = (
            torch.from_numpy(value[:, start : start + h * wd])
            .permute(0, 2, 3, 1)
            .reshape(B * M, D, h, wd)
        )
        g = torch.from_numpy(loc[:, :, :, lvl]) * 2 - 1
        g = g.permute(0, 2, 1, 3, 4).reshape(B * M, 5, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        a = torch.from_numpy(w[:, :, :, lvl]).permute(0, 2, 1, 3)
        out += (s.view(B, M, D, 5, P) * a[:, :, None]).sum(-1).permute(0, 3, 1, 2)
        start += h * wd
    expected = out.reshape(B, 5, M * D).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_detection_greedy_strict_threshold():
    """Exactly-at-threshold IoU must NOT match (official protocols use >)."""
    from gomatching_tpu.evaluation.mot_metrics import evaluate_detection

    g = np.asarray([0, 0, 10, 0, 10, 10, 0, 10], np.float64)
    # IoU exactly 0.5: same height, half-overlapping width handled via a box
    # covering the left half -> inter 50, union 100
    p = np.asarray([0, 0, 5, 0, 5, 10, 0, 10], np.float64)
    d = evaluate_detection([([g], ["w"], [p])], iou_threshold=0.5)
    assert d["matched"] == 0
