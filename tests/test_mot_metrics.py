"""MOT metric implementation tests: polygon IoU, CLEAR events, IDF1."""

import numpy as np

from gomatching_tpu.evaluation.mot_metrics import (
    MOTAccumulator,
    polygon_iou,
    quad_iou_matrix,
)


def quad(x, y, w, h):
    return np.asarray([x, y, x + w, y, x + w, y + h, x, y + h], np.float64)


def test_polygon_iou():
    a = quad(0, 0, 10, 10).reshape(4, 2)
    b = quad(5, 0, 10, 10).reshape(4, 2)
    assert abs(polygon_iou(a, a) - 1.0) < 1e-9
    assert abs(polygon_iou(a, b) - 50.0 / 150.0) < 1e-9
    c = quad(20, 20, 5, 5).reshape(4, 2)
    assert polygon_iou(a, c) == 0.0
    # rotated square fully inside
    d = np.asarray([[5, 1], [9, 5], [5, 9], [1, 5]], np.float64)
    expected = 32.0 / (100.0 + 32.0 - 32.0)
    assert abs(polygon_iou(a, d) - expected) < 1e-9


def test_perfect_tracking():
    acc = MOTAccumulator()
    for t in range(5):
        quads = np.stack([quad(t * 2, 0, 10, 10), quad(50, t, 10, 10)])
        acc.update([1, 2], quads, [7, 9], quads)
    m = acc.metrics()
    assert m["MOTA"] == 1.0
    assert m["IDF1"] == 1.0
    assert m["IDSW"] == 0
    assert m["MT"] == 2 and m["ML"] == 0


def test_id_switch_and_miss():
    acc = MOTAccumulator()
    g = np.stack([quad(0, 0, 10, 10)])
    # frames 1-2 matched to hyp 5, frames 3-4 to hyp 8 -> one switch
    acc.update([1], g, [5], g)
    acc.update([1], g, [5], g)
    acc.update([1], g, [8], g)
    acc.update([1], g, [8], g)
    # frame 5: miss + a far-away fp
    acc.update([1], g, [8], np.stack([quad(100, 100, 10, 10)]))
    m = acc.metrics()
    assert m["IDSW"] == 1
    assert m["FN"] == 1 and m["FP"] == 1
    assert abs(m["MOTA"] - (1 - 3 / 5)) < 1e-9
    # IDF1: best pairing covers 2 of 5 gt frames... hyp5:2, hyp8:2 -> idtp=2
    # sum_gt=5, sum_hyp=5 (4 + 1 fp) -> 2*2/10
    assert abs(m["IDF1"] - 0.4) < 1e-9


def test_sticky_matching_prevents_switch():
    """A closer new hyp must not steal a still-valid previous correspondence."""
    acc = MOTAccumulator()
    g = np.stack([quad(0, 0, 10, 10)])
    acc.update([1], g, [5], np.stack([quad(1, 0, 10, 10)]))
    # hyp 6 overlaps better, but hyp 5 still valid -> stays matched to 5
    acc.update([1], g, [5, 6], np.stack([quad(3, 0, 10, 10), quad(0, 0, 10, 10)]))
    assert acc.num_switches == 0
    assert acc.last_match[1] == 5
