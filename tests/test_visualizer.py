"""Visualizer: polygon closure, stable colors, frame rendering round-trip."""

import numpy as np


def test_boundary_to_closed_polygon_order():
    from gomatching_tpu.evaluation.visualizer import boundary_to_closed_polygon

    bd = np.asarray([[0, 0, 0, 10], [5, 0, 5, 10], [10, 0, 10, 10]], np.float64)
    poly = boundary_to_closed_polygon(bd)
    assert poly.shape == (6, 2)
    np.testing.assert_array_equal(poly[:3], [[0, 0], [5, 0], [10, 0]])  # top l->r
    np.testing.assert_array_equal(poly[3:], [[10, 10], [5, 10], [0, 10]])  # bottom r->l


def test_track_color_stability():
    from gomatching_tpu.evaluation.visualizer import track_color

    assert track_color(3) == track_color(3)
    assert track_color(3) != track_color(4)


def test_draw_tracked_frame():
    from gomatching_tpu.evaluation.visualizer import draw_tracked_frame

    frame = np.zeros((64, 64, 3), np.uint8)
    bd = np.asarray([[5, 5, 5, 20], [30, 5, 30, 20]], np.float64)
    out = draw_tracked_frame(frame, [bd], [7], texts=["abc"])
    assert out.shape == frame.shape
    assert out.sum() > 0  # something was drawn
    assert frame.sum() == 0  # input untouched
