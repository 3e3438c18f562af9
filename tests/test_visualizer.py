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


def test_draw_tracked_frame_unicode_labels():
    """Non-ASCII transcriptions (BOVText Chinese) take the PIL font pass when a
    Unicode font exists (reference: draw_chinese + ./simsun.ttc,
    text_track_visualizer.py:236-251); rendering must still draw something and
    leave the input untouched."""
    from gomatching_tpu.evaluation.visualizer import (
        draw_tracked_frame,
        find_label_font,
    )

    frame = np.zeros((64, 64, 3), np.uint8)
    bd = np.asarray([[5, 25, 5, 40], [50, 25, 50, 40]], np.float64)
    out = draw_tracked_frame(frame, [bd], [2], texts=["中文"])
    assert out.shape == frame.shape
    assert out.sum() > 0
    assert frame.sum() == 0
    # this image has at least DejaVu; discovery must find a real file
    font = find_label_font()
    if font is not None:
        import os

        assert os.path.exists(font)


def test_label_font_env_override(monkeypatch, tmp_path):
    from gomatching_tpu.evaluation import visualizer

    fake = tmp_path / "f.ttf"
    fake.write_bytes(b"not a real font")
    monkeypatch.setenv("GOMATCHING_LABEL_FONT", str(fake))
    assert visualizer.find_label_font() == str(fake)
    # unparseable font -> PIL loader returns None (Hershey fallback, no crash)
    assert visualizer._pil_font(14) is None
