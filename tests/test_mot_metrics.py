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


def test_poly_iou_matrix_mixed_vertex_counts():
    from gomatching_tpu.evaluation.mot_metrics import poly_iou_matrix

    quad = np.asarray([0, 0, 10, 0, 10, 10, 0, 10], np.float64)
    hexa = np.asarray([0, 0, 5, 0, 10, 0, 10, 10, 5, 10, 0, 10], np.float64)
    iou = poly_iou_matrix([quad], [hexa])
    assert abs(iou[0, 0] - 1.0) < 1e-6


def test_levenshtein_and_similarity():
    from gomatching_tpu.evaluation.mot_metrics import levenshtein, text_similarity

    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert text_similarity("abc", "abc") == 1.0
    assert 0.0 < text_similarity("abc", "abd") < 1.0


def test_evaluate_detection_hmean():
    from gomatching_tpu.evaluation.mot_metrics import evaluate_detection

    sq = lambda x, y, s=10: np.asarray([x, y, x + s, y, x + s, y + s, x, y + s], np.float64)
    frames = [
        # perfect match + one FP
        ([sq(0, 0)], ["word"], [sq(0, 0), sq(100, 100)]),
        # ignore region absorbs the pred inside it
        ([sq(0, 0), sq(50, 50)], ["word", "###"], [sq(0, 0), sq(50, 50)]),
        # miss
        ([sq(0, 0)], ["word"], []),
    ]
    d = evaluate_detection(frames, 0.5)
    assert d["num_gt"] == 3 and d["matched"] == 2
    assert d["num_det"] == 3  # FP + 2 matches; the ignored pred is excluded
    assert 0 < d["hmean"] < 1


def test_eval_tracking_cli(tmp_path):
    import subprocess
    import sys

    gt_dir = tmp_path / "gt"
    res_dir = tmp_path / "res"
    gt_dir.mkdir()
    res_dir.mkdir()
    xml = """<Frames>
  <frame ID="1">
    <object ID="1" Transcription="abc" Quality="HIGH">
      <Point x="0" y="0"/><Point x="20" y="0"/><Point x="20" y="10"/><Point x="0" y="10"/>
    </object>
  </frame>
  <frame ID="2">
    <object ID="1" Transcription="abc" Quality="HIGH">
      <Point x="2" y="0"/><Point x="22" y="0"/><Point x="22" y="10"/><Point x="2" y="10"/>
    </object>
  </frame>
</Frames>"""
    (gt_dir / "video_1.xml").write_text(xml)
    (res_dir / "res_video_1.xml").write_text(xml)
    out = subprocess.run(
        [sys.executable, "tools/eval_tracking.py", "--gt", str(gt_dir), "--res", str(res_dir)],
        capture_output=True, text=True, cwd=".",
    )
    assert out.returncode == 0, out.stderr
    assert "100.00%" in out.stdout  # perfect MOTA
    det = subprocess.run(
        [sys.executable, "tools/eval_tracking.py", "--gt", str(gt_dir), "--res", str(res_dir), "--det"],
        capture_output=True, text=True, cwd=".",
    )
    assert det.returncode == 0, det.stderr
    assert "hmean 100.00%" in det.stdout


def test_eval_tracking_artvideo_json_curve(tmp_path):
    import json
    import subprocess
    import sys

    gt_dir = tmp_path / "gt"
    res_dir = tmp_path / "res"
    gt_dir.mkdir()
    res_dir.mkdir()
    gt = {
        "frame": [{"height": 50, "width": 80}],
        "annotations": [
            {"frame_id": 1, "obj_id": 1, "text_type": "Curve",
             "point": [0, 0, 20, 0, 20, 10, 0, 10], "transcription": "abc"},
            {"frame_id": 1, "obj_id": 2, "text_type": "Straight",
             "point": [40, 0, 60, 0, 60, 10, 40, 10], "transcription": "def"},
        ],
    }
    (gt_dir / "video_9.json").write_text(json.dumps(gt))
    xml = """<Frames><frame ID="1">
      <object ID="5" Transcription="abc">
        <Point x="0" y="0"/><Point x="20" y="0"/><Point x="20" y="10"/><Point x="0" y="10"/>
      </object></frame></Frames>"""
    (res_dir / "res_video_9.xml").write_text(xml)
    out = subprocess.run(
        [sys.executable, "tools/eval_tracking.py", "--gt", str(gt_dir),
         "--res", str(res_dir), "--curve"],
        capture_output=True, text=True, cwd=".",
    )
    assert out.returncode == 0, out.stderr
    # only the curved instance counts; it is matched -> perfect MOTA
    assert "100.00%" in out.stdout
