"""Cross-validate our BOVText scoring against the OFFICIAL protocol scripts.

Runs the reference's Task1 (tracking) and Task2 (e2e spotting) evaluators
(/root/reference/tools/Evaluation_Protocol_BOV_Text/*/evaluation.py) verbatim
on synthetic videos, with two tiny import facades for packages absent here:
shapely (convex-quad IoU — reimplemented exactly: convex hull + polygon
clipping + shoelace area) and Levenshtein (edit distance). Our scorer
(MOTAccumulator with match_lowest_iou + the bovtext similarity rule) must
produce identical MOTA/IDF1/IDSW/FP/FN per video.
"""

import importlib.util
import json
import sys
import types

import numpy as np
import pytest

BOV = "/root/reference/tools/Evaluation_Protocol_BOV_Text"


# ---------------------------------------------------------------------------
# facades
# ---------------------------------------------------------------------------
def _hull(pts):
    pts = sorted({(float(x), float(y)) for x, y in pts})
    if len(pts) <= 2:
        return np.asarray(pts, float)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower, upper = [], []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.asarray(lower[:-1] + upper[:-1], float)


def _shoelace(p):
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _clip(subject, clip_poly):
    # Sutherland-Hodgman, both convex CCW
    out = list(subject)
    n = len(clip_poly)
    for i in range(n):
        a, b = clip_poly[i], clip_poly[(i + 1) % n]
        inp, out = out, []
        if not inp:
            break
        for j in range(len(inp)):
            cur, prev = inp[j], inp[j - 1]
            side_cur = (b[0] - a[0]) * (cur[1] - a[1]) - (b[1] - a[1]) * (cur[0] - a[0])
            side_prev = (b[0] - a[0]) * (prev[1] - a[1]) - (b[1] - a[1]) * (prev[0] - a[0])
            if side_cur >= 0:
                if side_prev < 0:
                    out.append(_isect(prev, cur, a, b))
                out.append(cur)
            elif side_prev >= 0:
                out.append(_isect(prev, cur, a, b))
    return np.asarray(out, float) if out else np.zeros((0, 2))


def _isect(p1, p2, a, b):
    x1, y1 = p1
    x2, y2 = p2
    x3, y3 = a
    x4, y4 = b
    den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
    return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))


class _FakePoly:
    def __init__(self, pts):
        self._pts = np.asarray(pts, float)

    @property
    def convex_hull(self):
        return _FakePoly(_hull(self._pts))

    @property
    def area(self):
        return _shoelace(self._pts) if len(self._pts) >= 3 else 0.0

    def intersects(self, other):
        return self.intersection(other).area > 0

    def intersection(self, other):
        return _FakePoly(_clip(self._pts, other._pts))


@pytest.fixture(scope="module")
def official():
    shapely = types.ModuleType("shapely")
    geom = types.ModuleType("shapely.geometry")
    geom.Polygon = _FakePoly
    geom.MultiPoint = object
    shapely.geometry = geom
    lev = types.ModuleType("Levenshtein")
    from gomatching_tpu.evaluation.mot_metrics import levenshtein

    lev.distance = levenshtein
    # the scripts use numpy aliases removed in modern numpy
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    if not hasattr(np, "asfarray"):
        np.asfarray = lambda a: np.asarray(a, dtype=float)
    sys.modules.update(
        {"shapely": shapely, "shapely.geometry": geom, "Levenshtein": lev}
    )
    sys.modules.setdefault("xmltodict", types.ModuleType("xmltodict"))
    # the vendored motmetrics copies are identical; reuse whichever is loaded
    mods = {}
    for task, name in (("Task1_VideoTextTracking", "bov_eval1"),
                       ("Task2_VideoTextSpotting", "bov_eval2")):
        path = f"{BOV}/{task}"
        sys.path.insert(0, path)
        for stale in ("tracking_utils", "tracking_utils.io"):
            sys.modules.pop(stale, None)
        spec = importlib.util.spec_from_file_location(name, f"{path}/evaluation.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mods[task] = mod
        sys.path.remove(path)
    return mods


# ---------------------------------------------------------------------------
# synthetic videos in the official json format
# ---------------------------------------------------------------------------
def _quad(x, y, w=30, h=14):
    return [x, y, x + w, y, x + w, y + h, x, y + h]


def make_video(seed, n_frames=8):
    rng = np.random.RandomState(seed)
    words = ["hello", "world", "text", "jax", "tpu"]
    gt, res = {}, {}
    for f in range(1, n_frames + 1):
        g, r = [], []
        for t in range(4):
            if rng.rand() < 0.15:
                continue
            x, y = 10 + 90 * (t % 2) + 2 * f, 10 + 40 * (t // 2) + f
            word = words[t]
            # Task1 reads GT 'transcription', Task2 reads GT 'ID_transcription'
            g.append({"points": _quad(x, y), "ID": t + 1, "transcription": word,
                      "ID_transcription": word})
            p = rng.rand()
            if p < 0.65:  # good hyp, mostly right id / right text
                r.append({
                    "points": _quad(x + int(rng.randint(-2, 3)), y + int(rng.randint(-2, 3))),
                    "ID": (t + 1) if rng.rand() < 0.8 else 50 + t,
                    "transcription": word if rng.rand() < 0.7 else word[:-1] + "x",
                })
            elif p < 0.8:  # displaced
                r.append({"points": _quad(x + 60, y + 30), "ID": t + 1,
                          "transcription": word})
        # an ignore region + a hyp inside it (must be filtered, not counted FP)
        g.append({"points": _quad(200, 90), "ID": 99, "transcription": "###",
                  "ID_transcription": "###"})
        if rng.rand() < 0.5:
            r.append({"points": _quad(201, 91), "ID": 77, "transcription": "zzz"})
        if rng.rand() < 0.3:  # spurious FP in the open
            r.append({"points": _quad(5, 95), "ID": 88, "transcription": "spur"})
        gt[str(f)] = g
        res[str(f)] = r
    return gt, res


def _run_official(mod, gt, res, tmp_path, tag, e2e):
    gt_dir = tmp_path / f"gt_{tag}"
    (gt_dir / "Cls1_Test").mkdir(parents=True, exist_ok=True)
    # Evaluator.load_annotations maps 'Cls1_Test_videoK' -> Cls1_Test/Cls1_Test_videoK
    vname = f"Cls1_Test_video{tag}"
    (gt_dir / "Cls1_Test" / vname).write_text(json.dumps(gt))
    res_path = tmp_path / f"res_{tag}.json"
    res_path.write_text(json.dumps(res))
    ev = mod.Evaluator(str(gt_dir), vname, "text")
    acc = ev.eval_file(str(res_path))
    import motmetrics as mm

    mh = mm.metrics.create()
    s = mh.compute(acc, metrics=["mota", "idf1", "num_switches",
                                 "num_false_positives", "num_misses"], name="x")
    return s.iloc[0]


def _run_ours(gt, res, e2e):
    sys.path.insert(0, "tools")
    from eval_tracking import evaluate_video, parse_bovtext_json  # noqa: F401

    def to_frames(d):
        out = {}
        for fid, objs in d.items():
            ids = [int(o["ID"]) for o in objs]
            polys = [np.asarray(o["points"], np.float64).reshape(4, 2) for o in objs]
            txts = [o["transcription"] for o in objs]
            out[int(fid)] = (ids, polys, txts)
        return out

    acc = evaluate_video(
        to_frames(gt), to_frames(res), iou_threshold=0.5, e2e=e2e,
        text_sim=0.9 if e2e else 1.0, match_lowest_iou=True, text_rule="bovtext",
    )
    return acc.metrics()


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_task1_tracking_matches_official(official, tmp_path, seed):
    gt, res = make_video(seed)
    ref = _run_official(official["Task1_VideoTextTracking"], gt, res, tmp_path,
                        f"t1s{seed}", e2e=False)
    m = _run_ours(gt, res, e2e=False)
    assert m["IDSW"] == int(ref["num_switches"])
    assert m["FP"] == int(ref["num_false_positives"])
    assert m["FN"] == int(ref["num_misses"])
    np.testing.assert_allclose(m["MOTA"], ref["mota"], atol=1e-9)
    np.testing.assert_allclose(m["IDF1"], ref["idf1"], atol=1e-9)


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_task2_spotting_matches_official(official, tmp_path, seed):
    gt, res = make_video(seed)
    ref = _run_official(official["Task2_VideoTextSpotting"], gt, res, tmp_path,
                        f"t2s{seed}", e2e=True)
    m = _run_ours(gt, res, e2e=True)
    assert m["IDSW"] == int(ref["num_switches"])
    assert m["FP"] == int(ref["num_false_positives"])
    assert m["FN"] == int(ref["num_misses"])
    np.testing.assert_allclose(m["MOTA"], ref["mota"], atol=1e-9)
    np.testing.assert_allclose(m["IDF1"], ref["idf1"], atol=1e-9)
