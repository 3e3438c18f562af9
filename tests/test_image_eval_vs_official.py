"""Image-spotting evaluator vs the OFFICIAL adet scorer, run verbatim.

Loads /root/reference/third_party/adet/evaluation/text_eval_script.py (the
scorer TextEvaluator calls for CTW1500/TotalText-style image spotting) with
faithful facades for the absent Polygon2/shapely packages, feeds it randomized
synthetic GT + submission zips in its native `x1,y1,...,####text` format, and
asserts gomatching_tpu.evaluation.image_eval.evaluate_image_spotting returns
the SAME micro-averaged precision/recall/hmean for both E2E_RESULTS and
DETECTION_ONLY_RESULTS — the same evidence standard as the four video
protocols (test_icdar_protocol.py etc.)."""

import importlib.util
import io
import re
import sys
import types
import zipfile

import numpy as np
import pytest

REF_EVAL = "/root/reference/third_party/adet/evaluation"


# --------------------------------------------------------------------------
# Polygon2 facade: the subset text_eval_script.py touches (Polygon(pts),
# p & q, len(p), p.area()). Convex inputs only -> Sutherland-Hodgman clip.
def _shoelace(p):
    x, y = p[:, 0], p[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _clip(subject, a, b):
    out = []
    n = len(subject)
    for i in range(n):
        cur, nxt = subject[i], subject[(i + 1) % n]
        side_c = (b[0] - a[0]) * (cur[1] - a[1]) - (b[1] - a[1]) * (cur[0] - a[0])
        side_n = (b[0] - a[0]) * (nxt[1] - a[1]) - (b[1] - a[1]) * (nxt[0] - a[0])
        if side_c >= 0:
            out.append(cur)
        if (side_c >= 0) != (side_n >= 0):
            t = side_c / (side_c - side_n)
            out.append(cur + t * (nxt - cur))
    return np.asarray(out) if out else np.zeros((0, 2))


class _Poly:
    def __init__(self, pts):
        self._pts = np.asarray(pts, np.float64).reshape(-1, 2)

    def area(self):
        if len(self._pts) < 3:
            return 0.0
        return abs(_shoelace(self._pts))

    def __len__(self):
        return 1 if len(self._pts) >= 3 else 0

    def __and__(self, other):
        if len(self._pts) < 3 or len(other._pts) < 3:
            return _Poly(np.zeros((0, 2)))
        subj = self._pts if _shoelace(self._pts) > 0 else self._pts[::-1]
        clip = other._pts if _shoelace(other._pts) > 0 else other._pts[::-1]
        inter = subj
        for i in range(len(clip)):
            inter = _clip(inter, clip[i], clip[(i + 1) % len(clip)])
            if len(inter) == 0:
                break
        return _Poly(inter)


class _ShapelyPoly:
    """shapely.geometry.Polygon facade: validate_clockwise_points only reads
    .is_valid (synthetic quads are always simple/convex here)."""

    def __init__(self, pts):
        self.is_valid = True


class _LinearRing:
    def __init__(self, pts):
        p = np.asarray(pts, np.float64)
        self.is_ccw = _shoelace(p) > 0  # shapely: positive signed area


@pytest.fixture(scope="module")
def official():
    plg = types.ModuleType("Polygon")
    plg.Polygon = _Poly
    sys.modules["Polygon"] = plg
    shp = types.ModuleType("shapely")
    geom = types.ModuleType("shapely.geometry")
    geom.Polygon = _ShapelyPoly
    geom.LinearRing = _LinearRing
    geom.__all__ = ["Polygon", "LinearRing"]
    shp.geometry = geom
    sys.modules.setdefault("shapely", shp)
    sys.modules["shapely.geometry"] = geom
    # rapidfuzz >= 3 dropped the string_metric namespace the script imports;
    # alias the same algorithm from its current home
    import rapidfuzz
    from rapidfuzz.distance import Levenshtein

    if not hasattr(rapidfuzz, "string_metric"):
        sm = types.ModuleType("rapidfuzz.string_metric")
        sm.levenshtein = Levenshtein.distance
        rapidfuzz.string_metric = sm
        sys.modules["rapidfuzz.string_metric"] = sm
    # skeleton adet.evaluation so `from adet.evaluation import
    # rrc_evaluation_funcs` executes the real file
    for name, path in (("adet", f"{REF_EVAL}/.."), ("adet.evaluation", REF_EVAL)):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod
    spec = importlib.util.spec_from_file_location(
        "ref_text_eval_script", f"{REF_EVAL}/text_eval_script.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# --------------------------------------------------------------------------
def _convex_int_quad(rng, lo=0, hi=400):
    """Random convex quad with integer coords, CLOCKWISE per shapely (negative
    signed area) so validate_clockwise_points accepts it."""
    while True:
        cx, cy = rng.randint(lo + 40, hi - 40, 2)
        a, b = rng.randint(8, 40, 2)
        base = np.array(
            [[-a, -b], [a, -b], [a, b], [-a, b]], np.float64
        ) + rng.randint(-4, 5, (4, 2))
        pts = base + [cx, cy]
        # convex + simple?
        v = np.roll(pts, -1, 0) - pts
        cross = v[:, 0] * np.roll(v, -1, 0)[:, 1] - v[:, 1] * np.roll(v, -1, 0)[:, 0]
        if not (np.all(cross > 0) or np.all(cross < 0)):
            continue
        if _shoelace(pts) > 0:
            pts = pts[::-1]
        return pts.astype(np.int64)


_WORDS = [
    "hello", "WORLD", "Text", "spotting", "ab", "of", "don't", "(hi)",
    "end.", "it's", "ab-cd", "-edge-", "日本語", "×bad", "CAFÉ", "Ϙgreek",
    "longerword", "x", "###",
]


def _make_case(seed, n_images=6):
    """Random per-image GT/detections exercising: '###' regions, dictionary
    exclusions (short/special/non-latin words), det-vs-dontcare area tests,
    greedy-order-sensitive overlaps, wrong transcriptions, case flips."""
    rng = np.random.RandomState(seed)
    per_image = []
    for _ in range(n_images):
        n_gt = rng.randint(0, 7)
        gt_polys, gt_texts = [], []
        for _ in range(n_gt):
            gt_polys.append(_convex_int_quad(rng))
            gt_texts.append(_WORDS[rng.randint(len(_WORDS))])
        pred_polys, pred_texts = [], []
        for g in range(n_gt):
            r = rng.rand()
            if r < 0.25:
                continue  # miss
            # jittered copy of the GT quad (high IoU) or a shifted one
            shift = rng.randint(-3, 4, 2) if r < 0.75 else rng.randint(20, 60, 2)
            q = gt_polys[g] + shift
            pred_polys.append(q)
            t = gt_texts[g]
            rr = rng.rand()
            if rr < 0.5:
                pred_texts.append(t)
            elif rr < 0.7:
                pred_texts.append(t.swapcase())
            elif rr < 0.85:
                pred_texts.append(t + "x")
            else:
                pred_texts.append(_WORDS[rng.randint(len(_WORDS))])
            if rng.rand() < 0.2:  # duplicate det: greedy-order sensitivity
                pred_polys.append(q + rng.randint(-2, 3, 2))
                pred_texts.append(t)
        for _ in range(rng.randint(0, 3)):  # spurious dets
            pred_polys.append(_convex_int_quad(rng))
            pred_texts.append(_WORDS[rng.randint(len(_WORDS))])
        # '###' may not appear as a DET transcription (',####' split quirk);
        # it's a GT-only marker in real submissions too
        pred_texts = [t if t != "###" else "unk" for t in pred_texts]
        per_image.append((gt_polys, gt_texts, pred_polys, pred_texts))
    return per_image


def _zip_of(entries):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, lines in entries:
            z.writestr(name, "\n".join(lines) + ("\n" if lines else ""))
    buf.seek(0)
    return buf


def _lines(polys, texts):
    out = []
    for q, t in zip(polys, texts):
        coords = ",".join(str(int(v)) for v in np.asarray(q).ravel())
        out.append(f"{coords},####{t}")
    return out


def _parse(msg):
    m = re.search(r"precision: ([0-9.eE+-]+), recall: ([0-9.eE+-]+), "
                  r"hmean: ([0-9.eE+-]+)", msg)
    return tuple(float(x) for x in m.groups())


@pytest.mark.parametrize("word_spotting", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_official_scorer(official, word_spotting, seed):
    from gomatching_tpu.evaluation.image_eval import evaluate_image_spotting

    per_image = _make_case(seed)
    gt_zip = _zip_of(
        [(f"{i + 1}.txt", _lines(g, gt)) for i, (g, gt, _, _) in enumerate(per_image)]
    )
    det_zip = _zip_of(
        [(f"{i + 1}.txt", _lines(p, pt)) for i, (_, _, p, pt) in enumerate(per_image)]
    )
    params = official.default_evaluation_params()
    params["WORD_SPOTTING"] = word_spotting
    res = official.evaluate_method(gt_zip, det_zip, params)
    e2e = _parse(res["e2e_method"])
    det_only = _parse(res["det_only_method"])

    mine = evaluate_image_spotting(per_image, word_spotting=word_spotting)
    got_e2e = (mine["e2e_precision"], mine["e2e_recall"], mine["e2e_hmean"])
    got_det = (mine["det_precision"], mine["det_recall"], mine["det_hmean"])
    np.testing.assert_allclose(got_e2e, e2e, rtol=0, atol=1e-12)
    np.testing.assert_allclose(got_det, det_only, rtol=0, atol=1e-12)
