"""Cross-validate our ICDAR15-video / DSText scoring against the OFFICIAL
protocol scripts.

Runs the reference's Track_video_2_0.py (tracking) and E2E_video_2_0.py
(end-to-end spotting with track-level transcriptions) VERBATIM on synthetic
submission zips, with facades for the absent Polygon2 / lxml packages (the
geometry facade re-derives convex hull + clip + shoelace area exactly).
Our evaluate_video_icdar must reproduce every per-video metric
(MOTA/MOTP/IDF1/SW/FP/MS/MOTAN) and the official macro-averaged overall.
"""

import importlib.util
import sys
import types
import zipfile

import numpy as np
import pytest

DST = "/root/reference/tools/Evaluation_Protocol_DSText"

sys.path.insert(0, "tools")

from gomatching_tpu.evaluation.mot_metrics import _ccw, _clip_poly, _poly_area, convex_hull


class _Poly:
    """Polygon2 facade: the subset Track_video_2_0.py:375-437 touches."""

    def __init__(self, pts):
        self._pts = np.asarray(pts, np.float64).reshape(-1, 2)

    def area(self):
        return _poly_area(self._pts) if len(self._pts) >= 3 else 0.0

    def __len__(self):  # number of contours
        return 1 if len(self._pts) >= 3 else 0

    def __and__(self, other):
        if len(self._pts) < 3 or len(other._pts) < 3:
            return _Poly(np.zeros((0, 2)))
        inter = _ccw(self._pts)
        clip = _ccw(other._pts)
        for i in range(len(clip)):
            inter = _clip_poly(inter, clip[i], clip[(i + 1) % len(clip)])
            if len(inter) == 0:
                break
        return _Poly(inter)


def _convex_hull_poly(p):
    return _Poly(convex_hull(p._pts))


@pytest.fixture(scope="module")
def official():
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    plg = types.ModuleType("Polygon")
    plg.Polygon = _Poly
    utils = types.ModuleType("Polygon.Utils")
    utils.convexHull = _convex_hull_poly
    plg.Utils = utils
    lxml = types.ModuleType("lxml")
    lxml.etree = types.SimpleNamespace()
    lev = types.ModuleType("Levenshtein")
    from gomatching_tpu.evaluation.mot_metrics import levenshtein

    lev.distance = levenshtein
    sys.modules.update({"Polygon": plg, "Polygon.Utils": utils, "lxml": lxml,
                        "Levenshtein": lev})
    sys.modules.setdefault("xmltodict", types.ModuleType("xmltodict"))
    # motmetrics: the DSText suite expects it installed; the reference vendors
    # identical copies under the other protocol suites
    sys.path.insert(0, "/root/reference/tools/Evaluation_Protocol_ArtVideo")

    mods = {}
    for sub, name in (("Evaluation_DSText_tracking/Track_video_2_0.py", "trk"),
                      ("Evaluation_DSText_E2E/E2E_video_2_0.py", "e2e")):
        path = f"{DST}/{sub.rsplit('/', 1)[0]}"
        sys.path.insert(0, path)
        spec = importlib.util.spec_from_file_location(name, f"{DST}/{sub}")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mods[name] = mod
        sys.path.remove(path)
    return mods


# ---------------------------------------------------------------------------
def _xml(frames):
    out = ['<?xml version="1.0" encoding="UTF-8"?>', "<Frames>"]
    for fid in sorted(frames):
        out.append(f'<frame ID="{fid}">')
        for oid, quad, txt in frames[fid]:
            out.append(f'<object ID="{oid}" Transcription="{txt}">')
            pts = np.asarray(quad).reshape(-1, 2)
            for x, y in pts:
                out.append(f'<Point x="{int(x)}" y="{int(y)}"/>')
            out.append("</object>")
        out.append("</frame>")
    out.append("</Frames>")
    return "\n".join(out)


def _track_txt(d):
    return "".join(f'"{k}","{v}"\n' for k, v in sorted(d.items()))


def _quad(x, y, w=30, h=14):
    return [x, y, x + w, y, x + w, y + h, x, y + h]


def make_video(seed, n_frames=8):
    rng = np.random.RandomState(seed)
    words = {1: "HELLO", 2: "WORLD", 3: "TEXT", 4: "JAX"}
    gt, res = {}, {}
    gt_txt = dict(words)
    det_txt = {}
    for f in range(1, n_frames + 1):
        g, r = [], []
        for t in (1, 2, 3, 4):
            if rng.rand() < 0.15:
                continue
            x, y = 10 + 90 * (t % 2) + 2 * f, 10 + 40 * (t // 3) + f
            g.append((t, _quad(x, y), words[t]))
            p = rng.rand()
            if p < 0.65:
                did = t if rng.rand() < 0.8 else 50 + t
                det_txt.setdefault(did, words[t] if rng.rand() < 0.7 else words[t] + "X")
                r.append((did, _quad(x + int(rng.randint(-2, 3)), y + int(rng.randint(-2, 3))),
                          det_txt[did]))
            elif p < 0.8:
                det_txt.setdefault(t, words[t])
                r.append((t, _quad(x + 60, y + 30), det_txt[t]))
        # ignore region + a det inside it
        g.append((99, _quad(200, 90), "###"))
        if rng.rand() < 0.5:
            det_txt.setdefault(77, "ZZZ")
            r.append((77, _quad(202, 91), "ZZZ"))
        gt[f] = g
        res[f] = r
    return gt, res, gt_txt, det_txt


def _zips(tmp_path, videos, tag, with_txt):
    """The tracking script's zips carry only XML; the E2E script's also carry
    the per-track transcription txt files."""
    gt_zip = tmp_path / f"gt_{tag}.zip"
    sub_zip = tmp_path / f"sub_{tag}.zip"
    with zipfile.ZipFile(gt_zip, "w") as zg, zipfile.ZipFile(sub_zip, "w") as zs:
        for i, (gt, res, gt_txt, det_txt) in enumerate(videos, start=1):
            zg.writestr(f"Video_{i}_1_1_GT.xml", _xml(gt))
            zs.writestr(f"res_Video_{i}_1_1.xml", _xml(res))
            if with_txt:
                zg.writestr(f"Video_{i}_1_1_GT.txt", _track_txt(gt_txt))
                zs.writestr(f"res_Video_{i}_1_1.txt", _track_txt(det_txt))
    return str(gt_zip), str(sub_zip)


def _ours(videos, e2e):
    from eval_tracking import evaluate_video_icdar

    per = []
    for gt, res, gt_txt, det_txt in videos:
        def frames(d):
            return {
                f: ([o[0] for o in objs],
                    [np.asarray(o[1], np.float64) for o in objs],
                    [o[2] for o in objs])
                for f, objs in d.items()
            }

        per.append(evaluate_video_icdar(
            frames(gt), frames(res), 0.5, e2e,
            gt_track_texts=gt_txt if e2e else None,
            det_track_texts=det_txt if e2e else None,
        ))
    return per


@pytest.mark.parametrize("mode", ["trk", "e2e"])
def test_matches_official_protocol(official, tmp_path, mode):
    videos = [make_video(seed) for seed in (10, 11, 12)]
    gt_zip, sub_zip = _zips(tmp_path, videos, mode, with_txt=(mode == "e2e"))
    mod = official[mode]
    ref = mod.evaluate_method(gt_zip, sub_zip, mod.default_evaluation_params())
    ours = _ours(videos, e2e=(mode == "e2e"))

    for i, m in enumerate(ours, start=1):
        sample = ref["per_sample"][str(i)] if str(i) in ref["per_sample"] else (
            ref["per_sample"][list(ref["per_sample"])[i - 1]]
        )
        assert m["IDSW"] == int(sample["SW"]), (i, m["IDSW"], sample["SW"])
        assert m["FP"] == int(sample["FP"]), (i, m["FP"], sample["FP"])
        assert m["FN"] == int(sample["MS"]), (i, m["FN"], sample["MS"])
        np.testing.assert_allclose(m["MOTA"], sample["MOTA"], atol=1e-9)
        np.testing.assert_allclose(m["MOTP"], sample["MOTP"], atol=1e-9)
        np.testing.assert_allclose(m["IDF1"], sample["IDF1"], atol=1e-9)
        np.testing.assert_allclose(m["MOTAN"], sample["MOTAN"], atol=1e-9)

    n = len(ours)
    np.testing.assert_allclose(
        sum(m["MOTA"] for m in ours) / n, ref["method"]["MOTA"], atol=1e-9
    )
    np.testing.assert_allclose(
        sum(m["MOTP"] for m in ours) / n, ref["method"]["MOTP"], atol=1e-9
    )
    np.testing.assert_allclose(
        sum(m["IDF1"] for m in ours) / n, ref["method"]["IDF1"], atol=1e-9
    )


def test_detection_matches_official_protocol(official, tmp_path):
    """DSText frame-level detection HMean (script.py:54-330) run verbatim vs
    our evaluate_detection: greedy index-order matching, strict IoU > 0.5,
    '###' don't-cares, area-precision ignore filtering, micro-averaged totals."""
    import importlib.util

    # the det script's geometry is shapely-style: .area property, &, intersects
    class _ShapelyPoly:
        def __init__(self, pts):
            self._pts = np.asarray(pts, np.float64).reshape(-1, 2)

        @property
        def area(self):
            return _poly_area(self._pts) if len(self._pts) >= 3 else 0.0

        def intersects(self, other):
            return (self & other).area > 0

        def __and__(self, other):
            if len(self._pts) < 3 or len(other._pts) < 3:
                return _ShapelyPoly(np.zeros((0, 2)))
            inter = _ccw(self._pts)
            clip = _ccw(other._pts)
            for i in range(len(clip)):
                inter = _clip_poly(inter, clip[i], clip[(i + 1) % len(clip)])
                if len(inter) == 0:
                    break
            return _ShapelyPoly(inter)

    shp = types.ModuleType("shapely")
    shp_geom = types.ModuleType("shapely.geometry")
    shp_geom.Polygon = _ShapelyPoly
    shp.geometry = shp_geom
    sys.modules["shapely"] = shp
    sys.modules["shapely.geometry"] = shp_geom

    path = f"{DST}/Evaluation_DSText_Det"
    sys.path.insert(0, path)
    spec = importlib.util.spec_from_file_location("det_script", f"{path}/script.py")
    det_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(det_mod)
    sys.path.remove(path)

    rng = np.random.RandomState(42)
    frames = []
    for _ in range(25):
        gts, dets = [], []
        for t in range(4):
            if rng.rand() < 0.2:
                continue
            x, y = int(rng.randint(0, 200)), int(rng.randint(0, 100))
            txt = "###" if rng.rand() < 0.2 else "WORD"
            gts.append((_quad(x, y), txt))
            r = rng.rand()
            if r < 0.6:
                dets.append(_quad(x + int(rng.randint(-3, 4)), y + int(rng.randint(-3, 4))))
            elif r < 0.75:
                dets.append(_quad(x + 50, y + 40))
        if rng.rand() < 0.3:
            dets.append(_quad(250, 110))
        frames.append((gts, dets))

    gt_zip = tmp_path / "det_gt.zip"
    sub_zip = tmp_path / "det_sub.zip"
    with zipfile.ZipFile(gt_zip, "w") as zg, zipfile.ZipFile(sub_zip, "w") as zs:
        for i, (gts, dets) in enumerate(frames, start=1):
            zg.writestr(f"img_{i}.txt", "".join(
                ",".join(str(int(c)) for c in q) + f",{t}\n" for q, t in gts))
            zs.writestr(f"img_{i}.txt", "".join(
                ",".join(str(int(c)) for c in q) + "\n" for q in dets))

    ref, _hmean = det_mod.evaluate_method(str(gt_zip), str(sub_zip),
                                          det_mod.default_evaluation_params())
    from gomatching_tpu.evaluation.mot_metrics import evaluate_detection

    ours = evaluate_detection(
        [
            ([np.asarray(q, np.float64) for q, _ in gts],
             [t for _, t in gts],
             [np.asarray(q, np.float64) for q in dets])
            for gts, dets in frames
        ],
        0.5,
    )
    np.testing.assert_allclose(ours["recall"], ref["method"]["recall"], atol=1e-9)
    np.testing.assert_allclose(ours["precision"], ref["method"]["precision"], atol=1e-9)
    np.testing.assert_allclose(ours["hmean"], ref["method"]["hmean"], atol=1e-9)


# ---------------------------------------------------------------------------
# Close the pipeline->protocol loop (BASELINE.md contract: "protocols run
# unchanged on emitted XML/JSON"): the predictor's OWN emitted XML/txt files
# (evaluation/writer.py) are zipped verbatim as the submission and scored by
# the official scripts; our scorer on the same files must agree exactly.
@pytest.fixture(scope="module")
def emitted(tmp_path_factory):
    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import VideoPredictor
    from gomatching_tpu.evaluation.writer import (
        boundary_to_polygon,
        frame_lines,
        write_track_transcriptions,
        write_video_results,
    )

    cfg = setup_eval_cfg(
        "configs/GoMatching_ICDAR15.yaml",
        [
            "MODEL.TRANSFORMER.ENC_LAYERS", "1",
            "MODEL.TRANSFORMER.DEC_LAYERS", "1",
            "MODEL.TRANSFORMER.NUM_QUERIES", "8",
            "MODEL.TRANSFORMER.NUM_POINTS", "5",
            "MODEL.TRANSFORMER.HIDDEN_DIM", "64",
            "MODEL.TRANSFORMER.NHEADS", "4",
            "MODEL.TRANSFORMER.DIM_FEEDFORWARD", "64",
            "MODEL.TRANSFORMER.INFERENCE_TH_TEST", "0.0001",
            "MODEL.ASSO_HEAD.FC_DIM", "64",
            "INPUT.MIN_SIZE_TEST", "64",
            "INPUT.MAX_SIZE_TEST", "128",
            "MODEL.WEIGHTS", "''",
            "TPU.SPOT_BATCH", "2",
        ],
    )
    predictor = VideoPredictor(cfg)
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 255, (96, 128, 3), np.uint8) for _ in range(6)]
    tracked = predictor.process_video(frames)

    out = tmp_path_factory.mktemp("emitted")
    annotation = {}
    for i, det in enumerate(tracked):
        polys = [boundary_to_polygon(bd) for bd in det.bd]
        texts = [predictor.decode_text(r) for r in det.recs]
        annotation[str(i + 1)] = frame_lines(polys, det.track_ids, texts)
    write_video_results(
        annotation,
        str(out / "Video_1_1_1.json"),
        str(out / "res_Video_1_1_1.xml"),
    )
    write_track_transcriptions(str(out))
    return out


def _gt_from_emitted(xml_path, seed=7):
    """Perturbed GT derived from the emitted submission so every metric bucket
    (TP/FP/FN/IDSW/ignore) is populated: jittered copies of most objects, some
    dropped, some relabeled, plus a '###' ignore region per frame."""
    from eval_tracking import parse_xml

    res = parse_xml(str(xml_path), int_coords=True)
    rng = np.random.RandomState(seed)
    gt = {}
    gt_txt = {}
    for f in sorted(res):
        ids, polys, txts = res[f]
        objs = []
        for oid, poly, txt in zip(ids, polys, txts):
            r = rng.rand()
            if r < 0.25:
                continue  # -> FP on the det side
            gid = int(oid) if r < 0.8 else int(oid) + 1000  # relabel -> IDSW/FN
            q = np.asarray(poly, np.float64).reshape(-1, 2)
            q = q + rng.randint(-2, 3, size=q.shape)
            clean = "".join(c for c in txt if c.isalnum()).upper() or "WORD"
            objs.append((gid, np.maximum(q, 0).reshape(-1).tolist(), clean))
            if gid not in gt_txt:
                gt_txt[gid] = clean if rng.rand() < 0.7 else clean + "Q"
        objs.append((9999, _quad(100, 80), "###"))
        gt[f] = objs
    return gt, gt_txt


@pytest.mark.parametrize("mode", ["trk", "e2e"])
def test_official_protocol_on_emitted_xml(official, emitted, tmp_path, mode):
    from eval_tracking import evaluate_video_icdar, parse_track_texts, parse_xml

    xml_path = emitted / "res_Video_1_1_1.xml"
    txt_path = emitted / "res_Video_1_1_1.txt"
    res = parse_xml(str(xml_path), int_coords=True)
    assert sum(len(v[0]) for v in res.values()) > 0, "pipeline emitted no objects"

    gt, gt_txt = _gt_from_emitted(xml_path)
    gt_zip = tmp_path / f"gt_{mode}.zip"
    sub_zip = tmp_path / f"sub_{mode}.zip"
    with zipfile.ZipFile(gt_zip, "w") as zg, zipfile.ZipFile(sub_zip, "w") as zs:
        zg.writestr("Video_1_1_1_GT.xml", _xml(gt))
        # the submission is the pipeline's emitted bytes, VERBATIM
        zs.writestr("res_Video_1_1_1.xml", xml_path.read_bytes())
        if mode == "e2e":
            zg.writestr("Video_1_1_1_GT.txt", _track_txt(gt_txt))
            zs.writestr("res_Video_1_1_1.txt", txt_path.read_bytes())

    mod = official[mode]
    ref = mod.evaluate_method(str(gt_zip), str(sub_zip), mod.default_evaluation_params())
    sample = ref["per_sample"][list(ref["per_sample"])[0]]

    gt_frames = {
        f: ([o[0] for o in objs],
            [np.asarray(o[1], np.float64) for o in objs],
            [o[2] for o in objs])
        for f, objs in gt.items()
    }
    ours = evaluate_video_icdar(
        gt_frames, res, 0.5, mode == "e2e",
        gt_track_texts=gt_txt if mode == "e2e" else None,
        det_track_texts=parse_track_texts(str(txt_path)) if mode == "e2e" else None,
    )
    assert ours["IDSW"] == int(sample["SW"])
    assert ours["FP"] == int(sample["FP"])
    assert ours["FN"] == int(sample["MS"])
    np.testing.assert_allclose(ours["MOTA"], sample["MOTA"], atol=1e-9)
    np.testing.assert_allclose(ours["MOTP"], sample["MOTP"], atol=1e-9)
    np.testing.assert_allclose(ours["IDF1"], sample["IDF1"], atol=1e-9)
