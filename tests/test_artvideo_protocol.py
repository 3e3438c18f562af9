"""Cross-validate our ArTVideo scoring against the OFFICIAL protocol scripts.

Runs the reference's Evaluation_Protocol_ArtVideo/eval_trk.py (tracking) and
eval_e2e.py (end-to-end spotting) VERBATIM — including their cv2-rasterized
mask IoU (eval_trk.py:92-118), the dist=IoU (minimizing) motmetrics
convention, the --curve Straight-text ignore filter (:170-175), the
'###'/'#1' don't-cares and the cal_similarity>=0.9 transcription gate
(eval_e2e.py:65-120) — on synthetic GT jsons (with real COCO RLE
segmentations, both compressed and uncompressed) and synthetic submissions.
pycocotools is faced with our own RLE codec (gomatching_tpu/evaluation/rle.py);
motmetrics/tracking_utils come vendored inside the protocol directory.

Our tools/eval_tracking.evaluate_video_artvideo must reproduce every per-video
metric (mota/motp/num_switches/idf1/idp/idr/precision/recall) and the official
OVERALL row.
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

ARV = "/root/reference/tools/Evaluation_Protocol_ArtVideo"

sys.path.insert(0, "tools")


@pytest.fixture(scope="module")
def official():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from gomatching_tpu.evaluation import rle
    from gomatching_tpu.evaluation.mot_metrics import levenshtein

    # facades for packages absent from this environment
    pct = types.ModuleType("pycocotools")
    pct_mask = types.ModuleType("pycocotools.mask")
    pct_mask.decode = rle.decode
    pct.mask = pct_mask
    lev = types.ModuleType("Levenshtein")
    lev.distance = levenshtein
    mods_add = {"pycocotools": pct, "pycocotools.mask": pct_mask, "Levenshtein": lev}
    sys.modules.setdefault("xmltodict", types.ModuleType("xmltodict"))
    try:  # shapely only backs calculate_iou_polygen, which is never called
        import shapely  # noqa: F401
    except ImportError:
        shp = types.ModuleType("shapely")
        shp_geom = types.ModuleType("shapely.geometry")
        shp_geom.Polygon = object
        shp.geometry = shp_geom
        mods_add.update({"shapely": shp, "shapely.geometry": shp_geom})
    sys.modules.update(mods_add)
    sys.path.insert(0, ARV)  # vendored motmetrics + tracking_utils
    mods = {}
    for fname, name in (("eval_trk.py", "trk"), ("eval_e2e.py", "e2e")):
        spec = importlib.util.spec_from_file_location(
            f"arv_{name}", os.path.join(ARV, fname)
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def _poly(cx, cy, w, h, curved=False):
    """Flat point list; hexagon when curved, quad otherwise."""
    if curved:
        pts = [
            (cx - w / 2, cy), (cx - w / 4, cy - h / 2), (cx + w / 4, cy - h / 2),
            (cx + w / 2, cy), (cx + w / 4, cy + h / 2), (cx - w / 4, cy + h / 2),
        ]
    else:
        pts = [
            (cx - w / 2, cy - h / 2), (cx + w / 2, cy - h / 2),
            (cx + w / 2, cy + h / 2), (cx - w / 2, cy + h / 2),
        ]
    return [float(v) for p in pts for v in p]


def _make_dataset(root, rng):
    """Two videos of 4 frames with persisting tracks, gaps, '###'/'#1'
    don't-cares, Straight + Curved text, and jittered/extra/missing
    predictions. Returns (gt_dir, res_dir, our_res_frames_by_video)."""
    import cv2

    from gomatching_tpu.evaluation import rle

    H, W = 240, 320
    gt_dir = os.path.join(root, "gt")
    res_dir = os.path.join(root, "res")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(res_dir, exist_ok=True)
    our_res = {}
    for vi, video in enumerate(("video_1", "video_2")):
        tracks = [
            # (obj_id, base_cx, base_cy, w, h, curved, text_type, transcription, present_frames)
            (1, 80, 60, 70, 30, False, "Straight", "HELLO", {1, 2, 3, 4}),
            (2, 200, 90, 80, 36, True, "Curved", "WORLD", {1, 2, 4}),
            (3, 120, 170, 90, 32, False, "Straight", "###", {2, 3}),
            (4, 240, 180, 60, 28, True, "Curved", "#1", {1, 3, 4}),
            (5, 60, 200, 56, 26, False, "Straight", "TPU", {3, 4}),
        ]
        anns = []
        for fid in range(1, 5):
            for tid, cx, cy, w, h, curved, ttype, text, present in tracks:
                if fid not in present:
                    continue
                dx, dy = 3 * fid + vi, 2 * fid
                pts = _poly(cx + dx, cy + dy, w, h, curved)
                ipts = np.array(pts, np.float32).astype(np.int32).reshape(-1, 2)
                mask = np.zeros((H, W), np.uint8)
                cv2.fillPoly(mask, [ipts], 1)
                seg = rle.encode(mask, compressed=(tid % 2 == 0))
                if isinstance(seg["counts"], bytes):
                    seg["counts"] = seg["counts"].decode("ascii")
                anns.append(
                    {
                        "frame_id": fid,
                        "obj_id": tid,
                        "point": pts,
                        "segmentation": seg,
                        "text_type": ttype,
                        "Transcription": text,
                    }
                )
        gt = {"frame": [{"height": H, "width": W} for _ in range(4)],
              "annotations": anns}
        with open(os.path.join(gt_dir, f"{video}.json"), "w") as f:
            json.dump(gt, f)

        # predictions: follow tracks with jitter; id switch on track 1 at
        # frame 3; one floating FP; one hyp overlapping the '###' region;
        # frame 4 missing entirely in video_2
        res = {}
        frames_ours = {}
        for fid in range(1, 5):
            if video == "video_2" and fid == 4:
                continue
            objs = []
            for tid, cx, cy, w, h, curved, ttype, text, present in tracks:
                if fid not in present or tid == 4:
                    continue  # never predict the '#1' track
                dx, dy = 3 * fid + vi, 2 * fid
                jit = rng.uniform(-3, 3, 2)
                hyp_id = 100 + tid if (tid == 1 and fid >= 3) else tid
                txt = text if not (tid == 2 and fid == 2) else "W0RLD?"
                objs.append(
                    {
                        "points": _poly(cx + dx + jit[0], cy + dy + jit[1], w, h, curved),
                        "ID": int(hyp_id),
                        "transcription": txt,
                    }
                )
            # hyp sitting on the '###' ignore region (dropped by the filter)
            if fid in (2, 3):
                dx, dy = 3 * fid + vi, 2 * fid
                objs.append({"points": _poly(120 + dx, 170 + dy, 90, 32, False),
                             "ID": 77, "transcription": "JUNK"})
            # floating false positive
            objs.append({"points": _poly(280, 40, 40, 20, False), "ID": 88,
                         "transcription": "FP"})
            res[str(fid)] = objs
            frames_ours[fid] = (
                [o["ID"] for o in objs],
                [np.asarray(o["points"], np.float64) for o in objs],
                [o["transcription"] for o in objs],
            )
        with open(os.path.join(res_dir, f"{video}.json"), "w") as f:
            json.dump(res, f)
        our_res[video] = frames_ours
    return gt_dir, res_dir, our_res


def _reconcile(mod, gt_dir, res_dir, our_res, e2e, only_curve):
    import pandas  # noqa: F401  (vendored motmetrics needs it)

    from eval_tracking import evaluate_video_artvideo

    mm = sys.modules["motmetrics"]
    videos = sorted(os.listdir(gt_dir))
    accs, ours = [], {}
    for fname in videos:
        video = fname.replace(".json", "")
        ev = mod.Evaluator(gt_dir, fname, "text", 0.5, only_curve)
        accs.append(ev.eval_file(os.path.join(res_dir, fname)))
        ours[video] = evaluate_video_artvideo(
            os.path.join(gt_dir, fname), our_res[video], 0.5, e2e=e2e,
            only_curve=only_curve,
        ).metrics()
    summary = mod.Evaluator.get_summary(accs, [f.replace(".json", "") for f in videos],
                                        mm.metrics.motchallenge_metrics)
    key_map = {"mota": "MOTA", "motp": "MOTP", "num_switches": "IDSW",
               "idf1": "IDF1", "idp": "IDP", "idr": "IDR",
               "precision": "precision", "recall": "recall"}
    for video in ours:
        for off_k, our_k in key_map.items():
            off_v = float(summary.loc[video, off_k])
            our_v = float(ours[video][our_k])
            assert np.isclose(off_v, our_v, atol=1e-9), (
                video, off_k, off_v, our_v, e2e, only_curve)
    # OVERALL row (micro-merged accumulators)
    from eval_tracking import _merge_into
    from gomatching_tpu.evaluation.mot_metrics import MOTAccumulator

    # rebuild our overall by re-running with video-scoped ids
    total = MOTAccumulator(iou_threshold=0.5, match_lowest_iou=True)
    for fname in videos:
        video = fname.replace(".json", "")
        acc = evaluate_video_artvideo(
            os.path.join(gt_dir, fname), our_res[video], 0.5, e2e=e2e,
            only_curve=only_curve,
        )
        _merge_into(total, acc, video)
    from eval_tracking import _fix_pair_keys

    _fix_pair_keys(total)
    m = total.metrics()
    for off_k, our_k in key_map.items():
        off_v = float(summary.loc["OVERALL", off_k])
        assert np.isclose(off_v, float(m[our_k]), atol=1e-9), (
            "OVERALL", off_k, off_v, m[our_k], e2e, only_curve)


@pytest.mark.parametrize("only_curve", [False, True])
def test_official_eval_trk_matches_ours(official, tmp_path, only_curve):
    rng = np.random.RandomState(7)
    gt_dir, res_dir, our_res = _make_dataset(str(tmp_path), rng)
    _reconcile(official["trk"], gt_dir, res_dir, our_res, e2e=False,
               only_curve=only_curve)


@pytest.mark.parametrize("only_curve", [False, True])
def test_official_eval_e2e_matches_ours(official, tmp_path, only_curve):
    rng = np.random.RandomState(8)
    gt_dir, res_dir, our_res = _make_dataset(str(tmp_path), rng)
    _reconcile(official["e2e"], gt_dir, res_dir, our_res, e2e=True,
               only_curve=only_curve)
