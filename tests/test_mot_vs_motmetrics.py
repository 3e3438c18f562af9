"""Cross-validate our MOT accumulator against the vendored py-motmetrics.

The reference bundles py-motmetrics three times (one copy per protocol suite);
its accumulator IS the scorer behind every published MOTA/MOTP/IDF1 number
(Track_video_2_0.py:275 feeds dist = 1 - IoU with NaN below the 0.5 threshold;
E2E_video_2_0.py:380-397 reads mota/motp/idf1/num_switches). Here identical
randomized event streams go through both accumulators and the metrics must
reconcile exactly:

  MOTA, IDSW, FP, FN, IDF1, MT, ML  — equal
  MOTP                              — ours is mean IoU, theirs mean (1 - IoU)

The streams include empty frames, gt-only / hyp-only frames, disappearing and
re-appearing ids, and track crossovers, so correspondence carryover and switch
accounting are exercised, not just per-frame matching.
"""

import sys
import types

import numpy as np
import pytest

sys.modules.setdefault("xmltodict", types.ModuleType("xmltodict"))  # io.py import
sys.path.insert(0, "/root/reference/tools/Evaluation_Protocol_ArtVideo")

mm = pytest.importorskip("motmetrics")

from gomatching_tpu.evaluation.mot_metrics import MOTAccumulator, quad_iou_matrix

IOU_THRESH = 0.5


def _rand_quad(rng, W=200, H=120):
    x, y = rng.uniform(0, W - 30), rng.uniform(0, H - 30)
    w, h = rng.uniform(8, 40), rng.uniform(6, 25)
    return np.array(
        [[x, y], [x + w, y], [x + w, y + h], [x, y + h]], np.float32
    )


def _jitter(quad, rng, amt):
    shift = rng.uniform(-amt, amt, size=(1, 2)).astype(np.float32)
    return quad + shift


def _make_stream(rng, n_frames=10, n_tracks=6):
    """Per-frame (gt_ids, gt_quads, hyp_ids, hyp_quads) with drifting tracks,
    dropouts, re-appearances, noisy/displaced hypotheses and spurious FPs."""
    base = {t: _rand_quad(rng) for t in range(1, n_tracks + 1)}
    frames = []
    for _ in range(n_frames):
        gt_ids, gt_q, hyp_ids, hyp_q = [], [], [], []
        for t, q in base.items():
            base[t] = q = _jitter(q, rng, 3.0)
            if rng.rand() < 0.75:  # gt visible
                gt_ids.append(t)
                gt_q.append(q)
                r = rng.rand()
                if r < 0.6:  # good hypothesis, usually same id
                    hyp_ids.append(t if rng.rand() < 0.8 else t + 100)
                    hyp_q.append(_jitter(q, rng, 2.0))
                elif r < 0.75:  # badly displaced hypothesis
                    hyp_ids.append(t)
                    hyp_q.append(_jitter(q, rng, 60.0))
        for _ in range(rng.poisson(0.7)):  # spurious FPs
            hyp_ids.append(int(rng.randint(200, 210)))
            hyp_q.append(_rand_quad(rng))
        frames.append((gt_ids, np.array(gt_q), hyp_ids, np.array(hyp_q)))
    return frames


def _run_both(frames):
    ours = MOTAccumulator(iou_threshold=IOU_THRESH)
    ref = mm.MOTAccumulator(auto_id=True)
    for gt_ids, gt_q, hyp_ids, hyp_q in frames:
        if len(gt_ids) and len(hyp_ids):
            iou = quad_iou_matrix(gt_q, hyp_q)
        else:
            iou = np.zeros((len(gt_ids), len(hyp_ids)))
        ours.update(gt_ids, gt_q, hyp_ids, hyp_q)
        # the protocol scripts' convention (Track_video_2_0.py:275)
        dists = np.where(iou > IOU_THRESH - 1e-12, 1.0 - iou, np.nan)
        ref.update(gt_ids, hyp_ids, dists)
    mh = mm.metrics.create()
    summary = mh.compute(
        ref,
        metrics=[
            "mota", "motp", "idf1", "num_switches", "num_false_positives",
            "num_misses", "num_matches", "mostly_tracked", "mostly_lost",
        ],
        name="ref",
    )
    return ours.metrics(), summary.iloc[0]


@pytest.mark.parametrize("seed", range(30))
def test_accumulator_matches_motmetrics(seed):
    rng = np.random.RandomState(seed)
    frames = _make_stream(rng, n_frames=12, n_tracks=5)
    m, r = _run_both(frames)
    assert m["IDSW"] == int(r["num_switches"]), (m["IDSW"], r["num_switches"])
    assert m["FP"] == int(r["num_false_positives"])
    assert m["FN"] == int(r["num_misses"])
    np.testing.assert_allclose(m["MOTA"], r["mota"], atol=1e-9)
    if int(r["num_matches"]):
        np.testing.assert_allclose(m["MOTP"], 1.0 - r["motp"], atol=1e-9)
    np.testing.assert_allclose(m["IDF1"], r["idf1"], atol=1e-9)
    assert m["MT"] == int(r["mostly_tracked"])
    assert m["ML"] == int(r["mostly_lost"])


def test_edge_cases_match_motmetrics():
    """Empty frames, gt-only, hyp-only, total crossover of two tracks."""
    q1 = np.array([[0, 0], [20, 0], [20, 10], [0, 10]], np.float32)
    q2 = q1 + np.array([[50, 0]], np.float32)
    frames = [
        ([], np.zeros((0, 4, 2)), [], np.zeros((0, 4, 2))),
        ([1, 2], np.stack([q1, q2]), [], np.zeros((0, 4, 2))),
        ([], np.zeros((0, 4, 2)), [7], q1[None]),
        ([1, 2], np.stack([q1, q2]), [7, 8], np.stack([q1, q2])),
        # crossover: hypotheses swap positions -> two switches
        ([1, 2], np.stack([q1, q2]), [7, 8], np.stack([q2, q1])),
        ([1, 2], np.stack([q1, q2]), [7, 8], np.stack([q1, q2])),
    ]
    m, r = _run_both(frames)
    assert m["IDSW"] == int(r["num_switches"])
    assert m["FP"] == int(r["num_false_positives"])
    assert m["FN"] == int(r["num_misses"])
    np.testing.assert_allclose(m["MOTA"], r["mota"], atol=1e-9)
    np.testing.assert_allclose(m["IDF1"], r["idf1"], atol=1e-9)


@pytest.mark.parametrize("seed", range(10))
def test_artvideo_convention_matches_motmetrics(seed):
    """ArTVideo's scorer feeds dist = IoU itself (eval_trk.py:101-118), so
    motmetrics minimizes IoU among valid pairs; match_lowest_iou reproduces it."""
    rng = np.random.RandomState(1000 + seed)
    frames = _make_stream(rng, n_frames=10, n_tracks=4)
    ours = MOTAccumulator(iou_threshold=IOU_THRESH, match_lowest_iou=True)
    ref = mm.MOTAccumulator(auto_id=True)
    for gt_ids, gt_q, hyp_ids, hyp_q in frames:
        iou = (
            quad_iou_matrix(gt_q, hyp_q)
            if len(gt_ids) and len(hyp_ids)
            else np.zeros((len(gt_ids), len(hyp_ids)))
        )
        ours.update(gt_ids, gt_q, hyp_ids, hyp_q)
        dists = np.where(iou >= IOU_THRESH, iou, np.nan)  # the quirk: dist = iou
        ref.update(gt_ids, hyp_ids, dists)
    mh = mm.metrics.create()
    r = mh.compute(
        ref,
        metrics=["mota", "idf1", "num_switches", "num_false_positives", "num_misses"],
        name="ref",
    ).iloc[0]
    m = ours.metrics()
    assert m["IDSW"] == int(r["num_switches"])
    assert m["FP"] == int(r["num_false_positives"])
    assert m["FN"] == int(r["num_misses"])
    np.testing.assert_allclose(m["MOTA"], r["mota"], atol=1e-9)
    np.testing.assert_allclose(m["IDF1"], r["idf1"], atol=1e-9)
