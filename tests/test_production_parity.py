"""Production-configuration parity: bf16 + yuv420 + vmem vs the f32/rgb/xla
reference chain, through the FULL detect -> associate -> assign pipeline.

The headline-fps configuration (MODEL.PRECISION=bfloat16, TPU.UPLOAD_FORMAT=
yuv420, TPU.SAMPLING_IMPL=vmem — bench.py defaults) was previously pinned to
the <=0.5-MOTA contract only piecewise (spotter-level bf16 drift in
test_golden_spotter_midres.py, I420 roundtrip in test_upload_format.py). This
test runs BOTH configurations end-to-end on the same structured clip and
quantifies the track-level divergence:

  - detection coverage: IoU-matched detection agreement per frame;
  - id-structure consistency: track ids are arbitrary labels, so the contract
    is that the ref->prod id mapping over IoU-matched pairs is one consistent
    bijection across the whole video (an inconsistent pair = an id switch the
    production numerics introduced);
  - determinism: the production path run twice must give identical ids.

Why the bounds are quantified rather than exact-equality: under RANDOM weights
the adjacent detection-score and association-logit gaps sit BELOW bf16's
relative eps (measured in test_golden_spotter_midres.py — ~1.6e-4 relative
top-k gaps vs 8e-3 eps), so threshold/top-k/NMS/association decisions
legitimately flip between precisions; a trained checkpoint separates text from
background by O(1) margins and selects stably. The bounds below sit far above
any measured random-weight jitter collapse mode (a broken I420 decode, a
mis-sampling kernel, or a precision catastrophe drives coverage toward 0),
and well below the measured healthy values (coverage 0.64, consistency 0.87
all-pairs / 0.92 tight). Reference semantics under comparison:
gom_lstmatcher.py:366-564; contract: BASELINE.md <=0.5 MOTA.
"""

import numpy as np
import pytest

TINY = [
    "MODEL.TRANSFORMER.ENC_LAYERS", "1",
    "MODEL.TRANSFORMER.DEC_LAYERS", "1",
    "MODEL.TRANSFORMER.NUM_QUERIES", "8",
    "MODEL.TRANSFORMER.NUM_POINTS", "5",
    "MODEL.TRANSFORMER.HIDDEN_DIM", "64",
    "MODEL.TRANSFORMER.NHEADS", "4",
    "MODEL.TRANSFORMER.DIM_FEEDFORWARD", "64",
    "MODEL.ASSO_HEAD.FC_DIM", "64",
    "INPUT.MIN_SIZE_TEST", "64",
    "INPUT.MAX_SIZE_TEST", "128",
    "MODEL.WEIGHTS", "''",
    "TPU.SPOT_BATCH", "2",
    "MODEL.TRANSFORMER.INFERENCE_TH_TEST", "0.0001",
]

N_FRAMES = 8


def _clip(n=N_FRAMES, hw=(96, 128)):
    """Moving-rectangles clip: image structure drives stable detections."""
    import cv2

    rng = np.random.RandomState(0)
    frames = []
    for t in range(n):
        img = np.full(hw + (3,), 40, np.uint8)
        cv2.rectangle(img, (10 + 4 * t, 20), (50 + 4 * t, 36), (255, 255, 255), -1)
        cv2.rectangle(img, (70, 50 + 2 * t), (120, 70 + 2 * t), (200, 180, 90), -1)
        img = np.clip(img.astype(int) + rng.randint(-5, 6, img.shape), 0, 255)
        frames.append(img.astype(np.uint8))
    return frames


def _run(frames, opts):
    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import VideoPredictor

    cfg = setup_eval_cfg("configs/GoMatching_ICDAR15.yaml", TINY + opts)
    predictor = VideoPredictor(cfg)
    return predictor.process_video([f.copy() for f in frames])


def _iou_matrix(a, b):
    """(Na, 4) x (Nb, 4) xyxy IoU."""
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def _boxes_from_ctrl(det):
    """Axis-aligned boxes from control points (both runs' shared geometry)."""
    pts = det.ctrl_points.reshape(len(det.ctrl_points), -1, 2)
    if len(pts) == 0:
        return np.zeros((0, 4), np.float64)
    return np.concatenate([pts.min(1), pts.max(1)], axis=1).astype(np.float64)


def track_agreement(ref_frames, prod_frames, iou=0.5, tight=0.9):
    """-> (coverage, consistency_all, consistency_tight, n_pairs).

    coverage: IoU-matched detections / max(n_ref, n_prod), averaged per frame.
    consistency: fraction of matched pairs whose (ref_id, prod_id) agrees with
    the majority one-to-one bijection; the 'tight' variant restricts to pairs
    matched at IoU >= ``tight`` (geometrically the same detection).
    """
    votes = {}
    pairs = []  # (key, match iou)
    cov = []
    for rf, pf in zip(ref_frames, prod_frames):
        ra, pa = _boxes_from_ctrl(rf), _boxes_from_ctrl(pf)
        if max(len(ra), len(pa)) == 0:
            continue
        m = _iou_matrix(ra, pa)
        used_r, used_p, n_match = set(), set(), 0
        order = np.dstack(np.unravel_index(np.argsort(-m, axis=None), m.shape))[0]
        for i, j in order:
            if m[i, j] < iou or i in used_r or j in used_p:
                continue
            used_r.add(i)
            used_p.add(j)
            n_match += 1
            key = (int(rf.track_ids[i]), int(pf.track_ids[j]))
            votes[key] = votes.get(key, 0) + 1
            pairs.append((key, float(m[i, j])))
        cov.append(n_match / max(len(ra), len(pa)))
    bij = {}
    taken = set()
    for (r, p), _ in sorted(votes.items(), key=lambda kv: -kv[1]):
        if r not in bij and p not in taken:
            bij[r] = p
            taken.add(p)

    def consistency(sel):
        return sum(1 for (r, p), _ in sel if bij.get(r) == p) / max(len(sel), 1)

    tight_pairs = [kv for kv in pairs if kv[1] >= tight]
    return (
        float(np.mean(cov)) if cov else 0.0,
        consistency(pairs),
        consistency(tight_pairs),
        len(pairs),
    )


@pytest.fixture(scope="module")
def runs():
    frames = _clip()
    ref = _run(frames, ["MODEL.PRECISION", "float32", "TPU.UPLOAD_FORMAT", "rgb",
                        "TPU.SAMPLING_IMPL", "xla"])
    prod = _run(frames, ["MODEL.PRECISION", "bfloat16", "TPU.UPLOAD_FORMAT", "yuv420",
                         "TPU.SAMPLING_IMPL", "vmem"])
    prod2 = _run(frames, ["MODEL.PRECISION", "bfloat16", "TPU.UPLOAD_FORMAT", "yuv420",
                          "TPU.SAMPLING_IMPL", "vmem"])
    return ref, prod, prod2


def test_production_path_deterministic(runs):
    """The headline-fps configuration must be bit-stable run to run (its own
    flips would make any parity bound meaningless)."""
    _, prod, prod2 = runs
    assert len(prod) == len(prod2)
    for a, b in zip(prod, prod2):
        np.testing.assert_array_equal(a.track_ids, b.track_ids)
        np.testing.assert_array_equal(a.ctrl_points, b.ctrl_points)


def test_production_config_track_structure(runs):
    ref, prod, _ = runs
    assert len(ref) == len(prod)
    assert sum(len(f) for f in ref) > 0, "reference run detected nothing"
    cov, cons_all, cons_tight, n_pairs = track_agreement(ref, prod)
    print(
        f"\nproduction-config parity: coverage={cov:.3f} "
        f"id-consistency all={cons_all:.3f} tight={cons_tight:.3f} "
        f"over {n_pairs} matched pairs"
    )
    assert n_pairs >= 15, "too few matched detections to compare"
    # quantified switch-rate contract for the headline-fps configuration
    # (bounds sit between the measured healthy values — 0.64/0.87/0.92 under
    # random weights — and the collapse modes a real numerics bug causes)
    assert cov >= 0.5, f"detection coverage collapsed: {cov:.3f}"
    assert cons_all >= 0.8, f"id switches introduced: {cons_all:.3f}"
    assert cons_tight >= 0.85, f"same-detection id switches: {cons_tight:.3f}"


def test_agreement_metric_self_consistency(runs):
    """The metric itself: a run compared against itself is perfect, and
    shuffling ids inconsistently across frames is caught."""
    ref, _, _ = runs
    cov, cons_all, cons_tight, _ = track_agreement(ref, ref)
    assert cov == 1.0 and cons_all == 1.0 and cons_tight == 1.0

    import copy

    broken = copy.deepcopy(ref)
    flipped = False
    for fi in range(len(broken) // 2, len(broken)):
        ids = broken[fi].track_ids
        if len(ids) >= 2:
            ids[0], ids[1] = ids[1], ids[0]
            flipped = True
    if flipped:
        _, cons_all, _, _ = track_agreement(ref, broken)
        assert cons_all < 1.0
