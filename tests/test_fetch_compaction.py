"""Exactness of the two fetch-byte cuts on the video-inference path:

- TPU.META_TOPK window meta compaction (predictor._fetch_meta): top-K
  valid-first rows + exact overflow fallback must reproduce the full fetch
  bit-for-bit through the whole spot->track pipeline;
- device-side row slicing of batched matcher fetches
  (tracker._slice_rows / associate_fn out_rows): same logits rows, fewer
  bytes — track ids must be identical with it on and off.

Both are wire optimizations for the tunneled-TPU deployment (the link moves
~35 MB/s and charges ~30 ms per RPC, docs/PERF_NOTES.md); neither may change
a single output value.
"""

import numpy as np
import pytest

from tests.test_inference_e2e import TINY_OPTS


@pytest.fixture(scope="module")
def predictor():
    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import VideoPredictor

    cfg = setup_eval_cfg("configs/GoMatching_ICDAR15.yaml", list(TINY_OPTS))
    return VideoPredictor(cfg)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(7)
    return [rng.randint(0, 255, (96, 128, 3), dtype=np.uint8) for _ in range(6)]


def _run(predictor, frames):
    tracked = predictor.process_video(frames)
    return [
        (d.boxes.copy(), d.scores.copy(), d.recs.copy(), d.track_ids.copy())
        for d in tracked
    ]


def _assert_same(a, b):
    assert len(a) == len(b)
    for fa, fb in zip(a, b):
        for xa, xb in zip(fa, fb):
            np.testing.assert_array_equal(xa, xb)


def test_meta_topk_exact(predictor, frames):
    predictor.meta_topk = 0
    base = _run(predictor, frames)
    # calibrate a threshold keeping ~half the slots so k=4 of nq=8 does NOT
    # overflow (exercises the compacting path, not just the fallback)
    scores = np.concatenate([f[1] for f in base])
    predictor.score_thresh = float(np.quantile(scores, 0.6))
    base = _run(predictor, frames)
    assert max(len(f[1]) for f in base) <= 4, "calibration left too many slots"

    predictor.meta_topk = 4
    compact = _run(predictor, frames)
    _assert_same(base, compact)

    # overflow: k=1 is below the per-frame valid counts -> the exact full
    # fallback must kick in and still match
    assert any(len(f[1]) > 1 for f in base)
    predictor.meta_topk = 1
    fallback = _run(predictor, frames)
    _assert_same(base, fallback)

    predictor.meta_topk = 0
    predictor.score_thresh = 0.0001


def test_sliced_matcher_fetch_exact(predictor, frames):
    tr = predictor.tracker
    assert getattr(predictor.tracker.associate_fn, "supports_out_rows", False)

    tr._slice_rows = False
    base = _run(predictor, frames)

    tr._slice_rows = True
    sliced = _run(predictor, frames)
    _assert_same(base, sliced)
    # the batched paths actually ran (slicing has something to slice)
    assert tr.asso_stats["short_calls"] >= 1
