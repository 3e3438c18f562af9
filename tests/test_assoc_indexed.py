"""Indexed association (TPU.ASSOC_INDEXED) parity.

The indexed path keeps reid embeddings device-resident and ships row indices;
the gathered rows are the same f32 values the fetch path re-uploads, so track
ids, geometry, and scores must be BIT-identical — including across window
boundaries where the pool is re-based (predictor._adopt_pool)."""

import numpy as np
import pytest

TINY_OPTS = [
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
]


def _build(indexed: bool, extra=()):
    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import VideoPredictor

    cfg = setup_eval_cfg(
        "configs/GoMatching_ICDAR15.yaml",
        list(TINY_OPTS) + ["TPU.ASSOC_INDEXED", str(indexed)] + list(extra),
    )
    return VideoPredictor(cfg)


@pytest.mark.parametrize("extra", [(), ("INPUT.VIDEO.TEST_LEN", "3")])
def test_indexed_matches_fetch_path(extra):
    rng = np.random.RandomState(7)
    # 13 frames, window=5: three windows; TEST_LEN default 6 > window length
    # exercises a tail spanning TWO previous windows in _adopt_pool
    frames = [rng.randint(0, 255, (64, 96, 3), dtype=np.uint8) for _ in range(13)]

    ref = _build(False, extra)
    # share params so both predictors run the same weights
    idxp = _build(True, extra)
    idxp.params = ref.params

    base = ref.process_video([f.copy() for f in frames], window=5)
    got = idxp.process_video([f.copy() for f in frames], window=5)

    assert idxp.assoc_indexed and not ref.assoc_indexed
    assert len(got) == len(base)
    for a, b in zip(base, got):
        np.testing.assert_array_equal(a.track_ids, b.track_ids)
        np.testing.assert_array_equal(a.ctrl_points, b.ctrl_points)
        np.testing.assert_array_equal(a.scores, b.scores)
        assert b.reid is None  # indexed mode never fetches reid


def test_indexed_single_window():
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 255, (64, 96, 3), dtype=np.uint8) for _ in range(6)]
    ref = _build(False)
    idxp = _build(True)
    idxp.params = ref.params
    base = ref.process_video([f.copy() for f in frames])
    got = idxp.process_video([f.copy() for f in frames])
    for a, b in zip(base, got):
        np.testing.assert_array_equal(a.track_ids, b.track_ids)
        np.testing.assert_array_equal(a.bd, b.bd)
