"""End-to-end inference: synthetic frames -> predictor -> tracker -> XML/JSON.

Mirrors the reference's validation-by-pipeline strategy (SURVEY.md §4): a tiny
random-weight model must drive the full spot->track->serialize path and emit
schema-valid ICDAR XML/JSON.
"""

import os
import xml.etree.cElementTree as ET

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


@pytest.fixture(scope="module")
def predictor():
    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import VideoPredictor

    cfg = setup_eval_cfg("configs/GoMatching_ICDAR15.yaml", list(TINY_OPTS))
    return VideoPredictor(cfg)


def test_process_video_and_write(tmp_path, predictor):
    from gomatching_tpu.evaluation.writer import (
        boundary_to_polygon,
        frame_lines,
        write_track_transcriptions,
        write_video_results,
    )

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (96, 128, 3), dtype=np.uint8) for _ in range(5)]
    tc = {}
    tracked = predictor.process_video(frames, tc)
    assert len(tracked) == 5
    for det in tracked:
        assert len(np.unique(det.track_ids)) == len(det.track_ids)
        assert det.ctrl_points.shape[1] == 5 * 2
        assert det.bd.shape[1:] == (5, 4)

    annotation = {}
    for i, det in enumerate(tracked):
        polys = [boundary_to_polygon(bd) for bd in det.bd]
        texts = [predictor.decode_text(r) for r in det.recs]
        annotation[str(i + 1)] = frame_lines(polys, det.track_ids, texts)

    xml_path = str(tmp_path / "res_video_1.xml")
    json_path = str(tmp_path / "video_1.json")
    write_video_results(annotation, json_path, xml_path)
    # XML must parse with the protocol-expected structure
    root = ET.parse(xml_path).getroot()
    assert root.tag == "Frames"
    for fr in root:
        assert fr.tag == "frame" and "ID" in fr.attrib
        for obj in fr:
            assert "ID" in obj.attrib and "Transcription" in obj.attrib
            assert len(list(obj)) == 4  # 4 corner Points
    write_track_transcriptions(str(tmp_path))
    assert os.path.exists(str(tmp_path / "res_video_1.txt"))

    assert "detector" in tc and "tracker" in tc


def test_empty_detections(predictor):
    """Frames with zero surviving detections -> empty tracks, no crashes."""
    rng = np.random.RandomState(1)
    frames = [rng.randint(0, 255, (96, 128, 3), dtype=np.uint8) for _ in range(3)]
    dets = predictor.spot_frames(frames)
    for d in dets:  # emulate nothing passing the threshold
        for f in ("boxes", "scores", "ctrl_points", "recs", "bd", "reid",
                  "pool_rows"):
            v = getattr(d, f)
            if v is not None:  # reid/pool_rows: exactly one is None per mode
                setattr(d, f, v[:0])
    predictor.tracker.reset()
    for d in dets:
        predictor.tracker.step(d)
    for d in predictor.tracker.remove_short_tracks():
        assert len(d) == 0


def test_long_video_streams_in_bounded_windows(predictor):
    """process_video consumes a lazy frame generator in <=window-frame phases
    (reference eval.py:329): a long video never materializes on the host, and
    track ids stay consistent across window boundaries."""
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (64, 96, 3), dtype=np.uint8)

    n_total = 37
    window = 10
    live = {"buffered": 0, "max_seen": 0}
    orig_spot = predictor.spot_frames

    def counting_spot(frames, tc=None, **kw):
        live["max_seen"] = max(live["max_seen"], len(frames))
        return orig_spot(frames, tc, **kw)

    predictor.spot_frames = counting_spot

    def gen():
        for _ in range(n_total):
            yield base.copy()

    tracked = predictor.process_video(gen(), window=window)
    predictor.spot_frames = orig_spot
    assert len(tracked) == n_total
    assert live["max_seen"] <= window
    # identical frames -> the same detections should keep one id across windows
    ids_per_frame = [set(f.track_ids.tolist()) for f in tracked]
    if all(len(s) > 0 for s in ids_per_frame):
        common = set.intersection(*ids_per_frame)
        assert common, "tracks should persist across window boundaries"


def test_predictor_with_pos_embeddings():
    """NO_POS_EMB=False end-to-end: the predictor's box/time-fed association
    jits and the tracker's pos-input plumbing (config default is False — only
    the shipped YAMLs disable it)."""
    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import VideoPredictor

    cfg = setup_eval_cfg(
        "configs/GoMatching_ICDAR15.yaml",
        list(TINY_OPTS) + [
            "MODEL.ASSO_HEAD.NO_POS_EMB", "False",
            "MODEL.ASSO_HEAD.WITH_TEMP_EMB", "True",
        ],
    )
    predictor = VideoPredictor(cfg)
    assert predictor.tracker.use_pos_emb
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (96, 128, 3), dtype=np.uint8) for _ in range(4)]
    tracked = predictor.process_video(frames)
    assert len(tracked) == 4
    for det in tracked:
        assert len(np.unique(det.track_ids)) == len(det.track_ids)


def test_dispatch_window_chunking(predictor):
    """Super-chunk boundaries: first chunk is a single batch (pipeline ramp),
    interior chunks are SPOT_BATCH*SPOT_SUPER, the tail is padded to a batch
    multiple, and every real frame is covered exactly once."""
    import jax.numpy as jnp

    bs, sup = predictor.spot_batch, predictor.spot_super
    for n in (1, 2, 3, 5, 7, 11):
        frames = np.stack(
            [np.full((64, 96, 3), i, np.uint8) for i in range(n)]
        )
        pending = predictor._dispatch_window(
            frames, (64, 96), (64, 96), jnp.float32(0.5)
        )
        keeps = [k for _, _, k in pending]
        assert sum(keeps) == n
        for out, rows, keep in pending:
            assert rows % bs == 0 and 0 < keep <= rows
            assert out.shape[0] == rows
        if sup > 1 and n > bs:
            assert pending[0][1] == bs  # ramp chunk is one batch


def test_prefetch_iter():
    """Background-decode prefetcher: order preserved, exceptions forwarded,
    tuple items pass through (no sentinel collision)."""
    from gomatching_tpu.utils.prefetch import prefetch_iter

    assert list(prefetch_iter(iter(range(50)), 4)) == list(range(50))
    assert list(prefetch_iter(iter([(1, 2)]), 2)) == [(1, 2)]

    def gen():
        yield "a"
        raise ValueError("boom")

    it = prefetch_iter(gen(), 2)
    assert next(it) == "a"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="boom"):
        next(it)


def test_pipeline_modes_identical(predictor):
    """TPU.PIPELINE_WINDOWS only reorders host/device timing, never math:
    modes 0 (strict), 1 (upload lookahead), 2 (dispatch ahead) must emit
    identical track ids and geometry across window boundaries."""
    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 255, (64, 96, 3), dtype=np.uint8) for _ in range(13)]

    results = {}
    cfg = predictor.cfg
    orig = cfg.TPU.PIPELINE_WINDOWS
    try:
        for mode in (0, 1, 2):
            cfg.defrost()
            cfg.TPU.PIPELINE_WINDOWS = mode
            cfg.freeze()
            results[mode] = predictor.process_video(
                [f.copy() for f in frames], window=5
            )
    finally:
        cfg.defrost()
        cfg.TPU.PIPELINE_WINDOWS = orig
        cfg.freeze()

    base = results[0]
    for mode in (1, 2):
        got = results[mode]
        assert len(got) == len(base)
        for a, b in zip(base, got):
            np.testing.assert_array_equal(a.track_ids, b.track_ids,
                                          err_msg=f"mode {mode}")
            np.testing.assert_array_equal(a.ctrl_points, b.ctrl_points,
                                          err_msg=f"mode {mode}")
