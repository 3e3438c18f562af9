"""Sharded inference: the spot batch's frame axis rides the mesh data axis."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_predictor_sharded_spot():
    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import VideoPredictor
    from gomatching_tpu.parallel import build_mesh

    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs multiple devices")
    mesh = build_mesh()
    cfg = setup_eval_cfg("configs/GoMatching_ICDAR15.yaml", [
        "MODEL.TRANSFORMER.ENC_LAYERS", "1", "MODEL.TRANSFORMER.DEC_LAYERS", "1",
        "MODEL.TRANSFORMER.NUM_QUERIES", "8", "MODEL.TRANSFORMER.NUM_POINTS", "5",
        "MODEL.TRANSFORMER.HIDDEN_DIM", "64", "MODEL.TRANSFORMER.NHEADS", "4",
        "MODEL.TRANSFORMER.DIM_FEEDFORWARD", "64",
        "MODEL.TRANSFORMER.INFERENCE_TH_TEST", "0.0001",
        "MODEL.ASSO_HEAD.FC_DIM", "64", "INPUT.MIN_SIZE_TEST", "64",
        "INPUT.MAX_SIZE_TEST", "128", "MODEL.WEIGHTS", "''",
        "TPU.SPOT_BATCH", str(n),
    ])
    pred = VideoPredictor(cfg, mesh=mesh)
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (96, 128, 3), np.uint8) for _ in range(n)]
    dets = pred.spot_frames(frames)
    assert len(dets) == n

    # single-device predictor must produce identical detections
    pred1 = VideoPredictor(cfg, params=pred.params)
    dets1 = pred1.spot_frames(frames)
    for a, b in zip(dets, dets1):
        np.testing.assert_allclose(a.scores, b.scores, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(a.boxes, b.boxes, rtol=1e-4, atol=1e-4)
