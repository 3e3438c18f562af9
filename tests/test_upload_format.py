"""I420 wire-format parity: encode_i420 (host/cv2) -> decode_i420 (device)
must reproduce the original BGR frames within cv2's own I420 roundtrip error
(chroma subsampling is the only loss; the decode mirrors cv2's nearest
chroma upsampling, so the bound is identical: mean ~1.4 LSB, max 9)."""

import numpy as np
import pytest


def _structured_frames(b=2, h=96, w=128):
    rng = np.random.RandomState(3)
    gy, gx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(b):
        base = (128 + 60 * np.sin(gx / (13.0 + i)) + 40 * np.cos(gy / 17.0)).astype(
            np.uint8
        )
        fr = np.stack([base, base // 2 + 30, 255 - base], -1).astype(np.uint8)
        for _ in range(6):
            y0, x0 = rng.randint(0, h - 20), rng.randint(0, w - 40)
            fr[y0 : y0 + 15, x0 : x0 + 35] = rng.randint(0, 255, 3)
        out.append(fr)
    return np.stack(out)


def test_i420_roundtrip_h_not_div4():
    """Byte-based chroma split: heights divisible by 2 but not 4 (e.g. 718)
    end the U plane mid-row of the I420 buffer and must still roundtrip."""
    cv2 = pytest.importorskip("cv2")
    from gomatching_tpu.data.preprocess import decode_i420, encode_i420

    frames = _structured_frames(b=1, h=70, w=64)
    wire = encode_i420(frames)
    back = np.asarray(decode_i420(wire))
    err = np.abs(back - frames.astype(np.float32))
    cv_back = np.stack(
        [cv2.cvtColor(wf, cv2.COLOR_YUV2BGR_I420) for wf in wire]
    ).astype(np.float32)
    cv_err = np.abs(cv_back - frames.astype(np.float32))
    assert err.mean() <= cv_err.mean() + 0.5
    assert err.max() <= cv_err.max() + 4


def test_i420_roundtrip_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    from gomatching_tpu.data.preprocess import decode_i420, encode_i420

    frames = _structured_frames()
    wire = encode_i420(frames)
    assert wire.shape == (2, 96 * 3 // 2, 128) and wire.dtype == np.uint8
    back = np.asarray(decode_i420(wire))
    err = np.abs(back - frames.astype(np.float32))
    # cv2's own YUV2BGR_I420 roundtrip on the same frames is the yardstick
    cv_back = np.stack(
        [cv2.cvtColor(wf, cv2.COLOR_YUV2BGR_I420) for wf in wire]
    ).astype(np.float32)
    cv_err = np.abs(cv_back - frames.astype(np.float32))
    assert err.mean() <= cv_err.mean() + 0.5
    assert err.max() <= cv_err.max() + 4


def test_predictor_yuv420_e2e(tiny_eval_cfg_opts=None):
    """The yuv420 predictor path runs the full video pipeline and yields the
    same detection schema; with coarse (structured-frame) inputs the spot
    scores of rgb vs yuv420 paths stay close (wire format is near-lossless)."""
    pytest.importorskip("cv2")
    import jax.numpy as jnp

    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import VideoPredictor

    tiny = [
        "MODEL.WEIGHTS", "",
        "INPUT.MIN_SIZE_TEST", 96, "INPUT.MAX_SIZE_TEST", 128,
        "MODEL.TRANSFORMER.ENC_LAYERS", 1, "MODEL.TRANSFORMER.DEC_LAYERS", 1,
        "MODEL.TRANSFORMER.NUM_QUERIES", 8, "MODEL.TRANSFORMER.NUM_POINTS", 5,
        "MODEL.TRANSFORMER.HIDDEN_DIM", 64, "MODEL.TRANSFORMER.NHEADS", 4,
        "MODEL.TRANSFORMER.DIM_FEEDFORWARD", 64,
        "TPU.SPOT_BATCH", 2,
    ]
    frames = list(_structured_frames(b=4))

    cfg = setup_eval_cfg("configs/GoMatching_ICDAR15.yaml", tiny)
    pred_rgb = VideoPredictor(cfg, params=None)
    cfg_y = setup_eval_cfg(
        "configs/GoMatching_ICDAR15.yaml", tiny + ["TPU.UPLOAD_FORMAT", "yuv420"]
    )
    pred_yuv = VideoPredictor(cfg_y, params=pred_rgb.params)

    spot_r = pred_rgb._raw_spot_fn((96, 128), (96, 128))
    spot_y = pred_yuv._raw_spot_fn((96, 128), (96, 128))
    raw = np.stack(frames[:2])
    th = jnp.float32(0.0)
    out_r = np.asarray(spot_r(pred_rgb.params, jnp.asarray(raw), th))
    out_y = np.asarray(
        spot_y(pred_yuv.params, jnp.asarray(pred_yuv.encode_frames(raw)), th)
    )
    # identical packing layout; scores (channel 0) track the rgb path (an
    # UNTRAINED model amplifies the ~1-LSB wire error chaotically, so this is
    # a loose wiring check — the real parity bound is the roundtrip test)
    assert out_r.shape == out_y.shape
    np.testing.assert_allclose(out_y[..., 0], out_r[..., 0], atol=0.2)

    tracked = pred_yuv.process_video(frames, {})
    assert len(tracked) == 4
