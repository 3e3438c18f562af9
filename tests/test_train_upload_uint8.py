"""uint8 training wire format (TPU.TRAIN_UPLOAD_UINT8) parity.

The trainer accepts raw uint8 clips and normalizes in-graph — the reference's
own order (gom_lstmatcher.py:159-169: per-image normalize on device, then
ImageList.from_tensors zero-pads). These tests pin the device path to the host
normalize-then-pad path: the eager normalize_wire_frames op is bit-exact vs
numpy, and the full spot forward matches to near machine eps (XLA folds the
in-graph divide into a reciprocal multiply, so jit outputs differ from the
host-normalized run by ~1 ulp of the inputs).
"""

import numpy as np
import jax
import pytest

from test_train import TINY_OPTS


@pytest.fixture(scope="module")
def trainer():
    from gomatching_tpu.config import setup_train_cfg
    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.engine.train import Trainer
    from gomatching_tpu.models.gomatching import build_model

    cfg = setup_train_cfg("configs/GoMatching_ICDAR15.yaml", list(TINY_OPTS))
    model = build_model(cfg)
    params = init_params(model, image_size=(64, 64))
    return Trainer(cfg, model, params), cfg


def _host_normalized(raw, cfg, h, w):
    """The f32 host path: normalize true pixels, zero the canvas padding."""
    mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
    std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
    out = np.zeros(raw.shape, np.float32)
    out[:, :h, :w] = (raw[:, :h, :w].astype(np.float32) - mean) / std
    return out


@pytest.mark.parametrize("hw", [(64, 96), (60, 90)])  # full canvas / padded
def test_uint8_spot_matches_f32(trainer, hw):
    tr, cfg = trainer
    T, H, W = 2, 64, 96
    h, w = hw
    rng = np.random.RandomState(7)
    raw = np.zeros((T, H, W, 3), np.uint8)
    raw[:, :h, :w] = rng.randint(0, 256, (T, h, w, 3)).astype(np.uint8)
    hw_arr = np.tile(np.asarray([h, w], np.float32)[None], (T, 1))

    f32 = _host_normalized(raw, cfg, h, w)
    out_f = tr._spot(tr.state.frozen, tr.state.trainable, f32, hw_arr)
    out_u = tr._spot(tr.state.frozen, tr.state.trainable, raw, hw_arr)
    np.testing.assert_allclose(
        np.asarray(out_f["host_meta"]), np.asarray(out_u["host_meta"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_f["query_features"]), np.asarray(out_u["query_features"]),
        rtol=2e-4, atol=2e-5,
    )


def test_normalize_wire_frames_values():
    from gomatching_tpu.engine.train import normalize_wire_frames

    rng = np.random.RandomState(1)
    raw = rng.randint(0, 256, (1, 16, 24, 3)).astype(np.uint8)
    mean = np.asarray([103.5, 116.3, 123.7], np.float32)
    std = np.asarray([57.4, 57.1, 58.4], np.float32)
    hw = np.asarray([[12, 20]], np.float32)
    got = np.asarray(
        normalize_wire_frames(jax.numpy.asarray(raw), mean, std, jax.numpy.asarray(hw))
    )
    want = (raw.astype(np.float32) - mean) / std
    want[:, 12:, :] = 0.0
    want[:, :, 20:] = 0.0
    np.testing.assert_array_equal(got, want)


def test_normalize_clip_raw_roundtrip():
    """normalize_clip(raw=True) + in-graph normalize == normalize_clip(f32)."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from train_net import normalize_clip
    from gomatching_tpu.engine.train import normalize_wire_frames

    class S:
        image_hw = (30, 45)
        images = [
            np.random.RandomState(i).randint(0, 256, (30, 45, 3)).astype(np.float32)
            for i in range(2)
        ]

    mean = [103.5, 116.3, 123.7]
    std = [57.4, 57.1, 58.4]
    f32, (h, w) = normalize_clip(S(), mean, std)
    raw, _ = normalize_clip(S(), mean, std, raw=True)
    assert raw.dtype == np.uint8 and raw.shape == f32.shape
    hw = np.tile(np.asarray([[h, w]], np.float32), (2, 1))
    dev = np.asarray(
        normalize_wire_frames(
            jax.numpy.asarray(raw),
            np.asarray(mean, np.float32),
            np.asarray(std, np.float32),
            jax.numpy.asarray(hw),
        )
    )
    np.testing.assert_array_equal(dev, f32)
