"""Round-5 training-throughput machinery:

- yuv420 TRAINING wire (TPU.TRAIN_UPLOAD_FORMAT): the I420 clip path through
  ``Trainer._spot_fn`` must equal feeding the host-side decoded roundtrip as
  an rgb-wire clip — pins the wiring (channel order, padding re-zero); the
  codec itself is pinned by tests/test_upload_format.py.
- step_begin/step_finish split + deferred metrics (blocking=False): must be
  numerically identical to the monolithic ``step`` (the overlapped
  train_net.py loop only changes dispatch order).
- MODEL.PRECISION=bfloat16 frozen cast: spotter subtrees bf16, ``frozen_f32``
  keeps the checkpoint copy, the step still runs and is finite.
"""

import numpy as np
import jax
import pytest

from test_train import TINY_OPTS
from gomatching_tpu.utils.synthetic import make_targets


def _build(extra_opts=()):
    from gomatching_tpu.config import setup_train_cfg
    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.engine.train import Trainer
    from gomatching_tpu.models.gomatching import build_model

    cfg = setup_train_cfg(
        "configs/GoMatching_ICDAR15.yaml", list(TINY_OPTS) + list(extra_opts)
    )
    model = build_model(cfg)
    params = init_params(model, image_size=(64, 64))
    return Trainer(cfg, model, params), cfg


@pytest.fixture(scope="module")
def trainer():
    return _build()


def test_yuv420_spot_matches_decoded_rgb(trainer):
    from gomatching_tpu.data.preprocess import decode_i420
    from gomatching_tpu.engine.train import encode_train_clip

    tr, cfg = trainer
    T, H, W = 2, 64, 96
    h, w = 60, 90  # padded canvas: exercises the re-zero
    rng = np.random.RandomState(3)
    raw = np.zeros((T, H, W, 3), np.uint8)
    raw[:, :h, :w] = rng.randint(0, 256, (T, h, w, 3)).astype(np.uint8)
    hw_arr = np.tile(np.asarray([h, w], np.float32)[None], (T, 1))

    yuv = encode_train_clip(raw, cfg.INPUT.FORMAT)
    assert yuv.ndim == 3 and yuv.shape == (T, H * 3 // 2, W)

    # host reference: the same decode the device does, fed as an rgb clip
    dec = np.asarray(decode_i420(yuv))  # BGR [0,255]
    if cfg.INPUT.FORMAT == "RGB":
        dec = dec[..., ::-1]
    out_ref = tr._spot(
        tr.state.frozen, tr.state.trainable, dec.astype(np.uint8), hw_arr
    )
    out_yuv = tr._spot(tr.state.frozen, tr.state.trainable, yuv, hw_arr)
    # atol: the two jits fuse differently (decode in-graph vs on host), so a
    # handful of elements drift a few e-5 through the 6+6-layer stack
    np.testing.assert_allclose(
        np.asarray(out_ref["host_meta"]), np.asarray(out_yuv["host_meta"]),
        rtol=2e-4, atol=1e-4,
    )


def test_encode_train_clip_odd_dims_fallback():
    from gomatching_tpu.engine.train import encode_train_clip

    raw = np.random.RandomState(0).randint(0, 256, (1, 15, 22, 3)).astype(np.uint8)
    assert encode_train_clip(raw, "RGB") is raw


def test_split_step_matches_monolithic():
    from gomatching_tpu.engine.train import fetch_metrics

    rng = np.random.RandomState(11)
    T, H, W = 2, 64, 64
    images = rng.randint(0, 256, (T, H, W, 3)).astype(np.uint8)
    hw = np.tile(np.asarray([H, W], np.float32)[None], (T, 1))
    targets = make_targets(T, npts=5)

    tr_a, _ = _build()
    tr_b, _ = _build()

    m_seq = [tr_a.step(images, hw, targets) for _ in range(2)]

    m_split = []
    tr_b.step_begin(images, hw)
    pending = tr_b.step_finish(targets, blocking=False)
    tr_b.step_begin(images, hw)  # next step dispatched before the fetch
    m_split.append(fetch_metrics(pending))
    m_split.append(fetch_metrics(tr_b.step_finish(targets, blocking=False)))

    for ma, mb in zip(m_seq, m_split):
        assert set(ma) == set(mb)
        for k in ma:
            np.testing.assert_allclose(ma[k], mb[k], rtol=1e-5, atol=1e-6, err_msg=k)


def test_bf16_frozen_cast():
    import jax.numpy as jnp

    tr, _ = _build(("MODEL.PRECISION", "bfloat16"))
    assert tr.frozen_f32 is not None
    for k in ("backbone", "detection_transformer"):
        if k in tr.state.frozen:
            leaf = jax.tree.leaves(tr.state.frozen[k])[0]
            assert leaf.dtype == jnp.bfloat16
            leaf32 = jax.tree.leaves(tr.frozen_f32[k])[0]
            assert leaf32.dtype == jnp.float32
    rng = np.random.RandomState(5)
    images = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    hw = np.tile(np.asarray([64, 64], np.float32)[None], (2, 1))
    m = tr.step(images, hw, make_targets(2, npts=5))
    assert np.isfinite(m["total_loss"])
