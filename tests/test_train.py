"""Training engine smoke tests: losses finite, params update, frozen stays frozen."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

TINY_OPTS = [
    "MODEL.TRANSFORMER.ENC_LAYERS", "1",
    "MODEL.TRANSFORMER.DEC_LAYERS", "1",
    "MODEL.TRANSFORMER.NUM_QUERIES", "8",
    "MODEL.TRANSFORMER.NUM_POINTS", "5",
    "MODEL.TRANSFORMER.HIDDEN_DIM", "64",
    "MODEL.TRANSFORMER.NHEADS", "4",
    "MODEL.TRANSFORMER.DIM_FEEDFORWARD", "64",
    "MODEL.TRANSFORMER.INFERENCE_TH_TRAIN", "0.0001",
    "MODEL.ASSO_HEAD.FC_DIM", "64",
    "MODEL.ASSO_HEAD.ASSO_THRESH", "0.0001",
    "MODEL.WEIGHTS", "''",
]


from gomatching_tpu.utils.synthetic import make_targets


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


def test_train_step_updates_trainable_only(trainer):
    tr, cfg = trainer
    T = 3
    images = np.random.RandomState(0).randn(T, 64, 96, 3).astype(np.float32)
    targets = make_targets(T, npts=5)

    frozen_before = jax.tree.map(np.asarray, tr.state.frozen)
    train_before = jax.tree.map(np.asarray, tr.state.trainable)

    m1 = tr.step(images, None, targets)
    assert np.isfinite(m1["total_loss"])
    assert "loss_res" in m1 and "loss_long_asso" in m1 and "loss_short_asso" in m1

    # trainable moved, frozen untouched
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), tr.state.trainable, train_before
    )
    assert max(jax.tree.leaves(moved)) > 0
    same = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), tr.state.frozen, frozen_before
    )
    assert max(jax.tree.leaves(same)) == 0

    m2 = tr.step(images, None, targets)
    assert np.isfinite(m2["total_loss"])
    assert int(tr.state.step) == 2


def test_asso_ce_loss_prefers_correct_slot():
    from gomatching_tpu.engine.losses import asso_ce_loss

    M, T, nq = 4, 2, 4
    # logits strongly pointing row i -> slot i in both frames
    logits = jnp.full((M, T, nq), -5.0)
    for i in range(min(M, nq)):
        logits = logits.at[i, :, i].set(5.0)
    row_valid = jnp.ones((M,), bool)
    col_valid = jnp.ones((T, nq), bool)
    # two tracks: track k matched to slot k
    K = nq
    asso_gt = jnp.full((K, T), nq)
    asso_gt = asso_gt.at[0, :].set(0).at[1, :].set(1)
    match_cues = jnp.full((M,), -1).at[0].set(0).at[1].set(1)
    track_valid = jnp.zeros((K,), bool).at[0].set(True).at[1].set(True)
    good = asso_ce_loss(logits, row_valid, col_valid, asso_gt, match_cues, track_valid)

    bad_gt = asso_gt.at[0, :].set(3).at[1, :].set(2)
    bad = asso_ce_loss(logits, row_valid, col_valid, bad_gt, match_cues, track_valid)
    assert float(good) < float(bad)


def test_warmup_cosine_schedule():
    from gomatching_tpu.engine.train import warmup_cosine_schedule

    s = warmup_cosine_schedule(1e-3, 1000, warmup_iters=100, warmup_factor=1e-3)
    assert float(s(0)) == pytest.approx(1e-6, rel=1e-3)
    assert float(s(100)) == pytest.approx(1e-3 * 0.5 * (1 + np.cos(np.pi * 0.1)), rel=1e-4)
    assert float(s(1000)) == pytest.approx(0.0, abs=1e-9)


def test_training_loss_decreases():
    """The full training loop learns: association + rescore losses drop on a
    fixed synthetic clip over repeated updates (warmup disabled — the shipped
    schedule's first 1000 iters run at BASE_LR*1e-3, far too small to move in
    a 15-step test)."""
    from gomatching_tpu.config import setup_train_cfg
    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.engine.train import Trainer
    from gomatching_tpu.models.gomatching import build_model

    cfg = setup_train_cfg(
        "configs/GoMatching_ICDAR15.yaml",
        list(TINY_OPTS) + [
            "SOLVER.BASE_LR", "0.001",
            "SOLVER.WARMUP_ITERS", "0",
            "MODEL.ASSO_HEAD.DROPOUT", "0.0",
        ],
    )
    model = build_model(cfg)
    tr = Trainer(cfg, model, init_params(model, image_size=(64, 64)))
    images = np.random.RandomState(1).randn(2, 64, 96, 3).astype(np.float32)
    targets = make_targets(2, npts=5)
    losses = [tr.step(images, None, targets)["total_loss"] for _ in range(15)]
    assert np.isfinite(losses).all()
    assert min(losses[-3:]) < losses[0] * 0.9, losses


def test_pos_emb_trains_when_enabled():
    """With NO_POS_EMB=False (the config/reference default), the learned
    pos_emb/temp_emb get gradients in training — the same boxes/times the
    inference tracker feeds reach associate_tokens (lstmatcher.py:338-346)."""
    from gomatching_tpu.config import setup_train_cfg
    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.engine.train import Trainer
    from gomatching_tpu.models.gomatching import build_model

    cfg = setup_train_cfg(
        "configs/GoMatching_ICDAR15.yaml",
        list(TINY_OPTS) + [
            "MODEL.ASSO_HEAD.NO_POS_EMB", "False",
            "MODEL.ASSO_HEAD.WITH_TEMP_EMB", "True",
            "SOLVER.WARMUP_FACTOR", "1.0",
        ],
    )
    model = build_model(cfg)
    tr = Trainer(cfg, model, init_params(model, image_size=(64, 64)))
    tracker_params = tr.state.trainable["roi_heads"]
    assert "pos_emb" in tracker_params and "temp_emb" in tracker_params
    pos_before = np.asarray(tracker_params["pos_emb"])
    temp_before = np.asarray(tracker_params["temp_emb"])

    images = np.random.RandomState(0).randn(3, 64, 96, 3).astype(np.float32)
    targets = make_targets(3, npts=5)
    m = tr.step(images, None, targets)
    assert np.isfinite(m["total_loss"])
    after = tr.state.trainable["roi_heads"]
    assert np.abs(np.asarray(after["pos_emb"]) - pos_before).max() > 0
    assert np.abs(np.asarray(after["temp_emb"]) - temp_before).max() > 0
