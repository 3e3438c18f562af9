"""ASSO_HEAD.DROPOUT: active in training, inert at inference (VERDICT r1 #6).

Reference: the matcher transformers are built with dropout=cfg.MODEL.ASSO_HEAD
.DROPOUT (lstmatcher.py:173-221) and torch nn.Dropout fires in train() mode
only (roi_heads/transformer.py:166-258). Our equivalent: ``associate(train=
True)`` + a 'dropout' rng.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gomatching_tpu.models.lst_matcher import LSTMatcherHead


def _head_and_inputs(dropout):
    head = LSTMatcherHead(
        hidden_dim=32, num_points=5, feature_dim=32, num_fc=2, num_heads=4,
        dropout_rate=dropout,
    )
    rng = np.random.RandomState(0)
    qf = jnp.asarray(rng.randn(6, 5, 32).astype(np.float32))
    tokens = jnp.asarray(rng.randn(1, 8, 32).astype(np.float32))
    valid = jnp.ones((1, 8), bool)
    params = head.init(jax.random.PRNGKey(0), qf, tokens, valid)
    return head, params, tokens, valid


def test_dropout_active_in_train_inert_in_eval():
    head, params, tokens, valid = _head_and_inputs(0.1)

    eval_out = head.apply(params, tokens, valid, True, method=LSTMatcherHead.associate)
    eval_out2 = head.apply(params, tokens, valid, True, method=LSTMatcherHead.associate)
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(eval_out2))

    tr1 = head.apply(params, tokens, valid, True, True,
                     method=LSTMatcherHead.associate,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    tr2 = head.apply(params, tokens, valid, True, True,
                     method=LSTMatcherHead.associate,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    # different masks -> different logits; both differ from the eval pass
    assert np.abs(np.asarray(tr1) - np.asarray(tr2)).max() > 1e-6
    assert np.abs(np.asarray(tr1) - np.asarray(eval_out)).max() > 1e-6

    # rate 0.0 head: train mode is a no-op even with an rng
    head0, params0, tokens0, valid0 = _head_and_inputs(0.0)
    a = head0.apply(params0, tokens0, valid0, True, True,
                    method=LSTMatcherHead.associate,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    b = head0.apply(params0, tokens0, valid0, True,
                    method=LSTMatcherHead.associate)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dropout_does_not_change_param_tree():
    """Converted reference checkpoints must load unchanged: dropout adds no params."""
    h0, p0, _, _ = _head_and_inputs(0.0)
    h1, p1, _, _ = _head_and_inputs(0.1)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)


def test_trainer_loss_uses_dropout_when_enabled():
    from gomatching_tpu.config import setup_train_cfg
    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.engine.train import Trainer
    from gomatching_tpu.models.gomatching import build_model
    from gomatching_tpu.utils.synthetic import make_targets

    opts = [
        "MODEL.TRANSFORMER.ENC_LAYERS", "1", "MODEL.TRANSFORMER.DEC_LAYERS", "1",
        "MODEL.TRANSFORMER.NUM_QUERIES", "8", "MODEL.TRANSFORMER.NUM_POINTS", "5",
        "MODEL.TRANSFORMER.HIDDEN_DIM", "64", "MODEL.TRANSFORMER.NHEADS", "4",
        "MODEL.TRANSFORMER.DIM_FEEDFORWARD", "64",
        "MODEL.TRANSFORMER.INFERENCE_TH_TRAIN", "0.0001",
        "MODEL.ASSO_HEAD.FC_DIM", "64", "MODEL.ASSO_HEAD.ASSO_THRESH", "0.0001",
        "MODEL.WEIGHTS", "''",
    ]
    cfg = setup_train_cfg("configs/GoMatching_ICDAR15.yaml", opts)
    assert cfg.MODEL.ASSO_HEAD.DROPOUT == 0.1  # reference default, no YAML override
    model = build_model(cfg)
    params = init_params(model, image_size=(64, 64))
    tr = Trainer(cfg, model, params)
    assert tr.use_dropout

    images = np.random.RandomState(0).randn(2, 48, 64, 3).astype(np.float32)
    spot = tr._spot(tr.state.frozen, tr.state.trainable, images, None)
    spot = {k: np.asarray(v) for k, v in spot.items()}
    b = tr.prepare_batch(spot, make_targets(2, npts=5))
    b["query_features"] = np.asarray(spot["query_features"])

    l_eval, _ = tr._loss_fn(tr.state.trainable, tr.state.frozen, b)
    l1, _ = tr._loss_fn(tr.state.trainable, tr.state.frozen, b, jax.random.PRNGKey(1))
    l2, _ = tr._loss_fn(tr.state.trainable, tr.state.frozen, b, jax.random.PRNGKey(2))
    assert float(l1) != float(l_eval)
    assert float(l1) != float(l2)
