"""DeepSolo pretraining criterion: CTC cost vs torch oracle, matcher sanity,
end-to-end finite losses + gradient flow through the tiny spotter."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def test_ctc_cost_matrix_matches_torch():
    from gomatching_tpu.engine.spotter_losses import ctc_cost_matrix

    rng = np.random.RandomState(0)
    nq, G, T, voc = 5, 3, 10, 8
    logits = rng.randn(nq, T, voc + 1).astype(np.float32)
    texts = np.full((G, T), voc, np.int64)
    texts[0, :4] = [1, 2, 3, 2]
    texts[1, :1] = [5]
    texts[2, :2] = [7, 0]

    got = np.asarray(ctc_cost_matrix(jnp.asarray(logits), jnp.asarray(texts), voc))

    src = F.log_softmax(torch.from_numpy(logits), dim=-1).permute(1, 0, 2)  # (T, nq, K)
    for g in range(G):
        tl = int((texts[g] != voc).sum())
        tgt = torch.from_numpy(texts[g][:tl])
        ref = F.ctc_loss(
            src,
            tgt.unsqueeze(0).repeat(nq, 1),
            torch.full((nq,), T, dtype=torch.long),
            torch.full((nq,), tl, dtype=torch.long),
            blank=voc,
            reduction="none",
            zero_infinity=True,
        ) / tl
        np.testing.assert_allclose(got[:, g], ref.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_unk_ignore_rule():
    from gomatching_tpu.engine.spotter_losses import UNK_INDEX, ctc_cost_matrix

    rng = np.random.RandomState(1)
    voc, T = 37, 6
    logits = rng.randn(2, T, voc + 1).astype(np.float32)
    texts = np.full((2, T), voc, np.int64)
    texts[0, 0] = UNK_INDEX  # '###' -> cost must be zeroed
    texts[1, :2] = [4, 5]
    got = np.asarray(ctc_cost_matrix(jnp.asarray(logits), jnp.asarray(texts), voc))
    assert np.all(got[:, 0] == 0.0)
    assert np.all(got[:, 1] != 0.0)


def test_match_ctrl_points_prefers_closer_gt():
    from gomatching_tpu.engine.spotter_losses import assign, match_ctrl_points_cost

    nq, G, npts, voc = 4, 2, 3, 5
    rng = np.random.RandomState(2)
    pred_pts = np.zeros((1, nq, npts, 2), np.float32)
    pred_pts[0, 1] = 0.25
    pred_pts[0, 3] = 0.75
    tgt_pts = np.zeros((1, G, npts, 2), np.float32)
    tgt_pts[0, 0] = 0.25
    tgt_pts[0, 1] = 0.75
    outputs = {
        "pred_logits": jnp.zeros((1, nq, npts, 1)),
        "pred_ctrl_points": jnp.asarray(pred_pts),
        "pred_text_logits": jnp.asarray(rng.randn(1, nq, npts, voc + 1), jnp.float32),
    }
    targets = {
        "ctrl_points": jnp.asarray(tgt_pts),
        "texts": jnp.full((1, G, npts), voc, jnp.int32),
        "valid": jnp.ones((1, G), bool),
    }
    m = np.asarray(assign(*match_ctrl_points_cost(outputs, targets, voc, 1.0, 1.0, 0.0)))
    assert m[0, 1] == 0 and m[0, 3] == 1
    assert m[0, 0] == -1 and m[0, 2] == -1


def test_criterion_end_to_end_tiny_spotter():
    from gomatching_tpu.config import setup_train_cfg
    from gomatching_tpu.engine.spotter_losses import SpotterCriterion
    from gomatching_tpu.models.gomatching import build_model
    from gomatching_tpu.models.spotter import DeepSoloSpotter

    tiny = [
        "MODEL.TRANSFORMER.ENC_LAYERS", "1",
        "MODEL.TRANSFORMER.DEC_LAYERS", "2",
        "MODEL.TRANSFORMER.NUM_QUERIES", "8",
        "MODEL.TRANSFORMER.NUM_POINTS", "5",
        "MODEL.TRANSFORMER.HIDDEN_DIM", "64",
        "MODEL.TRANSFORMER.NHEADS", "4",
        "MODEL.TRANSFORMER.DIM_FEEDFORWARD", "64",
        "MODEL.TRANSFORMER.VOC_SIZE", "37",
        "MODEL.WEIGHTS", "''",
    ]
    cfg = setup_train_cfg("configs/GoMatching_ICDAR15.yaml", tiny)
    base = build_model(cfg)
    spotter = DeepSoloSpotter(
        d_model=64, n_heads=4, num_encoder_layers=1, num_decoder_layers=2,
        dim_feedforward=64, num_queries=8, num_points=5, voc_size=37,
        in_channels=(512, 1024, 2048),
        return_enc_outputs=True, return_aux_outputs=True,
    )
    del base

    rng = np.random.RandomState(3)
    B, C = 1, 64
    feats = [jnp.asarray(rng.randn(B, 8, 8, 512), jnp.float32),
             jnp.asarray(rng.randn(B, 4, 4, 1024), jnp.float32),
             jnp.asarray(rng.randn(B, 2, 2, 2048), jnp.float32)]
    from gomatching_tpu.models.pos_encoding import position_encoding_2d
    pos = [position_encoding_2d((B, f.shape[1], f.shape[2]), C // 2, 10000.0, None)
           for f in feats]
    params = spotter.init(jax.random.PRNGKey(0), feats, pos, None)

    G, npts, T = 3, 5, 5
    targets = {
        "valid": jnp.asarray([[True, True, False]]),
        "labels": jnp.zeros((B, G), jnp.int32),
        "ctrl_points": jnp.asarray(rng.rand(B, G, npts, 2), jnp.float32),
        "bd_points": jnp.asarray(rng.rand(B, G, npts, 4), jnp.float32),
        "texts": jnp.where(
            jnp.arange(T)[None, None] < 3,
            jnp.asarray(rng.randint(0, 36, (B, G, T)), jnp.int32), 37),
        "beziers": jnp.asarray(rng.rand(B, G, 4, 2), jnp.float32),
    }
    crit = SpotterCriterion(cfg)

    def total_loss(p):
        out = spotter.apply(p, feats, pos, None)
        losses = crit(out, targets)
        return sum(jax.tree.leaves(losses)), losses

    (tot, losses), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
    assert np.isfinite(float(tot)), losses
    # aux + enc losses present
    assert "loss_ce_0" in losses and "loss_ce_enc" in losses and "loss_bezier_enc" in losses
    assert all(np.isfinite(float(v)) for v in losses.values()), losses
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads)))
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_pretrainer_step_decreases_loss():
    """Two steps of the full-model pretrainer on a fixed tiny batch: losses stay
    finite and the optimizer moves the params."""
    import jax.numpy as jnp

    from gomatching_tpu.config import setup_train_cfg
    from gomatching_tpu.engine.pretrain import SpotterPretrainer
    from gomatching_tpu.models.gomatching import build_pretrain_model

    tiny = [
        "MODEL.TRANSFORMER.ENC_LAYERS", "1",
        "MODEL.TRANSFORMER.DEC_LAYERS", "1",
        "MODEL.TRANSFORMER.NUM_QUERIES", "8",
        "MODEL.TRANSFORMER.NUM_POINTS", "5",
        "MODEL.TRANSFORMER.HIDDEN_DIM", "64",
        "MODEL.TRANSFORMER.NHEADS", "4",
        "MODEL.TRANSFORMER.DIM_FEEDFORWARD", "64",
        "MODEL.WEIGHTS", "''",
        "SOLVER.CLIP_GRADIENTS.ENABLED", "True",
        "SOLVER.CLIP_GRADIENTS.CLIP_VALUE", "0.1",
    ]
    cfg = setup_train_cfg("configs/GoMatching_ICDAR15.yaml", tiny)
    model = build_pretrain_model(cfg)
    from gomatching_tpu.engine.predictor import init_params

    params = init_params(model, image_size=(128, 128))
    tr = SpotterPretrainer(cfg, model, params)

    rng = np.random.RandomState(0)
    B, G, npts, T = 1, 2, 5, 5
    images = rng.randn(B, 64, 96, 3).astype(np.float32)
    targets = {
        "valid": np.asarray([[True, True]]),
        "labels": np.zeros((B, G), np.int32),
        "ctrl_points": rng.rand(B, G, npts, 2).astype(np.float32),
        "bd_points": rng.rand(B, G, npts, 4).astype(np.float32),
        "texts": np.where(np.arange(T)[None, None] < 2,
                          rng.randint(0, 36, (B, G, T)), 37).astype(np.int32),
        "beziers": rng.rand(B, G, 4, 2).astype(np.float32),
    }
    p0 = jax.tree.leaves(tr.state.params)[0].copy()
    l1 = tr.step(images, targets)
    l2 = tr.step(images, targets)
    assert np.isfinite(l1["total_loss"]) and np.isfinite(l2["total_loss"])
    p1 = jax.tree.leaves(tr.state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
