"""Golden pretraining-loss parity: SpotterCriterion vs the ACTUAL reference.

tests/golden/make_golden_losses.py ran the reference SetCriterion + Hungarian
matchers (losses.py:44-297, matcher.py:28-261) verbatim over synthetic head
outputs (final + aux decoder layer + encoder two-stage proposals) and targets
with an empty-GT image and an all-unknown text, and committed every per-loss
value. Our SpotterCriterion must reproduce loss[k] * weight[k] for every key
(ours bakes the weight_dict in)."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden", "data", "losses_tiny.npz")
sys.path.insert(0, os.path.join(HERE, "golden"))

B, NQ, NPTS, VOC, S, TLEN, MAXG = 2, 8, 5, 10, 60, 25, 4


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_criterion_matches_reference(golden):
    from ref_loader import tiny_cfg

    from gomatching_tpu.engine.spotter_losses import SpotterCriterion

    cfg = tiny_cfg()
    crit = SpotterCriterion(cfg)

    def bundle(name):
        return {
            "pred_logits": jnp.asarray(golden[f"in.{name}.pred_logits"]),
            "pred_text_logits": jnp.asarray(golden[f"in.{name}.pred_text_logits"]),
            "pred_ctrl_points": jnp.asarray(golden[f"in.{name}.pred_ctrl_points"]),
            "pred_bd_points": jnp.asarray(golden[f"in.{name}.pred_bd_points"]),
        }

    outputs = {
        **bundle("final"),
        "aux_outputs": [bundle("aux0")],
        "enc_logits": jnp.asarray(golden["in.enc.pred_logits"]),
        "enc_beziers": jnp.asarray(golden["in.enc.pred_beziers"]),
    }
    n0 = golden["tg0.labels"].shape[0]
    targets = {
        "valid": np.zeros((B, MAXG), bool),
        "labels": np.zeros((B, MAXG), np.int32),
        "ctrl_points": np.zeros((B, MAXG, NPTS, 2), np.float32),
        "texts": np.full((B, MAXG, TLEN), VOC, np.int32),
        "beziers": np.zeros((B, MAXG, 4, 2), np.float32),
        "bd_points": np.zeros((B, MAXG, NPTS, 4), np.float32),
    }
    targets["valid"][0, :n0] = True
    targets["ctrl_points"][0, :n0] = golden["tg0.ctrl_points"]
    targets["texts"][0, :n0] = golden["tg0.texts"]
    targets["beziers"][0, :n0] = golden["tg0.beziers"]
    targets["bd_points"][0, :n0] = golden["tg0.bd_points"]
    targets = {k: jnp.asarray(v) for k, v in targets.items()}

    losses = crit(outputs, targets)
    for k in sorted(x[5:] for x in golden.files if x.startswith("loss.")):
        want = float(golden[f"loss.{k}"]) * float(golden[f"w.{k}"])
        got = float(losses[k])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6, err_msg=k)
