"""Every shipped YAML config parses, applies derived rules, and builds a model;
the Bernstein sampling matrix matches the reference's closed form."""

import os

import numpy as np
import pytest

CONFIGS = sorted(
    f for f in os.listdir("configs") if f.endswith(".yaml")
)


@pytest.mark.parametrize("name", CONFIGS)
def test_config_builds_model(name):
    from gomatching_tpu.config import setup_eval_cfg, setup_train_cfg
    from gomatching_tpu.models.gomatching import build_model, build_pretrain_model

    cfg = setup_eval_cfg(f"configs/{name}", ["MODEL.WEIGHTS", "''"])
    # derived rule: eval forces ASSO_THRESH_TEST := INFERENCE_TH_TEST (eval.py:220)
    assert cfg.MODEL.ASSO_HEAD.ASSO_THRESH_TEST == cfg.MODEL.TRANSFORMER.INFERENCE_TH_TEST
    m = build_model(cfg)
    assert m.num_queries == cfg.MODEL.TRANSFORMER.NUM_QUERIES
    if "PP" in name:
        assert m.roi_head_variant == "shared"
    else:
        assert m.roi_head_variant == "lst"
    if "BOVText" in name:
        assert m.voc_size == 5462
    if "DSText" in name:
        assert m.num_queries == 300

    tcfg = setup_train_cfg(f"configs/{name}", ["MODEL.WEIGHTS", "''"])
    # derived rule: train forces TH_TEST := TH_TRAIN (train_net.py:167)
    assert tcfg.MODEL.TRANSFORMER.INFERENCE_TH_TEST == tcfg.MODEL.TRANSFORMER.INFERENCE_TH_TRAIN
    build_pretrain_model(tcfg)  # pretraining meta-arch constructs too


def test_unknown_config_key_rejected():
    from gomatching_tpu.config import setup_eval_cfg

    with pytest.raises(Exception):
        setup_eval_cfg("configs/GoMatching_ICDAR15.yaml", ["MODEL.NO_SUCH_KEY", "1"])


def test_bernstein_matrix_closed_form():
    """bernstein_matrix vs the reference's Mtk formula (curve_utils.py:109-120):
    B[i, k] = C(3, k) t_i^k (1-t_i)^(3-k), t linspace(0, 1, n)."""
    from math import comb

    from gomatching_tpu.models.spotter import bernstein_matrix

    n = 25
    got = np.asarray(bernstein_matrix(n))
    t = np.linspace(0, 1, n)
    expected = np.stack(
        [comb(3, k) * t**k * (1 - t) ** (3 - k) for k in range(4)], axis=1
    )
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-9)
    # rows are a partition of unity
    np.testing.assert_allclose(got.sum(1), 1.0, rtol=1e-6)
