"""GoMatching++ (SHA_FFN_CRSATTN shared decoder-only matcher): forward,
association, converter round-trip on the PP config."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

TINY_OPTS = [
    "MODEL.TRANSFORMER.ENC_LAYERS", "1",
    "MODEL.TRANSFORMER.DEC_LAYERS", "1",
    "MODEL.TRANSFORMER.NUM_QUERIES", "8",
    "MODEL.TRANSFORMER.NUM_POINTS", "5",
    "MODEL.TRANSFORMER.HIDDEN_DIM", "64",
    "MODEL.TRANSFORMER.NHEADS", "4",
    "MODEL.TRANSFORMER.DIM_FEEDFORWARD", "64",
    "MODEL.ASSO_HEAD.FC_DIM", "64",
    "MODEL.WEIGHTS", "''",
]


@pytest.fixture(scope="module")
def pp_model_and_params():
    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.models.gomatching import build_model

    cfg = setup_eval_cfg("configs/GoMatching_PP_ICDAR15.yaml", list(TINY_OPTS))
    assert cfg.MODEL.ROI_HEADS.NAME == "SHA_FFN_CRSATTN"
    model = build_model(cfg)
    assert model.roi_head_variant == "shared"
    params = init_params(model, image_size=(64, 64))
    return cfg, model, params


def test_pp_spot_and_associate(pp_model_and_params):
    from gomatching_tpu.models.gomatching import GoMatchingModel

    cfg, model, params = pp_model_and_params
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out = model.apply(params, imgs, None, method=GoMatchingModel.spot_and_detect)
    assert np.isfinite(np.asarray(out["scores"])).all()
    assert out["reid"].shape[-1] == 64

    toks = out["reid"][:, :4]
    valid = jnp.ones(toks.shape[:2], bool)
    short = model.apply(params, toks, valid, True, method=GoMatchingModel.associate)
    long = model.apply(params, toks, valid, False, method=GoMatchingModel.associate)
    assert np.isfinite(np.asarray(short)).all()
    assert np.isfinite(np.asarray(long)).all()
    # the shared variant still has distinct global/local score heads
    # (shared_ffn_crsattn.py:190,207), so outputs may differ
    assert short.shape == long.shape


def test_pp_fewer_params_than_lst(pp_model_and_params):
    """GoMatching++ collapses two matchers into one shared decoder-only
    transformer -> fewer tracker params (README.md:305-333: 11.80M vs 32.79M)."""
    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.models.gomatching import build_model

    _, _, pp_params = pp_model_and_params
    cfg = setup_eval_cfg("configs/GoMatching_ICDAR15.yaml", list(TINY_OPTS))
    lst_params = init_params(build_model(cfg), image_size=(64, 64))

    def count(tree):
        return sum(x.size for x in jax.tree.leaves(tree))

    assert count(pp_params["params"]["roi_heads"]) < count(lst_params["params"]["roi_heads"])


def test_pp_converter_round_trip(pp_model_and_params):
    import sys

    sys.path.insert(0, "tools")
    from convert_torch_weights import build_key_map, convert

    cfg, model, params = pp_model_and_params

    def _flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(_flatten(v, key))
            else:
                out[key] = np.asarray(v)
        return out

    flat = _flatten(params["params"])
    key_map = build_key_map(cfg)
    sd = {}
    for tk, (kind, target) in key_map.items():
        if kind in ("mha_in_w", "mha_in_b"):
            node, name = target
            leaf = "kernel" if kind == "mha_in_w" else "bias"
            parts = [
                flat[f"{node}/{name}/{pn}/{leaf}"] for pn in ("q_proj", "k_proj", "v_proj")
            ]
            sd[tk] = np.concatenate(
                [p.T if kind == "mha_in_w" else p for p in parts], axis=0
            )
            continue
        node, *path = target
        v = flat[f"{node}/" + "/".join(path)]
        if kind == "linear_w":
            sd[tk] = v.T
        elif kind == "conv_w":
            sd[tk] = v.transpose(3, 2, 0, 1)
        elif kind == "point_embed":
            sd[tk] = v.reshape(-1, v.shape[-1])
        else:
            sd[tk] = v
    converted, missing, unused = convert(sd, cfg)
    assert not missing and not unused, (missing[:5], unused[:5])
    cflat = _flatten(converted["params"])
    assert set(cflat) == set(flat)
