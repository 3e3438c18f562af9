"""Weight-converter round-trip + Swin backbone shape tests."""

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
    "MODEL.ASSO_HEAD.FC_DIM", "64",
    "MODEL.WEIGHTS", "''",
]


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


@pytest.mark.parametrize(
    "backbone", ["build_resnet_backbone", "build_swin_backbone", "build_vitaev2_backbone"]
)
def test_converter_round_trip(backbone):
    """Build a torch-style state_dict carrying our init values through the inverse
    transforms; converting it must reproduce the exact param tree."""
    import sys

    sys.path.insert(0, "tools")
    from convert_torch_weights import build_key_map, convert

    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.models.gomatching import build_model

    cfg = setup_eval_cfg(
        "configs/GoMatching_ICDAR15.yaml", list(TINY_OPTS) + ["MODEL.BACKBONE.NAME", backbone]
    )
    model = build_model(cfg)
    params = init_params(model, image_size=(64, 64))
    flat = _flatten(params["params"])

    key_map = build_key_map(cfg)
    sd = {}
    for tk, (kind, target) in key_map.items():
        if kind in ("mha_in_w", "mha_in_b"):
            node, name = target
            leaf = "kernel" if kind == "mha_in_w" else "bias"
            parts = []
            for pn in ("q_proj", "k_proj", "v_proj"):
                v = flat[f"{node}/{name}/{pn}/{leaf}"]
                parts.append(v.T if kind == "mha_in_w" else v)
            sd[tk] = np.concatenate(parts, axis=0)
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
    assert not missing, missing[:5]
    assert not unused, unused[:5]
    cflat = _flatten(converted["params"])
    assert set(cflat) == set(flat), (
        set(flat) - set(cflat), set(cflat) - set(flat))
    for k in flat:
        np.testing.assert_array_equal(cflat[k], flat[k], err_msg=k)

    # converted params must drive the model
    out = model.apply(converted, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_swin_shapes():
    from gomatching_tpu.models.swin import SwinTransformer

    model = SwinTransformer(depths=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["res3"].shape == (1, 8, 12, 192)
    assert out["res4"].shape == (1, 4, 6, 384)
    assert out["res5"].shape == (1, 2, 3, 768)


def test_swin_shifted_window_mask():
    """A shifted block must differ from an unshifted block on the same weights'
    structure but still be finite and shape-preserving on non-divisible sizes."""
    from gomatching_tpu.models.swin import SwinBlock

    x = jnp.asarray(np.random.RandomState(0).randn(1, 10, 13, 32), jnp.float32)
    blk = SwinBlock(32, 4, window_size=7, shift=3)
    params = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
