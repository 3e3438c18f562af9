"""Two-stage proposal generation vs a numpy oracle of the reference formula
(deformable_transformer.py:108-139): per-level center grids (x+0.5)/W_valid
tiled to 8 bezier coords, inverse-sigmoid, invalid/out-of-range tokens masked
to +inf and their memory zeroed before enc_output."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_gen_proposals_matches_numpy_oracle():
    from gomatching_tpu.models.spotter import DeepSoloSpotter

    SHAPES = [(4, 6), (2, 3)]
    S = sum(h * w for h, w in SHAPES)
    C = 32
    rng = np.random.RandomState(0)
    memory = rng.randn(1, S, C).astype(np.float32)
    valid = np.ones((1, S), bool)
    valid[0, 5] = False  # one padded token

    spotter = DeepSoloSpotter(
        d_model=C, n_heads=4, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=C, num_queries=4, num_points=5,
        in_channels=(8, 16, 32), num_feature_levels=len(SHAPES),
    )

    got_mem, got_props = None, None

    def run(mdl, mem, val):
        return mdl._gen_proposals(mem, val, SHAPES)

    # initialize only the submodules _gen_proposals touches via init with method
    params = spotter.init(
        jax.random.PRNGKey(0), jnp.asarray(memory), jnp.asarray(valid), method=run
    )
    got_mem, got_props = spotter.apply(
        params, jnp.asarray(memory), jnp.asarray(valid), method=run
    )
    got_mem, got_props = np.asarray(got_mem), np.asarray(got_props)

    # numpy oracle
    props = []
    offset = 0
    for h, w in SHAPES:
        v = valid[0, offset : offset + h * w].reshape(h, w)
        vh, vw = v[:, 0].sum(), v[0, :].sum()
        gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grid = np.stack([(gx + 0.5) / vw, (gy + 0.5) / vh], -1)
        props.append(np.tile(grid.reshape(-1, 2), (1, 4)))
        offset += h * w
    proposals = np.concatenate(props)[None]  # (1, S, 8)
    in_range = ((proposals > 0.01) & (proposals < 0.99)).all(-1, keepdims=True)
    logit = np.log(proposals / (1 - proposals))
    bad = ~valid[..., None] | ~in_range
    expected_props = np.where(bad, np.inf, logit)

    np.testing.assert_allclose(got_props, expected_props, rtol=1e-5, atol=1e-5)

    # masked memory feeds enc_output(LayerNorm(Dense)): zeroed where bad
    p = params["params"]
    mem_masked = np.where(bad, 0.0, memory)
    x = mem_masked @ np.asarray(p["enc_output"]["kernel"]) + np.asarray(p["enc_output"]["bias"])
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    expected_mem = (x - mu) / np.sqrt(var + 1e-5) * np.asarray(
        p["enc_output_norm"]["scale"]
    ) + np.asarray(p["enc_output_norm"]["bias"])
    np.testing.assert_allclose(got_mem, expected_mem, rtol=2e-4, atol=2e-4)
