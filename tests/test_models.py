"""Model-stack tests: MHA vs torch oracle, positional encodings, spotter shapes."""

import numpy as np
import jax
import jax.numpy as jnp


def test_mha_matches_torch():
    import torch

    from gomatching_tpu.models.layers import MultiHeadAttention

    B, N, M, C, H = 2, 7, 5, 16, 4
    rng = np.random.RandomState(0)
    q = rng.randn(B, M, C).astype(np.float32)
    kv = rng.randn(B, N, C).astype(np.float32)

    mod = MultiHeadAttention(num_heads=H)
    params = mod.init(jax.random.PRNGKey(0), q, kv, kv)

    tm = torch.nn.MultiheadAttention(C, H, batch_first=True)
    p = params["params"]
    with torch.no_grad():
        w = np.concatenate(
            [p["q_proj"]["kernel"].T, p["k_proj"]["kernel"].T, p["v_proj"]["kernel"].T], 0
        )
        tm.in_proj_weight.copy_(torch.from_numpy(np.asarray(w)))
        tm.in_proj_bias.copy_(
            torch.from_numpy(
                np.concatenate([p["q_proj"]["bias"], p["k_proj"]["bias"], p["v_proj"]["bias"]])
            )
        )
        tm.out_proj.weight.copy_(torch.from_numpy(np.asarray(p["out_proj"]["kernel"]).T))
        tm.out_proj.bias.copy_(torch.from_numpy(np.asarray(p["out_proj"]["bias"])))
        expected = tm(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv))[0].numpy()

    got = np.asarray(mod.apply(params, q, kv, kv))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_position_encoding_2d_matches_reference_formula():
    """Cross-check against a direct numpy transcription of the cumsum formula
    (adet/layers/pos_encoding.py:62-82)."""
    from gomatching_tpu.models.pos_encoding import position_encoding_2d

    B, H, W, F = 1, 5, 7, 8
    mask = np.zeros((B, H, W), bool)
    mask[:, 4:, :] = True
    mask[:, :, 6:] = True

    not_mask = ~mask
    y_embed = np.cumsum(not_mask, 1).astype(np.float32)
    x_embed = np.cumsum(not_mask, 2).astype(np.float32)
    eps = 1e-6
    scale = 2 * np.pi
    y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
    x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = 10000.0 ** (2 * (np.arange(F) // 2) / F)
    px = x_embed[..., None] / dim_t
    py = y_embed[..., None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])], -1).reshape(B, H, W, F)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])], -1).reshape(B, H, W, F)
    expected = np.concatenate([py, px], -1)

    got = np.asarray(position_encoding_2d((B, H, W), F, 10000.0, jnp.asarray(mask)))
    # Fully-masked rows/columns get sin(-0.5/eps) garbage by construction in the
    # reference too — compare only positions whose row AND column have valid pixels.
    valid = ~mask
    np.testing.assert_allclose(got[valid], expected[valid], rtol=1e-4, atol=1e-5)
    assert np.isfinite(got).all()

    # no-mask fast path must equal the all-valid mask path
    got_fast = np.asarray(position_encoding_2d((B, H, W), F, 10000.0, None))
    got_mask = np.asarray(position_encoding_2d((B, H, W), F, 10000.0, jnp.zeros((B, H, W), bool)))
    np.testing.assert_allclose(got_fast, got_mask, rtol=1e-5, atol=1e-6)


def test_spotter_shapes():
    from gomatching_tpu.models.spotter import DeepSoloSpotter

    B, C = 1, 64
    nq, npts, voc = 8, 5, 10
    spotter = DeepSoloSpotter(
        d_model=C,
        n_heads=4,
        num_encoder_layers=1,
        num_decoder_layers=2,
        dim_feedforward=64,
        num_queries=nq,
        num_points=npts,
        voc_size=voc,
        in_channels=(8, 16, 32),
    )
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(B, 16, 16, 8), jnp.float32),
        jnp.asarray(rng.randn(B, 8, 8, 16), jnp.float32),
        jnp.asarray(rng.randn(B, 4, 4, 32), jnp.float32),
    ]
    from gomatching_tpu.models.pos_encoding import position_encoding_2d

    pos = [position_encoding_2d((B, f.shape[1], f.shape[2]), C // 2, 10000.0, None) for f in feats]
    params = spotter.init(jax.random.PRNGKey(0), feats, pos, None)
    out = spotter.apply(params, feats, pos, None)
    assert out["pred_logits"].shape == (B, nq, npts, 1)
    assert out["pred_text_logits"].shape == (B, nq, npts, voc + 1)
    assert out["pred_ctrl_points"].shape == (B, nq, npts, 2)
    assert out["pred_bd_points"].shape == (B, nq, npts, 4)
    assert out["query_features"].shape == (B, nq, npts, C)
    assert np.isfinite(np.asarray(out["pred_ctrl_points"])).all()
    assert (np.asarray(out["pred_ctrl_points"]) >= 0).all()
    assert (np.asarray(out["pred_ctrl_points"]) <= 1).all()


def test_spotter_mask_equivalence():
    """All-valid masks must reproduce the no-mask fast path."""
    from gomatching_tpu.models.pos_encoding import position_encoding_2d
    from gomatching_tpu.models.spotter import DeepSoloSpotter

    B, C = 1, 64
    spotter = DeepSoloSpotter(
        d_model=C,
        n_heads=4,
        num_encoder_layers=1,
        num_decoder_layers=1,
        dim_feedforward=32,
        num_queries=4,
        num_points=3,
        voc_size=5,
        in_channels=(8, 16, 32),
    )
    rng = np.random.RandomState(1)
    feats = [
        jnp.asarray(rng.randn(B, 8, 8, 8), jnp.float32),
        jnp.asarray(rng.randn(B, 4, 4, 16), jnp.float32),
        jnp.asarray(rng.randn(B, 2, 2, 32), jnp.float32),
    ]
    pos = [position_encoding_2d((B, f.shape[1], f.shape[2]), C // 2, 10000.0, None) for f in feats]
    params = spotter.init(jax.random.PRNGKey(0), feats, pos, None)
    out_nomask = spotter.apply(params, feats, pos, None)
    masks = [jnp.zeros((B, f.shape[1], f.shape[2]), bool) for f in feats]
    pos_m = [
        position_encoding_2d((B, f.shape[1], f.shape[2]), C // 2, 10000.0, m)
        for f, m in zip(feats, masks)
    ]
    out_mask = spotter.apply(params, feats, pos_m, masks)
    np.testing.assert_allclose(
        np.asarray(out_nomask["pred_ctrl_points"]),
        np.asarray(out_mask["pred_ctrl_points"]),
        rtol=1e-4,
        atol=1e-5,
    )


def test_resnet_shapes():
    from gomatching_tpu.models.resnet import ResNet

    model = ResNet(depth=50, out_features=("res3", "res4", "res5"))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["res3"].shape == (1, 8, 8, 512)
    assert out["res4"].shape == (1, 4, 4, 1024)
    assert out["res5"].shape == (1, 2, 2, 2048)
