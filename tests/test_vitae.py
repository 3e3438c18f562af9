"""ViTAEv2 backbone: numerics vs a plain-torch oracle + trunk shape checks.

The oracle re-derives the reference's module math (ReductionCell.py PRM/PCM,
token_transformer.py Attention) with plain torch (no timm), weights copied from
the flax params, so it validates padding formulas, grouped convs, and the T2T
v-skip — the parts most likely to silently diverge.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def _np(x):
    return np.asarray(x)


def test_prm_matches_torch():
    import math

    from gomatching_tpu.models.vitae import PRM

    rng = np.random.RandomState(0)
    H, W, Cin, E, k, s = 17, 23, 3, 8, 7, 4
    dil = (1, 2, 3, 4)
    x = rng.randn(1, H, W, Cin).astype(np.float32)

    m = PRM(E, k, s, dil)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = _np(m.apply(params, jnp.asarray(x)))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    outs = []
    for i, d in enumerate(dil):
        wgt = _np(params["params"][f"conv{i}"]["kernel"])  # (kh, kw, cin, cout)
        b = _np(params["params"][f"conv{i}"]["bias"])
        pad = math.ceil(((k - 1) * d + 1 - s) / 2)
        y = F.conv2d(
            xt,
            torch.from_numpy(wgt.transpose(3, 2, 0, 1)).contiguous(),
            torch.from_numpy(b),
            stride=s,
            padding=pad,
            dilation=d,
        )
        outs.append(F.gelu(y))
    expected = torch.cat(outs, dim=1).permute(0, 2, 3, 1).numpy()
    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


def test_pcm_grouped_matches_torch():
    from gomatching_tpu.models.vitae import PCM

    rng = np.random.RandomState(1)
    H, W, C, mid, out_c, g = 12, 14, 16, 32, 16, 4
    x = rng.randn(1, H, W, C).astype(np.float32)

    m = PCM((mid, mid, out_c), (2, 2, 1), g)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = _np(m.apply(params, jnp.asarray(x)))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    p = params["params"]
    y = xt
    for i, (dim, s) in enumerate(zip((mid, mid, out_c), (2, 2, 1))):
        wgt = _np(p[f"conv{i}"]["kernel"])  # (3, 3, cin/g, cout)
        b = _np(p[f"conv{i}"]["bias"])
        y = F.conv2d(
            y,
            torch.from_numpy(wgt.transpose(3, 2, 0, 1)).contiguous(),
            torch.from_numpy(b),
            stride=s,
            padding=1,
            groups=g,
        )
        if i < 2:
            bn = p[f"bn{i}"]
            scale = _np(bn["weight"]) / np.sqrt(_np(bn["running_var"]) + 1e-5)
            shift = _np(bn["bias"]) - _np(bn["running_mean"]) * scale
            y = y * torch.from_numpy(scale)[None, :, None, None] + torch.from_numpy(shift)[
                None, :, None, None
            ]
            y = F.silu(y)
    expected = y.permute(0, 2, 3, 1).numpy()
    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


def test_token_attention_v_skip():
    """T2T attention: output must equal v + proj(softmax(qk)v) with bias-free qkv."""
    from gomatching_tpu.models.vitae import TokenAttention

    rng = np.random.RandomState(2)
    B, N, C, in_dim, h = 1, 10, 12, 8, 2
    x = rng.randn(B, N, C).astype(np.float32)
    m = TokenAttention(in_dim, h)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = _np(m.apply(params, jnp.asarray(x)))

    wqkv = _np(params["params"]["qkv"]["kernel"])  # (C, 3*in_dim)
    assert "bias" not in params["params"]["qkv"], "qkv must be bias-free (T2T)"
    qkv = x @ wqkv
    qkv = qkv.reshape(B, N, 3, h, in_dim // h)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = (in_dim // h) ** -0.5
    attn = np.einsum("bnhd,bmhd->bhnm", q * scale, k)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    o = np.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, in_dim)
    o = o @ _np(params["params"]["proj"]["kernel"]) + _np(params["params"]["proj"]["bias"])
    expected = v.reshape(B, N, in_dim) + o
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_vitae_trunk_shapes():
    from gomatching_tpu.models.vitae import ViTAEv2

    rng = np.random.RandomState(3)
    # non-divisible spatial size exercises window padding at every stage
    x = rng.randn(1, 68, 52, 3).astype(np.float32)
    m = ViTAEv2(nc_depths=(1, 1, 1, 1))  # shallow for test speed, same plumbing
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(params, jnp.asarray(x))
    assert set(out) == {"res3", "res4", "res5"}
    assert out["res3"].shape == (1, 9, 7, 128)
    assert out["res4"].shape == (1, 5, 4, 256)
    assert out["res5"].shape == (1, 3, 2, 512)
    for v in out.values():
        assert bool(jnp.all(jnp.isfinite(v)))
