"""Composite decoder-layer parity vs a torch oracle.

The decoder layer runs attention over TWO different axes (intra: the npts
point axis; inter: the nq query axis) plus deformable cross-attention — the
axis plumbing is the classic silent-bug spot, so this test mirrors the
reference forward exactly (deformable_transformer.py:326-427) with torch
nn.MultiheadAttention and the grid_sample oracle, weights copied from flax.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from test_encoder_layer_oracle import SHAPES, L, C, M, P, S, torch_ms_deform_attn  # noqa: E402


def _np(x):
    return np.asarray(x)


def _torch_mha(p, embed_dim, heads):
    m = torch.nn.MultiheadAttention(embed_dim, heads, dropout=0.0)
    with torch.no_grad():
        qw = _np(p["q_proj"]["kernel"]).T
        kw = _np(p["k_proj"]["kernel"]).T
        vw = _np(p["v_proj"]["kernel"]).T
        m.in_proj_weight.copy_(torch.from_numpy(np.concatenate([qw, kw, vw], 0).copy()))
        m.in_proj_bias.copy_(
            torch.from_numpy(
                np.concatenate(
                    [_np(p["q_proj"]["bias"]), _np(p["k_proj"]["bias"]), _np(p["v_proj"]["bias"])]
                ).copy()
            )
        )
        m.out_proj.weight.copy_(torch.from_numpy(_np(p["out_proj"]["kernel"]).T.copy()))
        m.out_proj.bias.copy_(torch.from_numpy(_np(p["out_proj"]["bias"]).copy()))
    m.eval()
    return m


def _ln(x, node, dim):
    return F.layer_norm(
        x, (dim,), torch.from_numpy(_np(node["scale"])), torch.from_numpy(_np(node["bias"])), 1e-5
    )


def test_decoder_layer_matches_torch_oracle():
    from gomatching_tpu.models.spotter import DecoderLayer

    rng = np.random.RandomState(1)
    B, nq, npts = 2, 5, 3
    tgt = rng.randn(B, nq, npts, C).astype(np.float32)
    qpos = rng.randn(B, nq, npts, C).astype(np.float32)
    memory = rng.randn(B, S, C).astype(np.float32)
    # per-point reference locations, already broadcast over levels
    ref = rng.rand(B, nq, npts, L, 2).astype(np.float32)

    layer = DecoderLayer(C, 64, L, M, P)
    params = layer.init(
        jax.random.PRNGKey(0),
        jnp.asarray(tgt), jnp.asarray(qpos), jnp.asarray(ref),
        jnp.asarray(memory), SHAPES, None,
    )["params"]
    got = _np(
        layer.apply(
            {"params": params},
            jnp.asarray(tgt), jnp.asarray(qpos), jnp.asarray(ref),
            jnp.asarray(memory), SHAPES, None,
        )
    )

    # ---- torch oracle, following deformable_transformer.py:386-427 ----
    t = torch.from_numpy(tgt)
    qp = torch.from_numpy(qpos)

    intra = _torch_mha(params["attn_intra"], C, M)
    q = (t + qp).flatten(0, 1).transpose(0, 1)  # (npts, B*nq, C)
    t2 = intra(q, q, t.flatten(0, 1).transpose(0, 1))[0].transpose(0, 1).reshape(t.shape)
    t = _ln(t + t2, params["norm_intra"], C)

    inter = _torch_mha(params["attn_inter"], C, M)
    ti = torch.swapdims(t, 1, 2)  # (B, npts, nq, C)
    qi = ti.flatten(0, 1).transpose(0, 1)  # (nq, B*npts, C)
    t2 = inter(qi, qi, qi)[0].transpose(0, 1).reshape(ti.shape)
    ti = torch.swapdims(_ln(ti + t2, params["norm_inter"], C), 1, 2)

    flat_q = (ti + qp).reshape(B, nq * npts, C)
    flat_ref = torch.from_numpy(ref).reshape(B, nq * npts, L, 2)
    cross = torch_ms_deform_attn(
        params["attn_cross"], flat_q, flat_ref, torch.from_numpy(memory)
    ).reshape(ti.shape)
    t = _ln(ti + cross, params["norm_cross"], C)

    ffn = params["ffn"]
    h = t @ torch.from_numpy(_np(ffn["linear1"]["kernel"])) + torch.from_numpy(
        _np(ffn["linear1"]["bias"])
    )
    h = F.relu(h)
    h = h @ torch.from_numpy(_np(ffn["linear2"]["kernel"])) + torch.from_numpy(
        _np(ffn["linear2"]["bias"])
    )
    expected = _ln(t + h, ffn["norm"], C).detach().numpy()

    np.testing.assert_allclose(got, expected, rtol=3e-4, atol=3e-4)
