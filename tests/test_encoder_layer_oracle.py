"""Full encoder-layer parity vs a torch oracle built from the reference math.

Covers the complete MSDeformAttn stack end-to-end — value/offset/attention
projections, reference-point -> sampling-location math, grid_sample-semantics
sampling, output projection — plus the post-norm FFN block, with weights copied
from the flax module. This is the strongest offline parity evidence available
without reference checkpoints (spec: third_party/adet/layers/
ms_deform_attn.py:69-156 + deformable_transformer.py:218-278).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

SHAPES = [(6, 9), (3, 5), (2, 3)]
L = len(SHAPES)
C, M, P = 32, 4, 4
S = sum(h * w for h, w in SHAPES)


def _np(x):
    return np.asarray(x)


def torch_ms_deform_attn(params, query, ref, src):
    """(B, Lq, C) torch forward of MSDeformAttn with flax params."""
    p = params

    def linear(x, node):
        w = torch.from_numpy(_np(p[node]["kernel"]))
        b = torch.from_numpy(_np(p[node]["bias"]))
        return x @ w + b

    B, Lq, _ = query.shape
    D = C // M
    value = linear(src, "value_proj").view(B, S, M, D)
    offsets = linear(query, "sampling_offsets").view(B, Lq, M, L, P, 2)
    attn = linear(query, "attention_weights").view(B, Lq, M, L * P)
    attn = F.softmax(attn, dim=-1).view(B, Lq, M, L, P)

    wh = torch.tensor([[w, h] for h, w in SHAPES], dtype=torch.float32)
    loc = ref[:, :, None, :, None, :] + offsets / wh[None, None, None, :, None, :]

    # grid_sample-semantics sampling (ms_deform_attn.py:40-60)
    out = torch.zeros(B, Lq, M, D)
    start = 0
    for lvl, (h, w) in enumerate(SHAPES):
        v = value[:, start : start + h * w].permute(0, 2, 3, 1).reshape(B * M, D, h, w)
        g = loc[:, :, :, lvl] * 2 - 1  # (B, Lq, M, P, 2)
        g = g.permute(0, 2, 1, 3, 4).reshape(B * M, Lq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        s = s.view(B, M, D, Lq, P)
        a = attn[:, :, :, lvl].permute(0, 2, 1, 3)  # (B, M, Lq, P)
        out += (s * a[:, :, None]).sum(-1).permute(0, 3, 1, 2)
        start += h * w
    return linear(out.reshape(B, Lq, M * D), "output_proj")


def test_encoder_layer_matches_torch_oracle():
    from gomatching_tpu.models.spotter import EncoderLayer

    rng = np.random.RandomState(0)
    B, Lq = 2, S
    src = rng.randn(B, S, C).astype(np.float32)
    pos = rng.randn(B, S, C).astype(np.float32)

    # encoder reference points, no padding: (x+0.5)/W, (y+0.5)/H per level,
    # broadcast over the L sampling levels (deformable_transformer.py:141-171)
    refs = []
    for h, w in SHAPES:
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        refs.append(np.stack([(xs.ravel() + 0.5) / w, (ys.ravel() + 0.5) / h], -1))
    ref = np.tile(np.concatenate(refs)[None, :, None, :], (B, 1, L, 1)).astype(np.float32)

    layer = EncoderLayer(C, 64, L, M, P)
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(pos), jnp.asarray(ref),
        SHAPES, None,
    )["params"]
    got = _np(
        layer.apply(
            {"params": params}, jnp.asarray(src), jnp.asarray(pos), jnp.asarray(ref),
            SHAPES, None,
        )
    )

    # torch oracle with the same weights
    q = torch.from_numpy(src + pos)
    attn_out = torch_ms_deform_attn(
        params["self_attn"], q, torch.from_numpy(ref), torch.from_numpy(src)
    )

    def ln(x, node):
        w = torch.from_numpy(_np(node["scale"]))
        b = torch.from_numpy(_np(node["bias"]))
        return F.layer_norm(x, (C,), w, b, eps=1e-5)

    x = ln(torch.from_numpy(src) + attn_out, params["norm1"])
    ffn = params["ffn"]
    h = x @ torch.from_numpy(_np(ffn["linear1"]["kernel"])) + torch.from_numpy(
        _np(ffn["linear1"]["bias"])
    )
    h = F.relu(h)
    h = h @ torch.from_numpy(_np(ffn["linear2"]["kernel"])) + torch.from_numpy(
        _np(ffn["linear2"]["bias"])
    )
    expected = ln(x + h, ffn["norm"]).numpy()

    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)
