"""Deformable-attention core op vs. the grid_sample oracle.

The oracle reimplements the numerical contract of the reference's debug fallback
(third_party/adet/layers/ms_deform_attn.py:40-60) using torch.nn.functional.grid_sample
directly — the same function the reference fallback calls — so agreement here means
agreement with the reference CUDA kernel's spec.
"""

import numpy as np
import pytest

from gomatching_tpu.ops.deform_attn import ms_deform_attn_core, ms_deform_attn_reference


def torch_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    sampling_locations = torch.from_numpy(sampling_locations)
    attention_weights = torch.from_numpy(attention_weights)
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    out = torch.zeros(N * M, D, Lq, dtype=value.dtype)
    offset = 0
    grids = 2 * sampling_locations - 1
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, offset : offset + H * W]  # N, HW, M, D
        v = v.flatten(2).transpose(1, 2).reshape(N * M, D, H, W)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # N*M, Lq, P, 2
        sampled = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        w = attention_weights[:, :, :, lid].transpose(1, 2).reshape(N * M, 1, Lq, P)
        out = out + (sampled * w).sum(-1)
        offset += H * W
    return out.view(N, M * D, Lq).transpose(1, 2).contiguous().numpy()


def make_inputs(seed=0, B=2, M=4, D=8, P=3, shapes=((7, 9), (4, 5), (2, 3))):
    rng = np.random.RandomState(seed)
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    Lq = 31
    value = rng.randn(B, S, M, D).astype(np.float32)
    # cover in-range, boundary, and out-of-range sampling locations
    loc = rng.uniform(-0.3, 1.3, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    w = rng.rand(B, Lq, M, L * P).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    w = w.reshape(B, Lq, M, L, P)
    return value, list(shapes), loc, w


@pytest.mark.parametrize("seed", [0, 1])
def test_core_matches_torch_grid_sample(seed):
    value, shapes, loc, w = make_inputs(seed)
    expected = torch_oracle(value, shapes, loc, w)
    got = np.asarray(ms_deform_attn_core(value, shapes, loc, w, query_chunk=16))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_reference_matches_torch_grid_sample():
    value, shapes, loc, w = make_inputs(3)
    expected = torch_oracle(value, shapes, loc, w)
    got = np.asarray(ms_deform_attn_reference(value, shapes, loc, w))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_core_chunking_invariance():
    value, shapes, loc, w = make_inputs(5)
    a = np.asarray(ms_deform_attn_core(value, shapes, loc, w, query_chunk=7))
    b = np.asarray(ms_deform_attn_core(value, shapes, loc, w, query_chunk=1024))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
