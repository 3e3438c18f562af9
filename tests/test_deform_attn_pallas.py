"""Pallas deformable-attention kernel vs the XLA core op (interpret mode on CPU)."""

import numpy as np
import pytest

from gomatching_tpu.ops.deform_attn import ms_deform_attn_core
from gomatching_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas


def make_inputs(seed, B, M, D, P, shapes, Lq):
    rng = np.random.RandomState(seed)
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.randn(B, S, M, D).astype(np.float32)
    loc = rng.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    w = rng.rand(B, Lq, M, L * P).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    return value, list(shapes), loc, w.reshape(B, Lq, M, L, P)


def test_pallas_matches_core_encoder_shape():
    # encoder case: Lq == S
    shapes = ((8, 10), (4, 5), (2, 3))
    S = sum(h * w for h, w in shapes)
    value, shapes, loc, w = make_inputs(0, B=2, M=2, D=8, P=2, shapes=shapes, Lq=S)
    expected = np.asarray(ms_deform_attn_core(value, shapes, loc, w))
    got = np.asarray(ms_deform_attn_pallas(value, shapes, loc, w, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_pallas_matches_core_decoder_shape():
    # decoder case: Lq != S (padded internally)
    shapes = ((6, 8), (3, 4))
    value, shapes, loc, w = make_inputs(1, B=1, M=4, D=8, P=3, shapes=shapes, Lq=17)
    expected = np.asarray(ms_deform_attn_core(value, shapes, loc, w))
    got = np.asarray(ms_deform_attn_pallas(value, shapes, loc, w, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_pallas_bf16_value():
    shapes = ((6, 8), (3, 4))
    value, shapes, loc, w = make_inputs(2, B=1, M=2, D=8, P=2, shapes=shapes, Lq=30)
    import jax.numpy as jnp

    vb = jnp.asarray(value, jnp.bfloat16)
    expected = np.asarray(ms_deform_attn_core(value, shapes, loc, w)).astype(np.float32)
    got = np.asarray(ms_deform_attn_pallas(vb, shapes, loc, w, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-2)
