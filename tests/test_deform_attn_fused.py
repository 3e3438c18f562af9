"""Fused Pallas tiled deformable attention vs the reference oracle.

Runs in Pallas interpret mode on the CPU mesh; the kernel itself lowers and
executes on real TPU (verified on v5e — see the module docstring for measured
numbers and why it is NOT the production default).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gomatching_tpu.ops.deform_attn import ms_deform_attn_reference
from gomatching_tpu.ops.deform_attn_fused import ms_deform_attn_encoder_fused
from gomatching_tpu.ops.deform_attn_tiled import ms_deform_attn_encoder_tiled

from test_deform_attn_tiled import SHAPES, encoder_inputs


def test_fused_matches_reference_within_halo():
    value, loc, attn = encoder_inputs(SHAPES, offset_cells=2.0)
    want = ms_deform_attn_reference(value, SHAPES, loc, attn)
    got = ms_deform_attn_encoder_fused(
        value, SHAPES, loc, attn, halo=4, tile_sizes=(8, 8, 4, 2), interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_zero_padding_and_batch():
    value, loc, attn = encoder_inputs(SHAPES, B=2, offset_cells=3.5, seed=1)
    want = ms_deform_attn_reference(value, SHAPES, loc, attn)
    got = ms_deform_attn_encoder_fused(
        value, SHAPES, loc, attn, halo=4, tile_sizes=(8, 8, 4, 2), interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_matches_tiled_beyond_halo():
    """Out-of-halo drops must agree EXACTLY with the XLA tiled path (same
    footprint geometry -> same dropped corners)."""
    value, loc, attn = encoder_inputs(SHAPES, offset_cells=8.0, seed=3)
    tiled = ms_deform_attn_encoder_tiled(
        value, SHAPES, loc, attn, halo=2, tile_sizes=(8, 8, 4, 2)
    )
    fused = ms_deform_attn_encoder_fused(
        value, SHAPES, loc, attn, halo=2, tile_sizes=(8, 8, 4, 2), interpret=True
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(tiled), atol=2e-5)
