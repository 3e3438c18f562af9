"""Tiled one-hot deformable attention vs the gather core / reference oracle.

The tiled path must be bit-level-equivalent (fp32 tolerance) to
``ms_deform_attn_reference`` whenever every sampling offset stays within
``halo`` target cells of its query's grid position — including samples that
fall off the level edge (zero-padding semantics). With out-of-halo offsets the
dropped-mass diagnostic must account exactly for the difference in attention
mass.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gomatching_tpu.ops.deform_attn import ms_deform_attn_reference
from gomatching_tpu.ops.deform_attn_tiled import (
    deform_attn_dropped_mass,
    ms_deform_attn_encoder_tiled,
)

SHAPES = [(20, 28), (10, 14), (5, 7), (3, 4)]


def encoder_inputs(shapes, B=1, M=2, P=3, offset_cells=2.0, seed=0):
    """Grid-centered sampling locations (+ bounded offsets) like the encoder."""
    rng = np.random.RandomState(seed)
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    D = 4
    value = rng.randn(B, S, M, D).astype(np.float32)

    refs = []
    for h, w in shapes:
        gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
        refs.append(
            np.stack([(gx.ravel() + 0.5) / w, (gy.ravel() + 0.5) / h], -1)
        )
    ref = np.concatenate(refs, 0)  # (S, 2) normalized
    ref = np.broadcast_to(ref[None, :, None, None, None, :], (B, S, M, L, P, 2))

    offs = rng.uniform(-offset_cells, offset_cells, (B, S, M, L, P, 2)).astype(
        np.float32
    )
    wh = np.array([[w, h] for h, w in shapes], np.float32)  # (L, 2)
    loc = ref + offs / wh[None, None, None, :, None, :]

    attn = rng.rand(B, S, M, L, P).astype(np.float32)
    attn = attn / attn.sum((-1, -2), keepdims=True)
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)


def test_tiled_matches_reference_within_halo():
    value, loc, attn = encoder_inputs(SHAPES, offset_cells=2.0)
    want = ms_deform_attn_reference(value, SHAPES, loc, attn)
    got = ms_deform_attn_encoder_tiled(
        value, SHAPES, loc, attn, halo=4, tile_sizes=(8, 8, 4, 2)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    drop = deform_attn_dropped_mass(
        SHAPES, loc, attn, halo=4, tile_sizes=(8, 8, 4, 2)
    )
    assert float(drop) == 0.0


def test_tiled_zero_padding_semantics():
    """Offsets pushing samples off the level edge: zero contribution, exactly
    like grid_sample zero padding — but still within halo so nothing is
    'dropped' by the tiling."""
    value, loc, attn = encoder_inputs(SHAPES, offset_cells=3.5, seed=1)
    want = ms_deform_attn_reference(value, SHAPES, loc, attn)
    got = ms_deform_attn_encoder_tiled(
        value, SHAPES, loc, attn, halo=4, tile_sizes=(8, 8, 4, 2)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_tiled_exact_with_full_coverage_halo():
    """halo >= the largest level extent makes footprints cover whole levels:
    exact for ARBITRARY offsets."""
    value, loc, attn = encoder_inputs(SHAPES, offset_cells=15.0, seed=2)
    want = ms_deform_attn_reference(value, SHAPES, loc, attn)
    got = ms_deform_attn_encoder_tiled(
        value, SHAPES, loc, attn, halo=32, tile_sizes=(8, 8, 4, 2)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    drop = deform_attn_dropped_mass(
        SHAPES, loc, attn, halo=32, tile_sizes=(8, 8, 4, 2)
    )
    assert float(drop) == 0.0


def test_dropped_mass_accounts_for_difference():
    """With a small halo and large offsets, (reference - tiled) output energy
    corresponds to dropped attention mass > 0, and the diagnostic flags it."""
    value, loc, attn = encoder_inputs(SHAPES, offset_cells=8.0, seed=3)
    want = np.asarray(ms_deform_attn_reference(value, SHAPES, loc, attn))
    got = np.asarray(
        ms_deform_attn_encoder_tiled(
            value, SHAPES, loc, attn, halo=2, tile_sizes=(8, 8, 4, 2)
        )
    )
    drop = float(
        deform_attn_dropped_mass(SHAPES, loc, attn, halo=2, tile_sizes=(8, 8, 4, 2))
    )
    assert drop > 0.0
    assert not np.allclose(got, want, atol=1e-6)
    # tiled output == reference with the out-of-footprint taps zeroed; so the
    # difference must shrink as halo grows
    got8 = np.asarray(
        ms_deform_attn_encoder_tiled(
            value, SHAPES, loc, attn, halo=8, tile_sizes=(8, 8, 4, 2)
        )
    )
    drop8 = float(
        deform_attn_dropped_mass(SHAPES, loc, attn, halo=8, tile_sizes=(8, 8, 4, 2))
    )
    assert drop8 < drop
    assert np.abs(got8 - want).max() < np.abs(got - want).max()


def test_tiled_batch_and_chunking():
    """B > 1 and a tiny tile_chunk_rows (forces the lax.map chunked path)."""
    value, loc, attn = encoder_inputs(SHAPES, B=2, offset_cells=2.0, seed=4)
    want = ms_deform_attn_reference(value, SHAPES, loc, attn)
    got = ms_deform_attn_encoder_tiled(
        value, SHAPES, loc, attn, halo=4, tile_sizes=(8, 8, 4, 2),
        tile_chunk_rows=256,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_tiled_under_jit_and_default_tiles():
    value, loc, attn = encoder_inputs(SHAPES, offset_cells=1.0, seed=5)
    fn = jax.jit(
        lambda v, l, a: ms_deform_attn_encoder_tiled(v, SHAPES, l, a, halo=4)
    )
    got = fn(value, loc, attn)
    want = ms_deform_attn_reference(value, SHAPES, loc, attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_spotter_tiled_matches_xla_end_to_end():
    """MSDeformAttn selects the tiled path for encoder self-attn (Lq == S,
    no padding masks) and the full spotter output matches the gather core."""
    from gomatching_tpu.models.pos_encoding import position_encoding_2d
    from gomatching_tpu.models.spotter import DeepSoloSpotter

    kw = dict(
        d_model=64, n_heads=4, num_encoder_layers=2, num_decoder_layers=2,
        dim_feedforward=64, num_queries=8, num_points=5, voc_size=10,
        in_channels=(32, 48, 64),
    )
    feats = [
        jnp.asarray(
            np.random.RandomState(i).randn(1, 24 // 2**i, 32 // 2**i, c).astype(np.float32)
        )
        for i, c in enumerate(kw["in_channels"])
    ]
    pos = [
        position_encoding_2d((1, f.shape[1], f.shape[2]), 32, 10000.0, None)
        for f in feats
    ]
    m_x = DeepSoloSpotter(sampling_impl="xla", **kw)
    m_t = DeepSoloSpotter(sampling_impl="tiled", tiled_halo=8, **kw)
    params = m_x.init(jax.random.PRNGKey(0), feats, pos, None)
    ox = m_x.apply(params, feats, pos, None)
    ot = m_t.apply(params, feats, pos, None)
    for k in ("pred_logits", "pred_text_logits", "pred_ctrl_points",
              "pred_bd_points", "query_features"):
        np.testing.assert_allclose(
            np.asarray(ox[k]), np.asarray(ot[k]), atol=5e-5, err_msg=k
        )
