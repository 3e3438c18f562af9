"""Fused VMEM deformable-attention kernels vs the exact references.

Interpret mode on CPU; the kernels lower and run on v5e (bench numbers in
docs/PERF_NOTES.md round 3). Covers the encoder tiled-footprint kernel (both
entries), the decoder full-level one-hot kernel (exact, incl. out-of-range
sampling), and the full-spotter routing with SAMPLING_IMPL=vmem.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

SHAPES = [(16, 24), (8, 12), (4, 6), (2, 3)]
S = sum(h * w for h, w in SHAPES)
B, M, D, L, P = 2, 4, 8, 4, 4
TILES = (8, 8, 4, 2)


def _enc_inputs(seed=0, offset_cells=1.5):
    rng = np.random.RandomState(seed)
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    refs = []
    for h, w in SHAPES:
        gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
        refs.append(np.stack([(gx.ravel() + 0.5) / w, (gy.ravel() + 0.5) / h], -1))
    ref = np.concatenate(refs, 0)
    ref = np.broadcast_to(ref[None, :, None, None, None, :], (B, S, M, L, P, 2))
    offs = rng.uniform(-offset_cells, offset_cells, (B, S, M, L, P, 2)).astype(np.float32)
    wh = np.array([[w, h] for h, w in SHAPES], np.float32)
    loc = jnp.asarray(ref + offs / wh[None, None, None, :, None, :])
    attn = rng.rand(B, S, M, L, P).astype(np.float32)
    attn = jnp.asarray(attn / attn.sum((-1, -2), keepdims=True))
    return value, loc, attn


@pytest.mark.parametrize("hps", [0, 2])
def test_encoder_vmem_matches_tiled(hps):
    from gomatching_tpu.ops.deform_attn_tiled import ms_deform_attn_encoder_tiled
    from gomatching_tpu.ops.deform_attn_vmem import ms_deform_attn_encoder_vmem

    value, loc, attn = _enc_inputs()
    want = ms_deform_attn_encoder_tiled(value, SHAPES, loc, attn, halo=2, tile_sizes=TILES)
    got = ms_deform_attn_encoder_vmem(
        value, SHAPES, loc, attn, halo=2, tile_sizes=TILES,
        heads_per_step=hps, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_encoder_vmem_tile_major_entry():
    """The tile-major entry (layout the transposed projections emit) must
    reproduce the standard entry exactly, including edge-tile padding slots."""
    from gomatching_tpu.ops.deform_attn_tiled import ms_deform_attn_encoder_tiled
    from gomatching_tpu.ops.deform_attn_vmem import (
        ms_deform_attn_encoder_vmem_tm,
        tile_major_perm,
    )

    value, loc, attn = _enc_inputs(seed=1)
    perm, _ = tile_major_perm(SHAPES, TILES)
    locT = jnp.transpose(
        jnp.take(loc, jnp.asarray(perm), axis=1), (0, 2, 3, 4, 5, 1)
    )  # (B, M, L, P, 2, S_tm)
    attnT = jnp.transpose(jnp.take(attn, jnp.asarray(perm), axis=1), (0, 2, 3, 4, 1))
    want = ms_deform_attn_encoder_tiled(value, SHAPES, loc, attn, halo=2, tile_sizes=TILES)
    got = ms_deform_attn_encoder_vmem_tm(
        value, SHAPES, locT, attnT, halo=2, tile_sizes=TILES, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_encoder_vmem_v2_projection_layout():
    """Kernel v2 (projection-layout inputs, natural-layout grids, token-major
    output) must reproduce the tiled reference on real tokens."""
    from gomatching_tpu.ops.deform_attn_tiled import ms_deform_attn_encoder_tiled
    from gomatching_tpu.ops.deform_attn_vmem import (
        ms_deform_attn_encoder_vmem_v2,
        tile_major_inverse,
        tile_major_perm,
    )

    value, loc, attn = _enc_inputs(seed=2)
    # raw per-target-level cell offsets from the normalized locations
    refs = []
    for h, w in SHAPES:
        gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
        refs.append(np.stack([(gx.ravel() + 0.5) / w, (gy.ravel() + 0.5) / h], -1))
    ref = np.concatenate(refs, 0)[None, :, None, None, None, :]
    wh = np.array([[w, h] for h, w in SHAPES], np.float32)
    off_cells = (np.asarray(loc) - ref) * wh[None, None, None, :, None, :]

    perm, _ = tile_major_perm(SHAPES, TILES)
    # (B, S_tm, M, L, P, 2) -> rows (l, xy, m, p) with tokens minor
    offT = jnp.asarray(
        np.transpose(off_cells[:, perm], (0, 3, 5, 2, 4, 1)).reshape(
            B, L * 2 * M * P, -1
        )
    )
    attnT = jnp.asarray(
        np.transpose(np.asarray(attn)[:, perm], (0, 3, 2, 4, 1)).reshape(
            B, L * M * P, -1
        )
    )
    want = ms_deform_attn_encoder_tiled(value, SHAPES, loc, attn, halo=2, tile_sizes=TILES)
    inv = tile_major_inverse(SHAPES, TILES)
    for block in (8, 4):  # TPU.ENC_BLOCK: footprint x-alignment sweep values
        got_tm = ms_deform_attn_encoder_vmem_v2(
            value, SHAPES, offT, attnT, halo=2, block=block, tile_sizes=TILES,
            interpret=True,
        )
        got = jnp.take(got_tm, jnp.asarray(inv), axis=1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5,
            err_msg=f"block={block}",
        )


def test_encoder_vmem_v2_fw_rounding_geometry():
    """Footprint geometry where the raw x-extent violates Mosaic's
    second-minor window alignment (Fw % 8 != 0 and Fw < Wp): at
    shapes [(24,40),(12,20)], tiles (8,8), halo=3, block=4 the level-0 ->
    level-1 footprint is Fw=12 on Wp=20 and must be widened to 16 without
    changing the sampled result (forward and the custom-VJP backward)."""
    from gomatching_tpu.ops.deform_attn_tiled import ms_deform_attn_encoder_tiled
    from gomatching_tpu.ops.deform_attn_vmem import (
        _footprint_bounds,
        ms_deform_attn_encoder_vmem_v2,
        tile_major_inverse,
        tile_major_perm,
    )

    shapes = [(24, 40), (12, 20)]
    tiles = (8, 8)
    halo, block = 3, 4
    # precondition: this config actually exercises the rounding path
    _, fw_raw = _footprint_bounds(40, 8, 5, 20, 20, halo, block)
    assert fw_raw % 8 != 0 and fw_raw != 20, fw_raw

    S = sum(h * w for h, w in shapes)
    Bs, M, D, L, P = 1, 4, 8, 2, 4
    rng = np.random.RandomState(7)
    value = jnp.asarray(rng.randn(Bs, S, M, D), np.float32)
    refs = []
    for h, w in shapes:
        gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
        refs.append(np.stack([(gx.ravel() + 0.5) / w, (gy.ravel() + 0.5) / h], -1))
    ref = jnp.asarray(np.concatenate(refs, 0)[None, :, None, None, None, :])
    wh = jnp.asarray(np.array([[w, h] for h, w in shapes], np.float32))
    off_cells = jnp.asarray(
        rng.uniform(-2.0, 2.0, (Bs, S, M, L, P, 2)), np.float32
    )
    attn = rng.rand(Bs, S, M, L, P).astype(np.float32)
    attn = jnp.asarray(attn / attn.sum((-1, -2), keepdims=True))
    cot = jnp.asarray(rng.randn(Bs, S, M * D), np.float32)

    perm, _ = tile_major_perm(shapes, tiles)
    permj = jnp.asarray(perm)
    invj = jnp.asarray(tile_major_inverse(shapes, tiles))

    def loss_tiled(v, oc, a):
        loc = ref + oc / wh[None, None, None, :, None, :]
        out = ms_deform_attn_encoder_tiled(v, shapes, loc, a, halo=halo,
                                           tile_sizes=tiles)
        return jnp.sum(out * cot)

    def loss_v2(v, oc, a):
        offT = jnp.take(oc, permj, axis=1).transpose(0, 3, 5, 2, 4, 1).reshape(
            Bs, L * 2 * M * P, -1
        )
        attnT = jnp.take(a, permj, axis=1).transpose(0, 3, 2, 4, 1).reshape(
            Bs, L * M * P, -1
        )
        out_tm = ms_deform_attn_encoder_vmem_v2(
            v, shapes, offT, attnT, halo=halo, block=block, tile_sizes=tiles,
            interpret=True,
        )
        return jnp.sum(jnp.take(out_tm, invj, axis=1) * cot)

    np.testing.assert_allclose(
        float(loss_v2(value, off_cells, attn)),
        float(loss_tiled(value, off_cells, attn)),
        rtol=1e-4,
    )
    g_v2 = jax.grad(loss_v2, argnums=(0, 1, 2))(value, off_cells, attn)
    g_ref = jax.grad(loss_tiled, argnums=(0, 1, 2))(value, off_cells, attn)
    for got, want, name in zip(g_v2, g_ref, ("value", "offsets", "attn")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=f"d{name}",
        )


@pytest.mark.parametrize("gather_levels", [0, 1, 2, 4])
def test_decoder_queries_vmem_exact(gather_levels):
    """Full-level one-hot kernel for arbitrary queries == gather core,
    including out-of-range sampling locations (zero-padding semantics) and
    the level-hybrid splits (finest ``gather_levels`` levels via gather)."""
    from gomatching_tpu.ops.deform_attn import ms_deform_attn_core
    from gomatching_tpu.ops.deform_attn_dec_vmem import ms_deform_attn_queries_vmem

    rng = np.random.RandomState(0)
    Lq = 37  # not a query-block multiple
    value = jnp.asarray(rng.randn(B, S, M, D), np.float32)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (B, Lq, M, L, P, 2)).astype(np.float32))
    attn = rng.rand(B, Lq, M, L, P).astype(np.float32)
    attn = jnp.asarray(attn / attn.sum((-1, -2), keepdims=True))
    want = ms_deform_attn_core(value, SHAPES, loc, attn, query_chunk=0)
    got = ms_deform_attn_queries_vmem(
        value, SHAPES, loc, attn, query_block=16,
        gather_levels=gather_levels, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_decoder_hybrid_grads_match_fused():
    """The level-hybrid decoder path must carry the same gradients as the
    all-fused path (gather half: XLA AD; fused half: the custom VJP)."""
    from gomatching_tpu.ops.deform_attn_dec_vmem import ms_deform_attn_queries_vmem

    rng = np.random.RandomState(3)
    Lq = 21
    value = jnp.asarray(rng.randn(B, S, M, D), np.float32)
    loc = jnp.asarray(rng.uniform(0.05, 0.95, (B, Lq, M, L, P, 2)).astype(np.float32))
    attn = rng.rand(B, Lq, M, L, P).astype(np.float32)
    attn = jnp.asarray(attn / attn.sum((-1, -2), keepdims=True))
    cot = jnp.asarray(rng.randn(B, Lq, M * D), np.float32)

    def loss(gl):
        def f(v, lc, at):
            out = ms_deform_attn_queries_vmem(
                v, SHAPES, lc, at, query_block=16, gather_levels=gl,
                interpret=True,
            )
            return jnp.sum(out * cot)

        return jax.grad(f, argnums=(0, 1, 2))(value, loc, attn)

    g0 = loss(0)
    g1 = loss(1)
    for a, b, name in zip(g0, g1, ("dvalue", "dloc", "dattn")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, err_msg=name
        )


def test_spotter_vmem_impl_matches_xla():
    """SAMPLING_IMPL=vmem end to end (tile-major encoder fast path + decoder
    one-hot kernel): identical outputs and an identical parameter tree."""
    from gomatching_tpu.models.pos_encoding import position_encoding_2d
    from gomatching_tpu.models.spotter import DeepSoloSpotter

    def build(impl):
        return DeepSoloSpotter(
            d_model=64, n_heads=4, num_encoder_layers=2, num_decoder_layers=2,
            dim_feedforward=64, num_queries=8, num_points=5, voc_size=10,
            sampling_impl=impl, tiled_halo=4,
        )

    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(1, 24, 32, 512), np.float32),
        jnp.asarray(rng.randn(1, 12, 16, 1024), np.float32),
        jnp.asarray(rng.randn(1, 6, 8, 2048), np.float32),
    ]
    pos = [
        position_encoding_2d((f.shape[0], f.shape[1], f.shape[2]), 32, 10000.0, None)
        for f in feats
    ]
    m_x, m_v = build("xla"), build("vmem")
    params = m_x.init(jax.random.PRNGKey(0), feats, pos, None)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        m_v.init(jax.random.PRNGKey(0), feats, pos, None)
    )
    out_x = m_x.apply(params, feats, pos, None)
    out_v = m_v.apply(params, feats, pos, None)
    for k, v in out_x.items():
        if v is None:
            continue
        np.testing.assert_allclose(
            np.asarray(out_v[k]), np.asarray(v), atol=5e-4, err_msg=k
        )
