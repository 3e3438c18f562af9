"""Gradient parity of the fused VMEM samplers' custom VJPs.

The reference CUDA extension ships col2im backward kernels
(third_party/adet/layers/csrc/ms_deform_attn/ms_deform_im2col_cuda.cuh:302,
:407,:514); our production Pallas kernels carry custom VJPs (fused backward
kernels). The oracle is the differentiable gather core
(ops/deform_attn.py ms_deform_attn_core) — pure XLA, exact everywhere —
whose own grads are chained through jax.grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _rand_inputs(rng, B, shapes, M, D, Lq, P, loc_lo=0.0, loc_hi=1.0):
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    loc = jnp.asarray(
        rng.uniform(loc_lo, loc_hi, (B, Lq, M, L, P, 2)), jnp.float32
    )
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(B, Lq, M, L, P), jnp.float32).reshape(B, Lq, M, L * P),
        axis=-1,
    ).reshape(B, Lq, M, L, P)
    cot = jnp.asarray(rng.randn(B, Lq, M * D), jnp.float32)
    return value, loc, attn, cot


@pytest.mark.parametrize("loc_range", [(0.05, 0.95), (-0.15, 1.15)])
def test_decoder_vmem_grads_match_gather_core(loc_range):
    """d(value)/d(loc)/d(attn) of the decoder one-hot kernel vs the gather
    core, including out-of-range sampling (zero-padding gradients)."""
    from gomatching_tpu.ops.deform_attn import ms_deform_attn_core
    from gomatching_tpu.ops.deform_attn_dec_vmem import ms_deform_attn_queries_vmem

    rng = np.random.RandomState(0)
    shapes = [(6, 8), (3, 4)]
    B, M, D, Lq, P = 2, 2, 8, 10, 3
    value, loc, attn, cot = _rand_inputs(rng, B, shapes, M, D, Lq, P, *loc_range)

    def loss_vmem(v, l, a):
        out = ms_deform_attn_queries_vmem(v, shapes, l, a, query_block=8,
                                          interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(v, l, a):
        return jnp.sum(ms_deform_attn_core(v, shapes, l, a) * cot)

    # forward parity first (the VJP wrapper must not change the primal)
    np.testing.assert_allclose(
        float(loss_vmem(value, loc, attn)), float(loss_ref(value, loc, attn)),
        rtol=1e-5,
    )
    g_vmem = jax.grad(loss_vmem, argnums=(0, 1, 2))(value, loc, attn)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(value, loc, attn)
    for got, want, name in zip(g_vmem, g_ref, ("value", "loc", "attn")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5,
            err_msg=f"d{name}",
        )


def test_decoder_vmem_grads_multi_query_block():
    """Query-block accumulation in the backward kernel: Lq spanning several
    blocks (and a padded tail) must accumulate dV exactly once per query."""
    from gomatching_tpu.ops.deform_attn import ms_deform_attn_core
    from gomatching_tpu.ops.deform_attn_dec_vmem import ms_deform_attn_queries_vmem

    rng = np.random.RandomState(1)
    shapes = [(5, 7)]
    B, M, D, Lq, P = 1, 1, 8, 21, 2  # 21 queries over Qb=8 -> 3 blocks, pad 3
    value, loc, attn, cot = _rand_inputs(rng, B, shapes, M, D, Lq, P)

    def loss_vmem(v, l, a):
        out = ms_deform_attn_queries_vmem(v, shapes, l, a, query_block=8,
                                          interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(v, l, a):
        return jnp.sum(ms_deform_attn_core(v, shapes, l, a) * cot)

    g_vmem = jax.grad(loss_vmem, argnums=(0, 1, 2))(value, loc, attn)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(value, loc, attn)
    for got, want, name in zip(g_vmem, g_ref, ("value", "loc", "attn")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5,
            err_msg=f"d{name}",
        )


def test_encoder_v2_grads_match_tiled():
    """d(value)/d(offsets)/d(attn) of the projection-layout encoder kernel
    (custom VJP: fused per-tile backward + slab overlap-add) vs the
    differentiable XLA tiled path — same contract (exact within halo), same
    parametrization (raw target-level cell offsets, the projection output)."""
    from gomatching_tpu.ops.deform_attn_tiled import ms_deform_attn_encoder_tiled
    from gomatching_tpu.ops.deform_attn_vmem import (
        ms_deform_attn_encoder_vmem_v2,
        tile_major_inverse,
        tile_major_perm,
    )

    SHAPES = [(16, 24), (8, 12), (4, 6), (2, 3)]
    TILES = (8, 8, 4, 2)
    S = sum(h * w for h, w in SHAPES)
    B, M, D, L, P = 2, 4, 8, 4, 4

    rng = np.random.RandomState(3)
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    refs = []
    for h, w in SHAPES:
        gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
        refs.append(np.stack([(gx.ravel() + 0.5) / w, (gy.ravel() + 0.5) / h], -1))
    ref = jnp.asarray(np.concatenate(refs, 0)[None, :, None, None, None, :])
    wh = jnp.asarray(np.array([[w, h] for h, w in SHAPES], np.float32))
    off_cells = jnp.asarray(
        rng.uniform(-1.5, 1.5, (B, S, M, L, P, 2)), jnp.float32
    )
    attn = rng.rand(B, S, M, L, P).astype(np.float32)
    attn = jnp.asarray(attn / attn.sum((-1, -2), keepdims=True))
    cot = jnp.asarray(rng.randn(B, S, M * D), jnp.float32)

    perm, _ = tile_major_perm(SHAPES, TILES)
    inv = tile_major_inverse(SHAPES, TILES)
    permj = jnp.asarray(perm)
    invj = jnp.asarray(inv)

    def loss_tiled(v, oc, a):
        loc = ref + oc / wh[None, None, None, :, None, :]
        out = ms_deform_attn_encoder_tiled(v, SHAPES, loc, a, halo=2,
                                           tile_sizes=TILES)
        return jnp.sum(out * cot)

    def loss_v2(v, oc, a):
        offT = jnp.take(oc, permj, axis=1).transpose(0, 3, 5, 2, 4, 1).reshape(
            B, L * 2 * M * P, -1
        )
        attnT = jnp.take(a, permj, axis=1).transpose(0, 3, 2, 4, 1).reshape(
            B, L * M * P, -1
        )
        out_tm = ms_deform_attn_encoder_vmem_v2(
            v, SHAPES, offT, attnT, halo=2, tile_sizes=TILES, interpret=True
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
