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
