"""Fused VMEM one-hot kernel for DECODER deformable cross-attention.

The decoder's queries are arbitrary refined points (nq x npts per frame), so
the encoder kernel's per-tile footprint premise does not hold — but the query
count is small (~2.5k at nq=100, npts=25), so each query block's "footprint"
can simply be the WHOLE padded level: the bilinear/attention one-hot G is
built per level over the full (Hp, Wp) extent in a VMEM scratch (the
outer-product form of ops/deform_attn_vmem.py with origin 0) and contracted
against the level grid on the MXU. No halo, no approximation: corners beyond
the padded extent contribute exact zeros (grid_sample zero padding), matching
``ms_deform_attn_core`` / the reference oracle (third_party/adet/layers/
ms_deform_attn.py:40-60) like the gather core does.

Why: the corner-merged row gather runs at XLA's fixed ~78 M rows/s
(docs/PERF_NOTES.md) — ~8 ms/layer at B=2 plus the shifted-concat table
build. The one-hot build is ~6 G-FMA/layer on the VPU and the dots are
deep-K MXU work, both off the gather's instruction-rate wall.

Layout: grid (query-blocks, B, M); per-step VMEM = per-level G scratches
(f32, up to (128, 224, Qb)) + one (Hp*Wp, D) grid block per level. v5e VMEM
(128 MB) holds Qb=128 comfortably.

Differentiable: the op carries a ``jax.custom_vjp`` whose backward is a
second fused kernel (the TPU analogue of the reference CUDA col2im backward,
ms_deform_im2col_cuda.cuh:302,:407,:514). Per (b, m, query-block) step it
rebuilds the per-level one-hot pieces and computes, entirely in VMEM:

  dV_l   = G^T-contraction  (K, Q) x (Q, D) MXU dot, accumulated across
           query blocks into a (K, D) output block (grid's innermost dim);
  dG_l   = (K, D) x (Q, D) MXU dot against the level grid;
  dattn  = <dG, wy_p (x) wx_p>        (VPU reduces over the footprint);
  dloc   = attn_p * <dG, dwy_p (x) wx_p> / <dG, wy_p (x) dwx_p>
           (the bilinear weights' exact coordinate derivatives).

Gradient parity vs the differentiable gather core is pinned in
tests/test_deform_attn_grads.py.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deform_attn_tiled import _pad_level_grids
from .deform_attn_vmem import _accum_onehot_g, _onehot_rows


def _kernel(x_ref, y_ref, a_ref, *refs, geom, P, Qb, D, out_dtype):
    """One (query-block, b, m) step: build per-level full-extent G in VMEM,
    contract with the level grid.

    Blocks (squeezed): x/y/a (L, P, Qb) f32 global level coords / attention;
    fp_l (Fh*Fw, D); out (Qb, D); g_l (Fh, Fw, Qb) f32 scratch.
    """
    L = len(geom)
    fp_refs = refs[:L]
    out_ref = refs[L]
    g_refs = refs[L + 1 :]

    acc = jnp.zeros((Qb, D), jnp.float32)
    for l2, (Fh, Fw) in enumerate(geom):
        x = x_ref[l2]  # (P, Qb)
        y = y_ref[l2]
        a = a_ref[l2]
        g = g_refs[l2]
        _accum_onehot_g(g, x, y, a, Fh, Fw, P, Qb)
        G = g[...].reshape(Fh * Fw, Qb).astype(out_dtype)
        acc = acc + jax.lax.dot_general(
            G,
            fp_refs[l2][...],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[...] = acc.astype(out_dtype)


def _bwd_kernel(x_ref, y_ref, a_ref, do_ref, *refs, geom, P, Qb, D):
    """One (b, m, query-block) step of the backward pass.

    refs = [fp_0..fp_{L-1}, dx, dy, da, dfp_0..dfp_{L-1}, g_0.., dg_0..].
    Blocks (squeezed): x/y/a/dx/dy/da (L, P, Qb) f32; do (Qb, D) f32;
    fp_l (Fh*Fw, D) f32; dfp_l (Fh*Fw, D) f32 ACCUMULATED across the
    query-block grid dim (innermost); g_l / dg_l (Fh, Fw, Qb) f32 scratch.
    """
    L = len(geom)
    fp_refs = refs[:L]
    dx_ref, dy_ref, da_ref = refs[L : L + 3]
    dfp_refs = refs[L + 3 : L + 3 + L]
    g_refs = refs[L + 3 + L : L + 3 + 2 * L]
    dg_refs = refs[L + 3 + 2 * L :]

    q_id = pl.program_id(2)
    do = do_ref[...].astype(jnp.float32)  # (Qb, D)

    for l2, (Fh, Fw) in enumerate(geom):
        x = x_ref[l2]  # (P, Qb)
        y = y_ref[l2]
        a = a_ref[l2]
        g = g_refs[l2]
        dg = dg_refs[l2]

        # forward G rebuild (for dV) — same outer-product form as the fwd
        _accum_onehot_g(g, x, y, a, Fh, Fw, P, Qb)
        contrib = jax.lax.dot_general(
            g[...].reshape(Fh * Fw, Qb),
            do,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, D)

        @pl.when(q_id == 0)
        def _init():
            dfp_refs[l2][...] = contrib

        @pl.when(q_id != 0)
        def _accum():
            dfp_refs[l2][...] += contrib

        # dG = V @ dO^T, staged through a VMEM scratch (value-form (K, Qb)
        # intermediates at full-level K blow the VMEM stack)
        dg[...] = jax.lax.dot_general(
            fp_refs[l2][...],
            do,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(Fh, Fw, Qb)

        xw, dxw = _onehot_rows(x, Fw, P, Qb)
        yw, dyw = _onehot_rows(y, Fh, P, Qb)
        for p in range(P):
            dgv = dg[...]
            # r = sum_ky yw_p[ky] dG[ky, kx, q] -> (Fw, Q)
            r = jnp.sum(yw[p].reshape(Fh, 1, Qb) * dgv, axis=0)
            # s = sum_kx xw_p[kx] dG[ky, kx, q] -> (Fh, Q)
            s = jnp.sum(xw[p].reshape(1, Fw, Qb) * dgv, axis=1)
            da_ref[l2, p] = jnp.sum(xw[p] * r, axis=0)
            dx_ref[l2, p] = a[p] * jnp.sum(dxw[p] * r, axis=0)
            dy_ref[l2, p] = a[p] * jnp.sum(dyw[p] * s, axis=0)


def _prep(value, spatial_shapes, sampling_locations, attention_weights,
          block, query_block):
    """Shared fwd/bwd input prep: padded level grids + (nQ, B, M, L, P, Qb)
    global-coordinate / attention arrays."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    Qb = query_block
    nQ = -(-Lq // Qb)
    Lq_pad = nQ * Qb

    grids = _pad_level_grids(value, spatial_shapes, block)
    geom = [(g.shape[2], g.shape[3]) for g in grids]

    wh = np.asarray([[w2, h2] for h2, w2 in spatial_shapes], np.float32)
    loc = sampling_locations.astype(jnp.float32)
    if Lq_pad != Lq:
        loc = jnp.pad(loc, ((0, 0), (0, Lq_pad - Lq)) + ((0, 0),) * 4)
    arr = jnp.transpose(
        loc.reshape(B, nQ, Qb, M, L, P, 2), (1, 0, 3, 4, 5, 6, 2)
    )  # (nQ, B, M, L, P, 2, Qb)
    xy = arr * jnp.asarray(wh).reshape(1, 1, 1, L, 1, 2, 1) - 0.5
    x_arr = xy[..., 0, :]
    y_arr = xy[..., 1, :]
    attn = attention_weights.astype(jnp.float32)
    if Lq_pad != Lq:
        attn = jnp.pad(attn, ((0, 0), (0, Lq_pad - Lq)) + ((0, 0),) * 3)
    a_arr = jnp.transpose(attn.reshape(B, nQ, Qb, M, L, P), (1, 0, 3, 4, 5, 2))
    return grids, geom, x_arr, y_arr, a_arr, nQ, Lq_pad


def _fwd_impl(spatial_shapes, block, query_block, interpret,
              value, sampling_locations, attention_weights):
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    out_dtype = value.dtype
    Qb = query_block

    grids, geom, x_arr, y_arr, a_arr, nQ, Lq_pad = _prep(
        value, spatial_shapes, sampling_locations, attention_weights,
        block, query_block,
    )
    fp_arrays = [
        g.reshape(B, M, g.shape[2] * g.shape[3], D).astype(out_dtype) for g in grids
    ]

    # grid (B, M, nQ): query blocks innermost, like the backward — the
    # (b, m) level-grid blocks then keep a CONSTANT index across the inner
    # dim, so Mosaic skips their re-DMA for all but the first query block
    # (the fp windows are ~2.4 MB per (b, m); the (nQ, B, M) order re-shipped
    # them every step)
    qspec = pl.BlockSpec(
        (None, None, None, L, P, Qb), lambda b_, m_, q_: (q_, b_, m_, 0, 0, 0)
    )
    fp_specs = [
        pl.BlockSpec((None, None, fh * fw, D), lambda b_, m_, q_: (b_, m_, 0, 0))
        for fh, fw in geom
    ]
    out_spec = pl.BlockSpec(
        (None, None, None, Qb, D), lambda b_, m_, q_: (q_, b_, m_, 0, 0)
    )
    kern = functools.partial(_kernel, geom=geom, P=P, Qb=Qb, D=D, out_dtype=out_dtype)
    out = pl.pallas_call(
        kern,
        grid=(B, M, nQ),
        in_specs=[qspec, qspec, qspec] + fp_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nQ, B, M, Qb, D), out_dtype),
        scratch_shapes=[pltpu.VMEM((fh, fw, Qb), jnp.float32) for fh, fw in geom],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x_arr, y_arr, a_arr, *fp_arrays)

    out = jnp.transpose(out, (1, 0, 3, 2, 4)).reshape(B, Lq_pad, M * D)
    return out[:, :Lq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _op(spatial_shapes, block, query_block, interpret,
        value, sampling_locations, attention_weights):
    return _fwd_impl(spatial_shapes, block, query_block, interpret,
                     value, sampling_locations, attention_weights)


def _op_fwd(spatial_shapes, block, query_block, interpret,
            value, sampling_locations, attention_weights):
    out = _fwd_impl(spatial_shapes, block, query_block, interpret,
                    value, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _op_bwd(spatial_shapes, block, query_block, interpret, res, dout):
    value, sampling_locations, attention_weights = res
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    Qb = query_block

    grids, geom, x_arr, y_arr, a_arr, nQ, Lq_pad = _prep(
        value, spatial_shapes, sampling_locations, attention_weights,
        block, query_block,
    )
    fp_arrays = [
        g.reshape(B, M, g.shape[2] * g.shape[3], D).astype(jnp.float32)
        for g in grids
    ]

    do = dout.astype(jnp.float32).reshape(B, Lq, M, D)
    if Lq_pad != Lq:
        # zero-padded cotangents: padded queries contribute nothing to dV
        do = jnp.pad(do, ((0, 0), (0, Lq_pad - Lq), (0, 0), (0, 0)))
    do_arr = jnp.transpose(
        do.reshape(B, nQ, Qb, M, D), (1, 0, 3, 2, 4)
    )  # (nQ, B, M, Qb, D)

    # grid (B, M, nQ): query blocks innermost so each (b, m)'s dV output
    # block stays resident and accumulates across them
    qspec = pl.BlockSpec(
        (None, None, None, L, P, Qb), lambda b_, m_, q_: (q_, b_, m_, 0, 0, 0)
    )
    do_spec = pl.BlockSpec(
        (None, None, None, Qb, D), lambda b_, m_, q_: (q_, b_, m_, 0, 0)
    )
    fp_specs = [
        pl.BlockSpec((None, None, fh * fw, D), lambda b_, m_, q_: (b_, m_, 0, 0))
        for fh, fw in geom
    ]
    dfp_specs = [
        pl.BlockSpec((None, None, fh * fw, D), lambda b_, m_, q_: (b_, m_, 0, 0))
        for fh, fw in geom
    ]
    kern = functools.partial(_bwd_kernel, geom=geom, P=P, Qb=Qb, D=D)
    outs = pl.pallas_call(
        kern,
        grid=(B, M, nQ),
        in_specs=[qspec, qspec, qspec, do_spec] + fp_specs,
        out_specs=[qspec, qspec, qspec] + dfp_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nQ, B, M, L, P, Qb), jnp.float32),
            jax.ShapeDtypeStruct((nQ, B, M, L, P, Qb), jnp.float32),
            jax.ShapeDtypeStruct((nQ, B, M, L, P, Qb), jnp.float32),
        ]
        + [
            jax.ShapeDtypeStruct((B, M, fh * fw, D), jnp.float32)
            for fh, fw in geom
        ],
        scratch_shapes=[pltpu.VMEM((fh, fw, Qb), jnp.float32) for fh, fw in geom]
        + [pltpu.VMEM((fh, fw, Qb), jnp.float32) for fh, fw in geom],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x_arr, y_arr, a_arr, do_arr, *fp_arrays)
    dx_arr, dy_arr, da_arr = outs[:3]
    dfp = outs[3:]

    # (nQ, B, M, L, P, Qb) -> (B, Lq, M, L, P)
    def untile(arr):
        a = jnp.transpose(arr, (1, 0, 5, 2, 3, 4)).reshape(B, Lq_pad, M, L, P)
        return a[:, :Lq]

    wh = np.asarray([[w2, h2] for h2, w2 in spatial_shapes], np.float32)
    dxy = jnp.stack([untile(dx_arr), untile(dy_arr)], axis=-1)
    dloc = dxy * jnp.asarray(wh).reshape(1, 1, 1, L, 1, 2)
    dattn = untile(da_arr)

    # per-level (B, M, Hp*Wp, D) -> crop padding -> (B, S, M, D)
    dval_levels = []
    for (h, w), g, d in zip(spatial_shapes, grids, dfp):
        hp, wp = g.shape[2], g.shape[3]
        dl = d.reshape(B, M, hp, wp, D)[:, :, :h, :w]
        dval_levels.append(jnp.transpose(dl, (0, 2, 3, 1, 4)).reshape(B, h * w, M, D))
    dvalue = jnp.concatenate(dval_levels, axis=1).astype(value.dtype)

    return (
        dvalue,
        dloc.astype(sampling_locations.dtype),
        dattn.astype(attention_weights.dtype),
    )


_op.defvjp(_op_fwd, _op_bwd)


def ms_deform_attn_queries_vmem(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    block: int = 8,
    query_block: int = 256,  # measured best on v5e (8.4 ms at 128, 6.3 at 256)
    gather_levels: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Deformable attention for ARBITRARY queries via full-level one-hot MXU
    contractions. Exact (same zero-padding semantics as the gather core) and
    differentiable (fused backward kernel — see module docstring).

    ``gather_levels > 0`` routes the FINEST ``gather_levels`` levels through
    the corner-merged gather core instead (level-0 hybrid,
    docs/PERF_NOTES.md): at decoder query counts (~2.5k) the gather is tiny,
    while the one-hot G build scales with the level's full (Hp, Wp) extent —
    level 0 is ~75% of the token mass. Deformable attention is linear over
    (level, point) slices once the softmax is done, so the split is EXACT;
    both halves differentiate (gather via XLA, fused via the custom VJP).
    The level-0 corner table depends only on ``value``, so XLA CSEs it
    across the decoder's six cross-attention layers.

    Args match ``ms_deform_attn_core``: value (B, S, M, D), sampling_locations
    (B, Lq, M, L, P, 2) normalized, attention_weights (B, Lq, M, L, P).
    Returns (B, Lq, M*D).
    """
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    L = len(shapes)
    if gather_levels <= 0:
        return _op(shapes, block, query_block, interpret,
                   value, sampling_locations, attention_weights)
    from .deform_attn import ms_deform_attn_core

    g = min(int(gather_levels), L)
    s0 = sum(h * w for h, w in shapes[:g])
    out = ms_deform_attn_core(
        value[:, :s0], shapes[:g],
        sampling_locations[:, :, :, :g], attention_weights[:, :, :, :g],
    )
    if g < L:
        out = out + _op(
            shapes[g:], block, query_block, interpret,
            value[:, s0:],
            sampling_locations[:, :, :, g:], attention_weights[:, :, :, g:],
        )
    return out
