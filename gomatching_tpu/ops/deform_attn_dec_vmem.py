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
from .deform_attn_vmem import _accum_onehot_g


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


def ms_deform_attn_queries_vmem(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    block: int = 8,
    query_block: int = 256,  # measured best on v5e (8.4 ms at 128, 6.3 at 256)
    interpret: bool = False,
) -> jnp.ndarray:
    """Deformable attention for ARBITRARY queries via full-level one-hot MXU
    contractions. Exact (same zero-padding semantics as the gather core).

    Args match ``ms_deform_attn_core``: value (B, S, M, D), sampling_locations
    (B, Lq, M, L, P, 2) normalized, attention_weights (B, Lq, M, L, P).
    Returns (B, Lq, M*D).
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    out_dtype = value.dtype
    Qb = query_block
    nQ = -(-Lq // Qb)
    Lq_pad = nQ * Qb

    grids = _pad_level_grids(value, spatial_shapes, block)
    geom = [(g.shape[2], g.shape[3]) for g in grids]
    fp_arrays = [
        g.reshape(B, M, g.shape[2] * g.shape[3], D).astype(out_dtype) for g in grids
    ]

    # (B, Lq, M, L, P) -> (nQ, B, M, L, P, Qb) with global level coords
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

    qspec = pl.BlockSpec(
        (None, None, None, L, P, Qb), lambda q_, b_, m_: (q_, b_, m_, 0, 0, 0)
    )
    fp_specs = [
        pl.BlockSpec((None, None, fh * fw, D), lambda q_, b_, m_: (b_, m_, 0, 0))
        for fh, fw in geom
    ]
    out_spec = pl.BlockSpec(
        (None, None, None, Qb, D), lambda q_, b_, m_: (q_, b_, m_, 0, 0)
    )
    kern = functools.partial(_kernel, geom=geom, P=P, Qb=Qb, D=D, out_dtype=out_dtype)
    out = pl.pallas_call(
        kern,
        grid=(nQ, B, M),
        in_specs=[qspec, qspec, qspec] + fp_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nQ, B, M, Qb, D), out_dtype),
        scratch_shapes=[pltpu.VMEM((fh, fw, Qb), jnp.float32) for fh, fw in geom],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x_arr, y_arr, a_arr, *fp_arrays)

    out = jnp.transpose(out, (1, 0, 3, 2, 4)).reshape(B, Lq_pad, M * D)
    return out[:, :Lq]
