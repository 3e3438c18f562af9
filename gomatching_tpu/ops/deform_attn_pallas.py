"""Pallas TPU kernel for multi-scale deformable-attention sampling.

Same numerical contract as ``ops.deform_attn.ms_deform_attn_core`` (the
reference's grid_sample-semantics sampler,
third_party/adet/layers/ms_deform_attn.py:40-60; CUDA kernel
ms_deform_im2col_cuda.cuh:238).

Design (v2 — scalar-loop over a VMEM-resident merged table). Mosaic cannot
vector-gather across multiple source vregs, so the XLA path's
``take_along_axis`` formulation is not lowerable; instead:

  - the corner-merged (S, 4*D) table of ONE (batch, head) pair sits in VMEM
    (bf16: ~9.5 MB at 1000px inputs) — every sample fetch is a VMEM
    dynamic-sublane slice, not an HBM row gather;
  - the grid walks (B, M, query-blocks); per query a fori_loop over the
    L*P samples loads the sample's merged row ``table[idx]`` (1, 4D), slices
    the four D-wide corner blocks at static lane offsets, and accumulates
    ``w_corner * block`` with scalar weights read from SMEM;
  - gather indices and folded slot weights are precomputed by the (cheap,
    dense) XLA prologue shared with the XLA path.

The XLA fallback stays the default (TPU.SAMPLING_IMPL=xla); flip to 'pallas'
per config. Both paths are compared in the unit tests (interpret mode on CPU).

STATUS on v5e / current Mosaic: the compiler requires dynamic sublane offsets
to be tile-aligned ("cannot statically prove that index in dimension 2 is a
multiple of 8"), so the per-sample ``table[pl.ds(i, 1)]`` load does not lower.
The aligned workaround (load the enclosing 8-row block + select) costs
~12-16 cycles/row — measured parity with XLA's row gather (~78 M rows/s,
~12 cycles/row), so it buys nothing; the XLA corner-merged path remains the
production kernel. Revisit when Mosaic gains unaligned dynamic slices or
single-vreg sublane gathers on multi-vreg tables.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deform_attn import _merged_corner_table, _merged_indices_and_slot_weights


def _sampling_kernel(
    idx_ref,  # (1, 1, QB, LP) int32, SMEM
    w_ref,  # (1, 1, QB, LP, 4) f32, SMEM
    table_ref,  # (1, 1, S, 4D) VMEM
    out_ref,  # (1, 1, QB, D) f32 VMEM
    *,
    n_samples: int,
    d: int,
):
    qb = out_ref.shape[2]

    def per_query(q, _):
        acc = jnp.zeros((1, d), jnp.float32)
        for s in range(n_samples):  # static unroll: L*P = 16
            i = idx_ref[0, 0, q, s]
            row = table_ref[0, 0, pl.ds(i, 1), :]  # (1, 4D)
            for c in range(4):
                w = w_ref[0, 0, q, s, c]
                acc = acc + row[:, c * d : (c + 1) * d].astype(jnp.float32) * w
        out_ref[0, 0, pl.ds(q, 1), :] = acc
        return 0

    jax.lax.fori_loop(0, qb, per_query, 0)


def ms_deform_attn_pallas(
    value: jnp.ndarray,  # (B, S, M, D)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # (B, Lq, M, L, P, 2)
    attention_weights: jnp.ndarray,  # (B, Lq, M, L, P)
    query_block: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused sampling; returns (B, Lq, M*D) like ``ms_deform_attn_core``."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    LP = L * P
    out_dtype = value.dtype

    value_bm = jnp.transpose(value, (0, 2, 1, 3))  # (B, M, S, D)
    table = _merged_corner_table(value_bm, spatial_shapes)  # (B, M, S, 4D)
    idx, slot_w = _merged_indices_and_slot_weights(
        sampling_locations, attention_weights, spatial_shapes
    )  # (B, M, Lq, LP), (B, M, Lq, LP, 4)

    qb = min(query_block, Lq)
    n_blocks = -(-Lq // qb)
    pad = n_blocks * qb - Lq
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad), (0, 0)))
        slot_w = jnp.pad(slot_w, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))

    kernel = functools.partial(_sampling_kernel, n_samples=LP, d=D)
    out = pl.pallas_call(
        kernel,
        grid=(B, M, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, qb, LP), lambda b, m, k: (b, m, k, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, qb, LP, 4),
                lambda b, m, k: (b, m, k, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, S, 4 * D), lambda b, m, k: (b, m, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, qb, D), lambda b, m, k: (b, m, k, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, M, n_blocks * qb, D), jnp.float32),
        interpret=interpret,
    )(idx, slot_w.astype(jnp.float32), table)

    out = jnp.transpose(out[:, :, :Lq], (0, 2, 1, 3)).reshape(B, Lq, M * D)
    return out.astype(out_dtype)
