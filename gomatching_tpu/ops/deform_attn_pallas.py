"""Pallas TPU kernel for multi-scale deformable-attention sampling.

Same numerical contract as ``ops.deform_attn.ms_deform_attn_core`` (the reference's
grid_sample-semantics sampler, third_party/adet/layers/ms_deform_attn.py:40-60),
re-designed around the one dynamic-gather form Mosaic lowers on TPU:

    out[r, c] = table[idx[r, c], c]       (jnp.take_along_axis, axis=0,
                                           idx.shape == table.shape)

i.e. a per-lane-column independent row gather whose output row count equals the
table row count. The kernel therefore:

  - keeps one (S, D) head-value table resident in VMEM per (batch, head) program
    (S = level-concatenated token count; ~2.4 MB in bf16 at 1000px inputs) —
    gathers hit VMEM, not HBM, which is the entire point: the XLA fallback's HBM
    row-gathers measure ~100M rows/s on v5e while the encoder needs ~19M rows per
    layer per frame;
  - sweeps the L*P sample axis on the grid, streaming that sample's (S, 2)
    locations + (S, 1) attention weight and unrolling the 4 bilinear corners, each
    one dynamic-gather of the full query axis (queries are padded to S — exact for
    the encoder where Lq == S);
  - folds the bilinear weight and zero-padding mask into the attention weight and
    accumulates in f32 into a VMEM-resident output block.

NOTE on this environment: the axon TPU terminal currently cannot compile Mosaic
kernels (its remote compile helper fails libtpu init, and local AOT compile is
rejected for a libtpu version mismatch), so the default sampling impl stays on the
XLA path; this kernel is exercised in interpret mode by the test suite and is the
drop-in fast path once the toolchain is fixed (set TPU.SAMPLING_IMPL=pallas).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sampling_kernel(
    loc_ref,  # (1, 1, 1, Sp, 2) f32 — this sample's normalized locations
    attn_ref,  # (1, 1, 1, Sp, 1) f32 — this sample's attention weight
    value_ref,  # (1, 1, Sp, D) — head-value table
    out_ref,  # (1, 1, Sp, D) f32 accumulator
    *,
    level_dims: Tuple[Tuple[int, int, int], ...],  # (H, W, start) per level
    n_points: int,
    s_pad: int,
):
    g = pl.program_id(2)
    S, D = value_ref.shape[2], value_ref.shape[3]

    @pl.when(g == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    loc = loc_ref[0, 0, 0]  # (Sp, 2)
    attn = attn_ref[0, 0, 0, :, 0]  # (Sp,)
    value = value_ref[0, 0]  # (Sp, D)

    acc = out_ref[0, 0]
    for lvl, (h, w, start) in enumerate(level_dims):
        # samples are laid out level-major on the grid axis: g in [lvl*P, (lvl+1)*P)
        @pl.when((g >= lvl * n_points) & (g < (lvl + 1) * n_points))
        def _do(h=h, w=w, start=start):
            x = loc[:, 0] * w - 0.5
            y = loc[:, 1] * h - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            dx = x - x0
            dy = y - y0
            contrib = jnp.zeros((S, D), jnp.float32)
            for cy in (0, 1):
                for cx in (0, 1):
                    xi = x0 + cx
                    yi = y0 + cy
                    wgt = jnp.where(cx == 1, dx, 1.0 - dx) * jnp.where(cy == 1, dy, 1.0 - dy)
                    inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
                    wgt = jnp.where(inside, wgt * attn, 0.0)
                    xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
                    yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
                    idx = start + yi_c * w + xi_c  # (Sp,)
                    idx2 = jax.lax.broadcast_in_dim(idx, (S, D), (0,))
                    rows = jnp.take_along_axis(
                        value, idx2, axis=0, mode="promise_in_bounds"
                    )
                    contrib = contrib + rows.astype(jnp.float32) * wgt[:, None]
            out_ref[0, 0] = acc + contrib


def ms_deform_attn_pallas(
    value: jnp.ndarray,  # (B, S, M, D)
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # (B, Lq, M, L, P, 2)
    attention_weights: jnp.ndarray,  # (B, Lq, M, L, P)
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused sampling; returns (B, Lq, M*D) like ``ms_deform_attn_core``."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    out_dtype = value.dtype

    s_pad = _round_up(max(S, Lq), 8)
    level_dims = []
    start = 0
    for h, w in spatial_shapes:
        level_dims.append((h, w, start))
        start += h * w

    # (B, M, Sp, D) table, zero-padded rows
    v = jnp.transpose(value, (0, 2, 1, 3))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    # (B, M, L*P, Sp, 2) locations, level-major on the sample axis
    loc = jnp.transpose(sampling_locations, (0, 2, 3, 4, 1, 5)).reshape(B, M, L * P, Lq, 2)
    loc = jnp.pad(loc, ((0, 0), (0, 0), (0, 0), (0, s_pad - Lq), (0, 0))).astype(jnp.float32)
    attn = jnp.transpose(attention_weights, (0, 2, 3, 4, 1)).reshape(B, M, L * P, Lq, 1)
    attn = jnp.pad(attn, ((0, 0), (0, 0), (0, 0), (0, s_pad - Lq), (0, 0))).astype(jnp.float32)

    kernel = functools.partial(
        _sampling_kernel, level_dims=tuple(level_dims), n_points=P, s_pad=s_pad
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, M, L * P),
        in_specs=[
            pl.BlockSpec((1, 1, 1, s_pad, 2), lambda b, m, g: (b, m, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s_pad, 1), lambda b, m, g: (b, m, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_pad, D), lambda b, m, g: (b, m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, s_pad, D), lambda b, m, g: (b, m, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, s_pad, D), jnp.float32),
        interpret=interpret,
    )(loc, attn, v)

    out = jnp.transpose(out[:, :, :Lq], (0, 2, 1, 3)).reshape(B, Lq, M * D)
    return out.astype(out_dtype)
