"""Fused Pallas kernel for tiled encoder deformable attention.

Same numerical contract and tiling geometry as ``deform_attn_tiled``
(grid_sample align_corners=False + zero padding within per-tile footprints;
``ms_deform_attn_core_pytorch``, third_party/adet/layers/ms_deform_attn.py:
40-60), but the bilinear one-hot matrix G lives ONLY in VMEM: the kernel
builds it with four corner compares against a flat footprint iota and feeds
the MXU contraction directly, so G's ~3 GB/layer HBM round trip (the measured
cost floor of the XLA tiled path, docs/PERF_NOTES.md) disappears. Footprint
value blocks arrive through Pallas' double-buffered block pipeline.

Unlike ``deform_attn_pallas`` (the VMEM-table gather kernel), this kernel
contains NO gathers or unaligned dynamic slices — only iota / compare /
select / dot — so it LOWERS AND RUNS on current Mosaic (v5e-verified).

Measured status (v5e, 1000px, B=1): ~194 ms/layer vs the XLA tiled path's
~33 ms — NOT the production default. The HBM win is real but the G build
dominates: the flat 4-corner-compare form costs 4x the outer-product form's
VPU work, must stay f32 (Mosaic can't insert minor dims on sub-32-bit
vectors), and Mosaic doesn't fuse the compare chains the way XLA fuses the
outer-product-sum. Kept as the honest baseline for a future Mosaic rev (an
in-kernel outer-product build needs (Q, Fh, Fw) -> (Q, F) reshapes that don't
lower today).

Layout per source level l (queries = that level's grid tokens):
  grid = (T, B, M) over query tiles and heads;
  inputs per step: local sampling coords + attention weights for the tile
  (Q, L, P), and one (Fh_l2, Fw_l2, D) footprint block per target level;
  output: (Q, D) accumulated over target levels.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deform_attn_tiled import (
    _DEFAULT_TILES,
    _footprint_bounds,
    _level_starts,
    _pad_level_grids,
    _round_up,
    _tile_queries,
    _untile_queries,
)


def _kernel(xy_ref, attn_ref, fp_ref, out_ref, *, Fh, Fw, out_dtype):
    """One (tile, b, m) step for ONE (source, target) level pair: build the
    flat one-hot G in VMEM via four corner compares per point, contract with
    the footprint block on the MXU.

    Mosaic constraints shaped this code (all discovered by compile error):
      - the G build stays f32 — minor-dim insertion on sub-32-bit vectors
        doesn't lower; cast to the compute dtype only after the P-sum;
      - G accumulates per point over a python-unrolled P loop with (Q, F)
        intermediates — a fully vectorized (Q, P, F) build, or several target
        levels in one kernel, exceeds Mosaic's VMEM stack (no slot reuse
        across long unrolled chains);
      - footprints arrive pre-flattened (F, D) — in-kernel (Fh, Fw, D) ->
        (F, D) reshapes don't lower.
    Block dims with None entries are squeezed: xy_ref (Q, P, 2), attn_ref
    (Q, P), fp_ref (F, D), out_ref (Q, D).
    """
    F = Fh * Fw
    Q, P = attn_ref.shape
    x = xy_ref[:, :, 0]  # (Q, P) local target-level coords
    y = xy_ref[:, :, 1]
    a = attn_ref[...]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    xl = x0.astype(jnp.int32)
    yl = y0.astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (Q, F), 1)
    zero = jnp.zeros((), jnp.float32)
    Gq = jnp.zeros((Q, F), jnp.float32)
    for p in range(P):
        xlp = xl[:, p][:, None]
        ylp = yl[:, p][:, None]
        dxp = dx[:, p][:, None]
        dyp = dy[:, p][:, None]
        ap = a[:, p][:, None]
        base = ylp * Fw + xlp
        okx0 = (xlp >= 0) & (xlp < Fw)
        okx1 = (xlp + 1 >= 0) & (xlp + 1 < Fw)
        oky0 = (ylp >= 0) & (ylp < Fh)
        oky1 = (ylp + 1 >= 0) & (ylp + 1 < Fh)
        Gq = Gq + jnp.where((idx == base) & okx0 & oky0, ap * (1 - dyp) * (1 - dxp), zero)
        Gq = Gq + jnp.where((idx == base + 1) & okx1 & oky0, ap * (1 - dyp) * dxp, zero)
        Gq = Gq + jnp.where((idx == base + Fw) & okx0 & oky1, ap * dyp * (1 - dxp), zero)
        Gq = Gq + jnp.where((idx == base + Fw + 1) & okx1 & oky1, ap * dyp * dxp, zero)
    out_ref[...] = jax.lax.dot_general(
        Gq.astype(out_dtype), fp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def ms_deform_attn_encoder_fused(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    halo: int = 8,
    block: int = 8,
    tile_sizes: Optional[Sequence[int]] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in equivalent of ``ms_deform_attn_encoder_tiled`` backed by the
    fused Pallas kernel. Same arguments/contract (see that docstring)."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert Lq == S, "fused path requires queries == tokens (encoder self-attn)"
    out_dtype = value.dtype
    tiles = list(tile_sizes) if tile_sizes is not None else list(_DEFAULT_TILES[:L])
    while len(tiles) < L:
        tiles.append(max(2, tiles[-1] // 2))

    grids = _pad_level_grids(value, spatial_shapes, block)
    starts, _ = _level_starts(spatial_shapes)

    out_levels: List[jnp.ndarray] = []
    for l, (H1, W1) in enumerate(spatial_shapes):
        t = tiles[l]
        ty, tx = min(t, H1), min(t, W1)
        s = starts[l]
        loc_l = sampling_locations[:, s : s + H1 * W1]
        attn_l = attention_weights[:, s : s + H1 * W1]
        loc_t, nty, ntx = _tile_queries(loc_l, H1, W1, ty, tx)  # (T,B,Q,M,L,P,2)
        attn_t, _, _ = _tile_queries(attn_l, H1, W1, ty, tx)
        T, _, Q = loc_t.shape[:3]
        loc_t = jnp.moveaxis(loc_t, 2, 3)  # (T,B,M,Q,L,P,2)
        attn_t = jnp.moveaxis(attn_t, 2, 3)

        # one pallas_call per (source, target) level pair — several pairs in
        # one kernel blow Mosaic's VMEM stack (see _kernel docstring); the
        # f32 (T, B, M, Q, D) partials are small and sum in XLA
        acc = None
        for l2, (H2, W2) in enumerate(spatial_shapes):
            Hp2, Wp2 = grids[l2].shape[2], grids[l2].shape[3]
            oys, Fh = _footprint_bounds(H1, ty, nty, H2, Hp2, halo, block)
            oxs, Fw = _footprint_bounds(W1, tx, ntx, W2, Wp2, halo, block)
            is_full = Fh == Hp2 and Fw == Wp2
            oy_t = np.repeat(np.asarray(oys, np.float32), ntx)  # (T,)
            ox_t = np.tile(np.asarray(oxs, np.float32), nty)
            xg = loc_t[..., l2, :, 0] * W2 - 0.5  # (T,B,M,Q,P) global
            yg = loc_t[..., l2, :, 1] * H2 - 0.5
            xy = jnp.stack(
                [
                    xg - jnp.asarray(ox_t).reshape(T, 1, 1, 1, 1),
                    yg - jnp.asarray(oy_t).reshape(T, 1, 1, 1, 1),
                ],
                axis=-1,
            )  # (T,B,M,Q,P,2) local float coords
            attn_in = attn_t[..., l2, :]  # (T,B,M,Q,P)
            if is_full:
                fp = grids[l2].astype(out_dtype).reshape(B, M, Fh * Fw, D)
                fp_spec = pl.BlockSpec(
                    (None, None, Fh * Fw, D), lambda t_, b_, m_: (b_, m_, 0, 0)
                )
            else:
                rows = jnp.stack(
                    [jax.lax.slice_in_dim(grids[l2], int(oy), int(oy) + Fh, axis=2)
                     for oy in oys]
                )  # (nty, B, M, Fh, Wp, D)
                fp = jnp.stack(
                    [jax.lax.slice_in_dim(rows, int(ox), int(ox) + Fw, axis=4)
                     for ox in oxs],
                    axis=1,
                ).reshape(T, B, M, Fh * Fw, D).astype(out_dtype)
                fp_spec = pl.BlockSpec(
                    (None, None, None, Fh * Fw, D),
                    lambda t_, b_, m_: (t_, b_, m_, 0, 0),
                )

            kern = functools.partial(_kernel, Fh=Fh, Fw=Fw, out_dtype=out_dtype)
            part = pl.pallas_call(
                kern,
                grid=(T, B, M),
                in_specs=[
                    pl.BlockSpec(
                        (None, None, None, Q, P, 2),
                        lambda t_, b_, m_: (t_, b_, m_, 0, 0, 0),
                    ),
                    pl.BlockSpec(
                        (None, None, None, Q, P),
                        lambda t_, b_, m_: (t_, b_, m_, 0, 0),
                    ),
                    fp_spec,
                ],
                out_specs=pl.BlockSpec(
                    (None, None, None, Q, D), lambda t_, b_, m_: (t_, b_, m_, 0, 0)
                ),
                out_shape=jax.ShapeDtypeStruct((T, B, M, Q, D), jnp.float32),
                # the unrolled 16-compare G build keeps ~36 MB of f32 (Q, F)
                # stack slots live at F=1600; the 16 MB default scoped limit
                # is too small (VMEM capacity is 128 MB)
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024
                ),
                interpret=interpret,
            )(xy, attn_in, fp)
            acc = part if acc is None else acc + part

        out = jnp.moveaxis(acc, 2, 3)  # (T, B, Q, M, D)
        out_l = _untile_queries(out.astype(out_dtype), nty, ntx, H1, W1, ty, tx)
        out_levels.append(out_l.reshape(B, H1 * W1, M * D))

    return jnp.concatenate(out_levels, axis=1)
