"""Tiled one-hot-matmul deformable attention for ENCODER self-attention — MXU path.

Numerical spec: identical to ``ms_deform_attn_core`` / the reference oracle
``ms_deform_attn_core_pytorch`` (third_party/adet/layers/ms_deform_attn.py:40-60),
i.e. grid_sample align_corners=False + zero padding, softmaxed attention reduce.

Why this exists (the TPU speed-of-light argument, docs/PERF_NOTES.md): XLA's TPU
row gather is instruction-bound at ~78 M rows/s, so the encoder's B*S*M*L*P
(~4.8 M/layer at 1000 px) random samples cost ~61 ms/layer no matter the layout.
But encoder queries ARE the multi-scale grid tokens: each query's sampling
locations are its own grid position plus a learned offset. A spatial tile of
queries therefore reads from a small, statically-known footprint of each target
level. Folding the bilinear corner weights and the P-point attention sum into a
per-(query, head) one-hot row G and contracting G @ V_footprint on the MXU costs
~F*D mul-adds per query-head (~10^5) — a fraction of an MXU-cycle — instead of
~12 scalar-issue cycles per gathered row. Measured on v5e this is ~5-8x the
gather core per encoder layer (see PERF_NOTES round 2).

Exactness contract: a sample corner is resolved exactly when it lands inside the
tile's footprint (tile span + ``halo`` cells at the target level, block-rounded).
Corners outside the *level* contribute zero — exact grid_sample zero-padding
(footprints are zero-padded at level edges). Corners inside the level but
outside the footprint are dropped: that is the only approximation, it vanishes
when |offset| <= halo target cells, and ``deform_attn_dropped_mass`` measures
the dropped attention mass densely so production configs can size ``halo``
against real weights. The gather core remains the exact fallback
(MODEL.TRANSFORMER.DEFORM_IMPL = 'gather').

This path assumes queries = tokens in level order (Lq == S) and un-padded
(square-batch) inputs so reference points sit at grid centers; MSDeformAttn only
selects it in that regime.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# per-source-level query tile edge (cells); coarse levels use smaller tiles so
# their footprint at fine target levels stays bounded
_DEFAULT_TILES = (16, 8, 8, 4)


def _level_starts(spatial_shapes):
    starts, cur = [], 0
    for h, w in spatial_shapes:
        starts.append(cur)
        cur += h * w
    return starts, cur


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _footprint_bounds(
    n_src: int, tile: int, n_tiles: int, n_tgt: int, n_tgt_pad: int, halo: int, block: int
):
    """Static per-tile footprint origin + common footprint extent along one axis.

    Source cell k has reference center (k + 0.5) / n_src * n_tgt - 0.5 in target
    cells; sampling offsets add at most ``halo`` target cells; the bilinear
    corner pair is (floor(y), floor(y)+1). Returns (origins list, extent F)
    with origins block-aligned and F a block multiple covering every tile.
    """
    scale = n_tgt / n_src
    lo_raw, hi_raw = [], []
    for i in range(n_tiles):
        k_lo = i * tile
        k_hi = min((i + 1) * tile, n_src) - 1
        lo = (k_lo + 0.5) * scale - 0.5 - halo
        hi = (k_hi + 0.5) * scale - 0.5 + halo
        lo_raw.append(int(math.floor(lo)))
        hi_raw.append(int(math.floor(hi)) + 1)
    extent = 0
    origins = []
    for lo, hi in zip(lo_raw, hi_raw):
        o = (lo // block) * block
        origins.append(o)
        extent = max(extent, hi - o + 1)
    F = min(_round_up(extent, block), n_tgt_pad)
    origins = [max(0, min(o, n_tgt_pad - F)) for o in origins]
    return origins, F


def _pad_level_grids(value, spatial_shapes, block):
    """(B, S, M, D) -> list of (B, M, Hp, Wp, D), zero-padded to block multiples.

    Zero padding on the high side doubles as grid_sample's zero-padding region:
    corner matches landing there read exact zeros.
    """
    B, S, M, D = value.shape
    starts, total = _level_starts(spatial_shapes)
    assert total == S
    grids = []
    for (h, w), s in zip(spatial_shapes, starts):
        g = value[:, s : s + h * w].reshape(B, h, w, M, D)
        g = jnp.transpose(g, (0, 3, 1, 2, 4))  # (B, M, h, w, D)
        hp, wp = _round_up(h, block), _round_up(w, block)
        g = jnp.pad(g, ((0, 0), (0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        grids.append(g)
    return grids


def _tile_queries(arr, h, w, ty, tx):
    """(B, h*w, ...) -> (T, B, ty*tx, ...), zero-padding partial edge tiles."""
    B = arr.shape[0]
    rest = arr.shape[2:]
    nty, ntx = -(-h // ty), -(-w // tx)
    a = arr.reshape(B, h, w, *rest)
    a = jnp.pad(
        a, ((0, 0), (0, nty * ty - h), (0, ntx * tx - w)) + ((0, 0),) * len(rest)
    )
    a = a.reshape(B, nty, ty, ntx, tx, *rest)
    a = jnp.moveaxis(a, (1, 3), (0, 1))  # (nty, ntx, B, ty, tx, ...)
    return a.reshape(nty * ntx, B, ty * tx, *rest), nty, ntx


def _untile_queries(tiled, nty, ntx, h, w, ty, tx):
    """(T, B, Q, ...) -> (B, h*w, ...), dropping edge-tile padding."""
    T, B, Q = tiled.shape[:3]
    rest = tiled.shape[3:]
    a = tiled.reshape(nty, ntx, B, ty, tx, *rest)
    a = jnp.moveaxis(a, (0, 1), (1, 3))  # (B, nty, ty, ntx, tx, ...)
    a = a.reshape(B, nty * ty, ntx * tx, *rest)
    return a[:, :h, :w].reshape(B, h * w, *rest)


def _axis_onehot(coord0, frac, origin, extent):
    """Bilinear-weighted one-hot along one axis.

    coord0: floor of the sample coordinate (target cells, global), any shape X.
    Returns (X..., extent) with weight (1-frac) at local coord0 and frac at
    coord0+1. Matches outside [0, extent) simply don't fire; the level's real
    edge is handled by the zero-padded footprint rows (exact zero padding),
    so no explicit in-level masking is needed.
    """
    local = coord0 - origin
    idx = jax.lax.broadcasted_iota(jnp.int32, local.shape + (extent,), local.ndim)
    l0 = local[..., None].astype(jnp.int32)
    f = frac[..., None]
    return jnp.where(idx == l0, 1.0 - f, 0.0) + jnp.where(idx == l0 + 1, f, 0.0)


def ms_deform_attn_encoder_tiled(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    halo: int = 8,
    block: int = 8,
    tile_sizes: Optional[Sequence[int]] = None,
    tile_chunk_rows: int = 32768,
) -> jnp.ndarray:
    """Encoder deformable attention via per-tile one-hot MXU contractions.

    Args:
      value: (B, S, M, D) level-concatenated per-head values.
      spatial_shapes: static [(H_l, W_l)]; sum(H*W) == S == Lq.
      sampling_locations: (B, Lq, M, L, P, 2) normalized [0,1].
      attention_weights: (B, Lq, M, L, P) softmaxed over L*P.
      halo: max |offset| (in target-level cells) resolved exactly; beyond it
        contributions are dropped (see module docstring).
      block: footprint alignment quantum.
      tile_sizes: per-source-level query tile edge; default (16, 16, 8, 4)[:L].
      tile_chunk_rows: ~G rows (tiles*Q*M) per lax.map step, bounds peak memory.

    Returns:
      (B, Lq, M*D), dtype of value.
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert Lq == S, "tiled path requires queries == tokens (encoder self-attn)"
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
        attn_t, _, _ = _tile_queries(attn_l, H1, W1, ty, tx)  # (T,B,Q,M,L,P)
        T, _, Q = loc_t.shape[:3]
        # head-major so G is born in the matmul's (…, M, Q, F) layout — a
        # moveaxis on G itself inside the loop cost ~5 ms/layer (measured)
        loc_t = jnp.moveaxis(loc_t, 2, 3)  # (T,B,M,Q,L,P,2)
        attn_t = jnp.moveaxis(attn_t, 2, 3)  # (T,B,M,Q,L,P)

        # static footprint geometry per target level; targets whose footprint
        # covers the whole (padded) level skip per-tile extraction and share
        # one V operand across tiles (bigger effective matmul, no T-fold copy)
        geom = []
        full_fps = {}
        xs = {"loc": loc_t, "attn": attn_t}
        for l2, (H2, W2) in enumerate(spatial_shapes):
            Hp2, Wp2 = grids[l2].shape[2], grids[l2].shape[3]
            oys, Fh = _footprint_bounds(H1, ty, nty, H2, Hp2, halo, block)
            oxs, Fw = _footprint_bounds(W1, tx, ntx, W2, Wp2, halo, block)
            is_full = Fh == Hp2 and Fw == Wp2
            geom.append((H2, W2, Fh, Fw, is_full))
            if is_full:
                full_fps[l2] = grids[l2].reshape(B, M, Fh * Fw, D).astype(out_dtype)
                continue
            rows = jnp.stack(
                [jax.lax.slice_in_dim(grids[l2], oy, oy + Fh, axis=2) for oy in oys]
            )  # (nty, B, M, Fh, Wp, D)
            fp = jnp.stack(
                [jax.lax.slice_in_dim(rows, ox, ox + Fw, axis=4) for ox in oxs],
                axis=1,
            )  # (nty, ntx, B, M, Fh, Fw, D)
            fp = fp.reshape(T, B, M, Fh * Fw, D).astype(out_dtype)
            oy_t = jnp.asarray(np.repeat(np.asarray(oys, np.int32), ntx))  # (T,)
            ox_t = jnp.asarray(np.tile(np.asarray(oxs, np.int32), nty))
            xs[f"fp{l2}"] = fp
            xs[f"oy{l2}"] = oy_t
            xs[f"ox{l2}"] = ox_t

        def tile_fn(c, geom=geom, L=L, Q=Q):
            # c: one chunk of tiles; leading axis tc. Build the bilinear one-hot
            # G per target level in compute dtype via an outer-product P-sum
            # (XLA fuses it; the f32 einsum-over-P variant was 3.5x slower),
            # then contract per-tile and full-level target groups each in one
            # concatenated-K matmul.
            loc, attn = c["loc"], c["attn"]
            tc = loc.shape[0]
            acc = jnp.zeros((tc, B, M, Q, D), jnp.float32)
            for l2 in range(L):
                H2, W2, Fh, Fw, is_full = geom[l2]
                x = loc[..., l2, :, 0] * W2 - 0.5  # (tc, B, M, Q, P)
                y = loc[..., l2, :, 1] * H2 - 0.5
                x0, y0 = jnp.floor(x), jnp.floor(y)
                if is_full:
                    oy = ox = jnp.zeros((tc, 1, 1, 1, 1), jnp.int32)
                else:
                    oy = c[f"oy{l2}"].reshape(tc, 1, 1, 1, 1)
                    ox = c[f"ox{l2}"].reshape(tc, 1, 1, 1, 1)
                Yw = _axis_onehot(y0, y - y0, oy, Fh)  # (tc,B,M,Q,P,Fh)
                Xw = _axis_onehot(x0, x - x0, ox, Fw)
                Yw = (Yw * attn[..., l2, :, None]).astype(out_dtype)
                Xw = Xw.astype(out_dtype)
                G = jnp.sum(Yw[..., :, None] * Xw[..., None, :], axis=-3)
                G = G.reshape(tc, B, M, Q, Fh * Fw)
                # one dot per target level: concatenating G pieces first costs
                # an extra full write+read of G (~2.6 GB/layer, measured)
                G = jax.lax.optimization_barrier(G)
                if is_full:
                    acc = acc + jnp.einsum(
                        "tbmqf,bmfd->tbmqd",
                        G,
                        full_fps[l2],
                        preferred_element_type=jnp.float32,
                    )
                else:
                    acc = acc + jnp.einsum(
                        "tbmqf,tbmfd->tbmqd",
                        G,
                        c[f"fp{l2}"],
                        preferred_element_type=jnp.float32,
                    )
            return acc

        # chunk tiles through lax.map to bound the G intermediate
        rows_per_tile = Q * M * B
        tc = max(1, min(T, tile_chunk_rows // max(rows_per_tile, 1)))
        n_chunks = -(-T // tc)
        if n_chunks * tc != T:
            pad_t = n_chunks * tc - T
            xs = {
                k: jnp.pad(v, ((0, pad_t),) + ((0, 0),) * (v.ndim - 1))
                for k, v in xs.items()
            }
        if n_chunks == 1:
            acc = tile_fn(xs)
        else:
            xs = {k: v.reshape(n_chunks, tc, *v.shape[1:]) for k, v in xs.items()}
            acc = jax.lax.map(tile_fn, xs).reshape(n_chunks * tc, B, M, Q, D)[:T]

        acc = jnp.moveaxis(acc, 2, 3)  # (T, B, Q, M, D)
        out_l = _untile_queries(acc, nty, ntx, H1, W1, ty, tx)  # (B, H1*W1, M, D)
        out_levels.append(out_l.reshape(B, H1 * W1, M * D).astype(out_dtype))

    return jnp.concatenate(out_levels, axis=1)


def deform_attn_dropped_mass(
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    halo: int = 8,
    block: int = 8,
    tile_sizes: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Attention mass the tiled path drops (corner in-level but out-of-footprint).

    Dense O(samples) diagnostic — no gathers. Returns a scalar: dropped mass as
    a fraction of total attention mass. Use it to size ``halo`` for a given
    checkpoint (run once over a calibration batch).
    """
    _, Lq, M, L, P, _ = sampling_locations.shape
    tiles = list(tile_sizes) if tile_sizes is not None else list(_DEFAULT_TILES[:L])
    while len(tiles) < L:
        tiles.append(max(2, tiles[-1] // 2))
    starts, total = _level_starts(spatial_shapes)
    assert total == Lq

    dropped = 0.0
    total_mass = jnp.sum(attention_weights.astype(jnp.float32))
    for l, (H1, W1) in enumerate(spatial_shapes):
        t = tiles[l]
        ty, tx = min(t, H1), min(t, W1)
        s = starts[l]
        loc_t, nty, ntx = _tile_queries(
            sampling_locations[:, s : s + H1 * W1], H1, W1, ty, tx
        )
        attn_t, _, _ = _tile_queries(
            attention_weights[:, s : s + H1 * W1], H1, W1, ty, tx
        )
        # zero out edge-tile padding queries so they don't count as dropped
        qmask = jnp.ones((1, H1 * W1), jnp.float32)
        qmask_t, _, _ = _tile_queries(qmask, H1, W1, ty, tx)  # (T, 1, Q)
        attn_t = attn_t * qmask_t[:, :, :, None, None, None]
        for l2, (H2, W2) in enumerate(spatial_shapes):
            Hp2, Wp2 = _round_up(H2, block), _round_up(W2, block)
            oys, Fh = _footprint_bounds(H1, ty, nty, H2, Hp2, halo, block)
            oxs, Fw = _footprint_bounds(W1, tx, ntx, W2, Wp2, halo, block)
            T = nty * ntx
            oy = jnp.asarray(np.repeat(np.asarray(oys, np.int32), ntx)).reshape(
                T, 1, 1, 1, 1
            )
            ox = jnp.asarray(np.tile(np.asarray(oxs, np.int32), nty)).reshape(
                T, 1, 1, 1, 1
            )
            x = loc_t[..., l2, :, 0] * W2 - 0.5
            y = loc_t[..., l2, :, 1] * H2 - 0.5
            x0, y0 = jnp.floor(x), jnp.floor(y)
            dx, dy = x - x0, y - y0
            for cy in (0, 1):
                wy = jnp.where(cy == 1, dy, 1.0 - dy)
                yi = y0 + cy
                in_lvl_y = (yi >= 0) & (yi <= H2 - 1)
                in_fp_y = (yi >= oy) & (yi <= oy + Fh - 1)
                for cx in (0, 1):
                    wx = jnp.where(cx == 1, dx, 1.0 - dx)
                    xi = x0 + cx
                    in_lvl = in_lvl_y & (xi >= 0) & (xi <= W2 - 1)
                    in_fp = in_fp_y & (xi >= ox) & (xi <= ox + Fw - 1)
                    w = attn_t[..., l2, :] * wy * wx
                    dropped = dropped + jnp.sum(
                        jnp.where(in_lvl & ~in_fp, w, 0.0).astype(jnp.float32)
                    )
    return dropped / jnp.maximum(total_mass, 1e-12)
