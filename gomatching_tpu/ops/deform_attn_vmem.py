"""Fused VMEM outer-product kernel for tiled encoder deformable attention.

Numerical contract and tiling geometry are exactly ``deform_attn_tiled``
(grid_sample align_corners=False + zero padding resolved within per-tile
footprints; reference oracle ``ms_deform_attn_core_pytorch``,
third_party/adet/layers/ms_deform_attn.py:40-60, and the CUDA kernel it
shadows, third_party/adet/layers/csrc/ms_deform_attn/ms_deform_im2col_cuda
.cuh:238). The bilinear/attention one-hot matrix G never touches HBM, and the
footprint value blocks are windowed straight out of the padded level grids by
the Pallas pipeline — nothing but the per-tile outputs is materialized.

Why this beats both prior forms (docs/PERF_NOTES.md round 3):
  - vs the XLA tiled path: G is ~1.6 GB/layer/batch; its HBM write + matmul
    read-back (~8 ms/layer at B=2) IS the measured "matmul floor". Here G
    lives in a VMEM scratch between the build and the MXU dot. The XLA
    path's footprint extraction (slice+stack, ~16 ms/layer at B=2) is
    replaced by ``pl.Element`` windows at scalar-prefetched per-tile origins
    — the DMA engine reads each footprint directly from the (B, M, Hp, Wp,
    D) grid.
  - vs ``deform_attn_fused`` (the round-2 flat-compare kernel): G is built
    with the outer-product form — two axis one-hots built by iota compares,
    then P fused multiply-accumulates of (Fh, 1, Q) x (1, Fw, Q) slabs —
    O(P*(Fh+Fw)*Q) compare work + O(P*Fh*Fw*Q) FMAs instead of
    O(4*P*Fh*Fw*Q) compare/select chains.

Layout decisions (all shaped by Mosaic lowering rules):
  - Q rides the lane (minor) dimension everywhere; footprint axes ride
    sublanes. Level-0 tiles give Q=256 = 2 full vregs per row.
  - The one-hot builds stay dense (P, F_axis, Q) f32; the (Fh, Q) ->
    (Fh, 1, Q) slab relayout for the outer product is a single f32
    minor-dim insert per (head, level) — f32 inserts lower (bf16 wouldn't).
  - G accumulates in a per-target-level f32 VMEM scratch ref (value-form
    accumulation keeps every unrolled (Fh, Fw, Q) term live on Mosaic's
    VMEM stack).
  - The contraction collapses (Fh, Fw, Q) -> (Fh*Fw, Q) — a MAJOR-dim
    reshape, which lowers (minor-dim reshapes don't) — and runs ONE
    dot_general per target level with K = Fh*Fw in [384, 2304]: deep-K,
    MXU-friendly, unlike per-row (Q, Fw) @ (Fw, D) slivers.
  - All four target levels run in one kernel so tile coords/attention load
    once and the output writes once.
  - Footprint window x-offsets carry ``pl.multiple_of(_, block)`` hints —
    Mosaic must prove sublane-tile divisibility for Element windows on the
    grid's sublane (Wp) dim. The y (Hp) dim is a major dim: offsets are
    arbitrary, so footprint heights are EXACT (tile + 2*halo + 1), not
    block-rounded.

Grid is (T, B) with the head loop inside the kernel by default
(heads_per_step=M): ~560 steps/layer at 1000 px instead of ~4480, so
per-step grid overhead stays off the critical path. ``heads_per_step=1``
recovers the (T, B, M) grid for A/B measurement.
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
    _footprint_bounds,
    _level_starts,
    _pad_level_grids,
    _tile_queries,
    _untile_queries,
)


# vmem-path query tile shapes (ty, tx) per source level: with exact y-extents
# an 8-row tile shrinks the dominant footprint ~25% (Fh = ty + 2*halo + 1)
# while tx=16 keeps Q = 128 = one full lane vector on every level. (Mosaic
# also REQUIRES token-axis blocks of >=128 in the v2 projection-layout
# kernel, so smaller tiles are not an option there.) The coarsest level's
# 16-wide tile spans a 67 x 144 level-0 footprint: at f32 that OOM'd the v1
# kernel's D=32-minor windows (4x lane padding), but v2's natural-layout
# M*D=256-minor windows pack exactly (~10 MB/window) and fit.
_VMEM_TILES = ((8, 16), (8, 16), (8, 16), (8, 16))


def _norm_tiles(tile_sizes, L):
    tiles = list(tile_sizes) if tile_sizes is not None else list(_VMEM_TILES[:L])
    while len(tiles) < L:
        tiles.append(tiles[-1])
    return [(t, t) if isinstance(t, int) else (int(t[0]), int(t[1])) for t in tiles]


def tile_major_perm(
    spatial_shapes: Sequence[Tuple[int, int]],
    tile_sizes: Optional[Sequence[int]] = None,
):
    """Token permutation putting each query tile's tokens contiguous.

    Returns (perm (S_tm,) int32 with 0-filler on edge-tile padding slots,
    level_info list of (start_tm, T, Q, ty, tx, nty, ntx)). Applying ``perm``
    to the token axis turns the costly element-strided tile/transpose prep
    into a row gather + matrix transpose (docs/PERF_NOTES.md round 3).
    """
    L = len(spatial_shapes)
    tiles = _norm_tiles(tile_sizes, L)
    starts, _ = _level_starts(spatial_shapes)
    perm_parts = []
    level_info = []
    pos = 0
    for l, (H1, W1) in enumerate(spatial_shapes):
        ty, tx = tiles[l]
        ty, tx = min(ty, H1), min(tx, W1)
        # keep tx a power of two: the v2 kernel derives query (row, col)
        # from an in-tile iota via // and % tx
        tx = 1 << (tx.bit_length() - 1)
        # Mosaic: the v2 kernels window the tile-major token axis in
        # Q = ty*tx blocks, and TPU lowering requires minor-dim blocks be
        # 128-lane multiples (or span the full axis). Small levels (e.g. the
        # coarsest map of a 736px training crop -> 12x12 -> 8x8 tile = 64
        # tokens) would violate that, so grow the tile ROWS until Q is a
        # lane multiple: rows beyond H1 are filler slots (perm points them
        # at token 0; outputs are dropped by ``tile_major_inverse``).
        if (ty * tx) % 128:
            ty = -(-(ty * tx) // 128) * 128 // tx
        nty, ntx = -(-H1 // ty), -(-W1 // tx)
        idx = np.zeros((nty * ty, ntx * tx), np.int64)
        iy, ix = np.mgrid[0 : nty * ty, 0 : ntx * tx]
        valid = (iy < H1) & (ix < W1)
        idx[valid] = starts[l] + (iy * W1 + ix)[valid]
        idx[~valid] = starts[l]  # filler: any in-range row; outputs are dropped
        tiled = idx.reshape(nty, ty, ntx, tx).transpose(0, 2, 1, 3).reshape(-1)
        perm_parts.append(tiled)
        level_info.append((pos, nty * ntx, ty * tx, ty, tx, nty, ntx))
        pos += tiled.size
    return np.concatenate(perm_parts).astype(np.int32), level_info


def tile_major_inverse(
    spatial_shapes: Sequence[Tuple[int, int]],
    tile_sizes: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """(S,) int32: tile-major position of each natural-order token.

    ``take(out_tm, inv, axis=token)`` drops the edge-tile filler slots and
    restores level-concatenated natural order (inverse of ``tile_major_perm``
    restricted to real tokens)."""
    perm, level_info = tile_major_perm(spatial_shapes, tile_sizes)
    S = sum(h * w for h, w in spatial_shapes)
    inv = np.zeros((S,), np.int64)
    starts, _ = _level_starts(spatial_shapes)
    for l, (H1, W1) in enumerate(spatial_shapes):
        pos, T, Q, ty, tx, nty, ntx = level_info[l]
        iy, ix = np.mgrid[0 : nty * ty, 0 : ntx * tx]
        valid = (iy < H1) & (ix < W1)
        tm_pos = pos + np.arange(T * Q).reshape(nty, ntx, ty, tx).transpose(
            0, 2, 1, 3
        ).reshape(nty * ty, ntx * tx)
        inv[starts[l] + (iy * W1 + ix)[valid]] = tm_pos[valid]
    return inv.astype(np.int32)


def offset_column_perm(M: int, L: int, P: int) -> np.ndarray:
    """Column permutation taking the canonical sampling-offsets feature order
    (m, l, p, xy) to the kernel-v2 row order (l, xy, m, p): new -> old index."""
    return (
        np.arange(M * L * P * 2)
        .reshape(M, L, P, 2)
        .transpose(1, 3, 0, 2)
        .reshape(-1)
        .astype(np.int32)
    )


def attn_column_perm(M: int, L: int, P: int) -> np.ndarray:
    """Canonical attention-weights order (m, l, p) -> kernel-v2 order (l, m, p)."""
    return (
        np.arange(M * L * P).reshape(M, L, P).transpose(1, 0, 2).reshape(-1).astype(np.int32)
    )


def pad_level_grids_natural(value, spatial_shapes, block):
    """(B, S, M, D) -> list of (B, Hp, Wp, M*D) zero-padded level grids.

    Natural channel-minor layout: pure reshape + pad — no head-major transpose
    (the XLA relayout that cost ~3.6 ms/layer in the (B, M, Hp, Wp, D) form).
    The M*D=256-lane minor dim also packs VMEM windows exactly, where the
    D=32-minor form padded every window 4x (the round-3 f32 VMEM OOM)."""
    B, S, M, D = value.shape
    starts, total = _level_starts(spatial_shapes)
    assert total == S
    grids = []
    for (h, w), s in zip(spatial_shapes, starts):
        g = value[:, s : s + h * w].reshape(B, h, w, M * D)
        hp, wp = -(-h // block) * block, -(-w // block) * block
        g = jnp.pad(g, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        grids.append(g)
    return grids


def _accum_onehot_g(g_ref, x, y, a, Fh, Fw, P, Q, ablate=frozenset()):
    """Build the bilinear/attention one-hot G into the ``g_ref`` VMEM scratch
    via the outer-product form (shared by every fused sampler kernel).

    x/y: (P, Q) f32 sampling coords LOCAL to the (Fh, Fw) footprint; a:
    (P, Q) softmaxed attention. G[ky, kx, q] = sum_p a_p * wy_p(ky) * wx_p(kx)
    with wy/wx the 2-tap bilinear one-hots (iota compare against floor/ceil).
    Out-of-footprint corners contribute nothing (zero-padding / halo-drop
    semantics are decided by the caller's footprint geometry).
    """
    if "gbuild" in ablate:  # timing ablation: skip the one-hot build
        g_ref[...] = jnp.full((Fh, Fw, Q), x[0, 0], jnp.float32)
        return
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0).reshape(P, 1, Q)
    dy = (y - y0).reshape(P, 1, Q)
    xi = x0.astype(jnp.int32).reshape(P, 1, Q)
    yi = y0.astype(jnp.int32).reshape(P, 1, Q)
    ix = jax.lax.broadcasted_iota(jnp.int32, (P, Fw, Q), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (P, Fh, Q), 1)
    xw = jnp.where(ix == xi, 1.0 - dx, 0.0) + jnp.where(ix == xi + 1, dx, 0.0)
    yw = jnp.where(iy == yi, 1.0 - dy, 0.0) + jnp.where(iy == yi + 1, dy, 0.0)
    yw = yw * a.reshape(P, 1, Q)
    yw4 = yw.reshape(P, Fh, 1, Q)  # f32 minor-dim insert: one relayout
    for p in range(P):
        term = yw4[p] * xw[p].reshape(1, Fw, Q)
        if p == 0:
            g_ref[...] = term
        else:
            g_ref[...] += term


def _onehot_rows(v, F, P, Q):
    """Bilinear one-hot rows along one axis: (P, Q) coords -> weights
    (P, F, Q) and their exact coordinate derivatives (P, F, Q). Shared by the
    fused backward kernels (the one-hot pieces ``_accum_onehot_g`` folds)."""
    v0 = jnp.floor(v)
    dv = (v - v0).reshape(P, 1, Q)
    vi = v0.astype(jnp.int32).reshape(P, 1, Q)
    ii = jax.lax.broadcasted_iota(jnp.int32, (P, F, Q), 1)
    lo = (ii == vi).astype(jnp.float32)
    hi = (ii == vi + 1).astype(jnp.float32)
    w = lo * (1.0 - dv) + hi * dv
    dw = hi - lo  # d w / d coord
    return w, dw


def _kernel_v2(
    org_ref, off_ref, attn_ref, *refs, geom, scales, tile_info, M, L, P, Q,
    D, out_dtype, ablate=frozenset(),
):
    """One (tile, batch) step of the projection-layout encoder kernel.

    refs = [fp_0..fp_{L-1}, out, g_0..g_{L-1}, acc]. Blocks (squeezed):
      off (2*L*M*P, Q) f32 raw sampling offsets in TARGET-level cells,
        rows ordered (l2, xy, m, p) — the order ``offset_column_perm`` emits;
      attn (L*M*P, Q) f32 softmaxed weights, rows ordered (l2, m, p);
      fp_l (1, Fh, Fw, M*D) natural-layout footprint window; out (1, Q, M*D);
      g_l (Fh, Fw, Q) f32 scratch; acc (Q, M*D) f32 scratch.

    Reference x/y coordinates are derived in-kernel from the tile-affine
    query iota (queries are grid tokens), so no location tensor is ever
    materialized in HBM. Per (head, target-level) the one-hot G contracts
    against the FULL-head window (K, M*D) on the MXU — 8x the minimal flops
    but at full 256-lane MXU utilization (vs 32/128 lanes for a (K, D) dot)
    — and a head-column mask selects the head's slice on accumulation.
    """
    ty, tx, ntx = tile_info
    t = pl.program_id(0)
    ty0 = (t // ntx) * ty
    tx0 = (t % ntx) * tx
    nlev = len(geom)  # geom: [(l2, Fh, Fw)] — may be a subset under ablation
    fp_refs = refs[:nlev]
    out_ref = refs[nlev]
    g_refs = refs[nlev + 1 : nlev + 1 + nlev]
    acc_ref = refs[-1]

    # query grid coords within the source level, Q on lanes
    qi = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)
    row = (qi // tx).astype(jnp.float32)
    col = (qi % tx).astype(jnp.float32)

    for m in range(M):
        accm = None
        for j, (l2, Fh, Fw) in enumerate(geom):
            sy, sx = scales[j]
            oy = org_ref[l2, t]
            ox = org_ref[L + l2, t]
            xb = ((l2 * 2 + 0) * M + m) * P
            yb = ((l2 * 2 + 1) * M + m) * P
            ab = (l2 * M + m) * P
            gx = (tx0 + 0.5) * sx - 0.5 + col * sx  # (1, Q)
            gy = (ty0 + 0.5) * sy - 0.5 + row * sy
            x = gx - ox.astype(jnp.float32) + off_ref[xb : xb + P]  # (P, Q)
            y = gy - oy.astype(jnp.float32) + off_ref[yb : yb + P]
            a = attn_ref[ab : ab + P]
            g = g_refs[j]
            _accum_onehot_g(g, x, y, a, Fh, Fw, P, Q, ablate)
            G = g[...].reshape(Fh * Fw, Q).astype(out_dtype)
            Vfull = fp_refs[j][0].reshape(Fh * Fw, M * D)
            V = Vfull if "widedot" in ablate else Vfull[:, m * D : (m + 1) * D]
            if "dot" in ablate:  # timing ablation: skip the MXU contraction
                U = (
                    g[0, 0, 0] + Vfull[0].astype(jnp.float32)
                ).reshape(1, M * D) * jnp.ones((Q, 1), jnp.float32)
            else:
                U = jax.lax.dot_general(
                    G, V, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )  # (Q, D) per-head — (Q, M*D) under the widedot ablation
            accm = U if accm is None else accm + U
        if "widedot" in ablate or "dot" in ablate:
            mask = (
                jax.lax.broadcasted_iota(jnp.int32, (1, M * D), 1) // D == m
            ).astype(jnp.float32)
            if m == 0:
                acc_ref[...] = accm * mask
            else:
                acc_ref[...] += accm * mask
        else:
            # per-head (K, D) dot (production): half the MXU tile-ops of the
            # full-width form, landed by a static lane-slice store (identical
            # numerics; measured 8.2 -> 7.7 ms/layer)
            acc_ref[:, m * D : (m + 1) * D] = accm
    out_ref[...] = acc_ref[...].astype(out_dtype)


def _v2_impl(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    offT: jnp.ndarray,
    attnT: jnp.ndarray,
    halo: int = 8,
    block: int = 8,
    tile_sizes: Optional[Sequence[int]] = None,
    interpret: bool = False,
    ablate: frozenset = frozenset(),  # timing-only: {"gbuild", "dot"}
) -> jnp.ndarray:
    """Projection-layout fused encoder kernel (kernel v2) — forward body.

    Args:
      value: (B, S, M, D) level-concatenated per-head values, natural order.
      offT: (B, 2*L*M*P, S_tm) f32 RAW sampling offsets in target-level cells
        on the tile-major token axis, rows ordered (l2, xy, m, p) — exactly
        what the transposed offsets projection emits after
        ``offset_column_perm`` (reference keeps offsets in cell units:
        loc*W2 = ref*W2 + off, ms_deform_attn.py:134-139).
      attnT: (B, L*M*P, S_tm) f32 softmaxed attention, rows (l2, m, p).

    Returns (B, S_tm, M*D) in TILE-MAJOR token order (edge-tile filler slots
    hold garbage; drop them with ``tile_major_inverse``).

    vs ``ms_deform_attn_encoder_vmem_tm``: no location/attention relayout at
    all (blocks window the projection outputs directly), natural-layout value
    grids (no head transpose), and the output is born token-major for the
    output projection. Same numerical contract (exact within ``halo``).
    """
    B, S, M, D = value.shape
    F2 = offT.shape[1]
    L = len(spatial_shapes)
    P = F2 // (2 * L * M)
    assert F2 == 2 * L * M * P and attnT.shape[1] == L * M * P
    S_tm = offT.shape[2]
    out_dtype = value.dtype
    tiles = _norm_tiles(tile_sizes, L)

    grids = pad_level_grids_natural(value, spatial_shapes, block)
    _, level_info = tile_major_perm(spatial_shapes, tiles)
    assert level_info[-1][0] + level_info[-1][1] * level_info[-1][2] == S_tm

    out_levels: List[jnp.ndarray] = []
    for l, (H1, W1) in enumerate(spatial_shapes):
        s_tm, T, Q, ty, tx, nty, ntx = level_info[l]
        assert tx & (tx - 1) == 0, "in-kernel query iota needs power-of-two tx"
        # ONE geometry source for the custom-VJP pair: the backward
        # (_v2_bwd_impl) derives its footprints from the same helper, so a
        # forward geometry change cannot silently desynchronize the gradients
        geom, scales, org_np, _, _ = _v2_level_geometry(
            spatial_shapes, grids, level_info, l, halo, block, ablate=ablate
        )
        org = jnp.asarray(org_np)

        def fp_spec(l2, Fh, Fw):
            def idx(t_, b_, org_ref):
                if "fixorg" in ablate:  # timing ablation: static (0,0) windows
                    return (b_, 0, 0, 0)
                return (
                    b_,
                    org_ref[l2, t_],
                    pl.multiple_of(org_ref[L + l2, t_], block),
                    0,
                )

            return pl.BlockSpec(
                (pl.Element(1), pl.Element(Fh), pl.Element(Fw), pl.Element(M * D)),
                idx,
            )

        if s_tm % Q == 0:
            # production shapes: window the full tile-major arrays in place
            off_l, attn_l, qblk = offT, attnT, s_tm // Q
        else:
            # tiny/test shapes with mixed per-level Q: one static minor-axis
            # slice per level keeps the block index aligned
            off_l = jax.lax.slice_in_dim(offT, s_tm, s_tm + T * Q, axis=2)
            attn_l = jax.lax.slice_in_dim(attnT, s_tm, s_tm + T * Q, axis=2)
            qblk = 0
        off_spec = pl.BlockSpec(
            (None, F2, Q), lambda t_, b_, org_ref, qb=qblk: (b_, 0, qb + t_)
        )
        attn_spec = pl.BlockSpec(
            (None, L * M * P, Q), lambda t_, b_, org_ref, qb=qblk: (b_, 0, qb + t_)
        )
        out_spec = pl.BlockSpec(
            (None, Q, M * D), lambda t_, b_, org_ref: (b_, t_, 0)
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T, B),
            in_specs=[off_spec, attn_spec]
            + [fp_spec(l2, fh, fw) for l2, fh, fw in geom],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((fh, fw, Q), jnp.float32) for _, fh, fw in geom]
            + [pltpu.VMEM((Q, M * D), jnp.float32)],
        )
        kern = functools.partial(
            _kernel_v2, geom=geom, scales=scales, tile_info=(ty, tx, ntx),
            M=M, L=L, P=P, Q=Q, D=D, out_dtype=out_dtype, ablate=ablate,
        )
        out_levels.append(
            pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((B, T * Q, M * D), out_dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
                interpret=interpret,
            )(org, off_l, attn_l, *[grids[l2].astype(out_dtype) for l2, _, _ in geom])
        )

    return jnp.concatenate(out_levels, axis=1)


def _v2_level_geometry(spatial_shapes, grids, level_info, l, halo, block,
                       ablate=frozenset()):
    """Per-source-level footprint geometry shared by the fwd/bwd kernels:
    (geom [(l2, Fh, Fw)], scales, org (2L, T) int array, oy/ox per level)."""
    L = len(spatial_shapes)
    H1, W1 = spatial_shapes[l]
    s_tm, T, Q, ty, tx, nty, ntx = level_info[l]
    geom: List[Tuple[int, int, int]] = []
    scales: List[Tuple[float, float]] = []
    oy_np = np.zeros((L, T), np.int32)
    ox_np = np.zeros((L, T), np.int32)
    for l2, (H2, W2) in enumerate(spatial_shapes):
        if "samelvl" in ablate and l2 != l:  # timing-only ablation
            continue
        Hp2, Wp2 = grids[l2].shape[1], grids[l2].shape[2]
        oys, Fh = _footprint_bounds(H1, ty, nty, H2, Hp2, halo, 1)
        oxs, Fw = _footprint_bounds(W1, tx, ntx, W2, Wp2, halo, block)
        # Mosaic window constraint: the minor-1 (Fw) window dim must be a
        # multiple of 8 or the full padded extent, regardless of `block`
        # (growing F only widens coverage; origins stay block-aligned).
        if Fw % 8 and Fw != Wp2:
            Fw = min(-(-Fw // 8) * 8, Wp2)
            oxs = [max(0, min(o, ((Wp2 - Fw) // block) * block)) for o in oxs]
        geom.append((l2, Fh, Fw))
        scales.append((H2 / H1, W2 / W1))
        oy_np[l2] = np.repeat(np.asarray(oys, np.int32), ntx)
        ox_np[l2] = np.tile(np.asarray(oxs, np.int32), nty)
    org = np.stack([oy_np, ox_np], axis=0).reshape(2 * L, T)
    return geom, scales, org, oy_np, ox_np


def _bwd_kernel_v2(
    org_ref, off_ref, attn_ref, do_ref, *refs, geom, scales, tile_info,
    M, L, P, Q, D,
):
    """One (tile, batch) backward step of the projection-layout kernel.

    refs = [fp_0..fp_{n-1}, doff, dattn, dslab_0..dslab_{n-1}, g_0.., dg_0..].
    Blocks (squeezed): off (2LMP, Q) / attn (LMP, Q) f32 as the forward;
    do (Q, M*D); fp_j (1, Fh, Fw, M*D) Element window; doff (2LMP, Q) f32;
    dattn (LMP, Q) f32; dslab_j (Fh, Fw, M*D) f32 — this tile's dV slab,
    overlap-added into the level grids by the caller; g_j / dg_j
    (Fh, Fw, Q) f32 scratch.
    """
    ty, tx, ntx = tile_info
    t = pl.program_id(0)
    ty0 = (t // ntx) * ty
    tx0 = (t % ntx) * tx
    nlev = len(geom)
    fp_refs = refs[:nlev]
    doff_ref = refs[nlev]
    dattn_ref = refs[nlev + 1]
    dslab_refs = refs[nlev + 2 : nlev + 2 + nlev]
    g_refs = refs[nlev + 2 + nlev : nlev + 2 + 2 * nlev]
    dg_refs = refs[nlev + 2 + 2 * nlev :]

    qi = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)
    row = (qi // tx).astype(jnp.float32)
    col = (qi % tx).astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)  # (Q, M*D)

    for m in range(M):
        do_m = do[:, m * D : (m + 1) * D]
        for j, (l2, Fh, Fw) in enumerate(geom):
            sy, sx = scales[j]
            oy = org_ref[l2, t]
            ox = org_ref[L + l2, t]
            xb = ((l2 * 2 + 0) * M + m) * P
            yb = ((l2 * 2 + 1) * M + m) * P
            ab = (l2 * M + m) * P
            gx = (tx0 + 0.5) * sx - 0.5 + col * sx  # (1, Q)
            gy = (ty0 + 0.5) * sy - 0.5 + row * sy
            x = gx - ox.astype(jnp.float32) + off_ref[xb : xb + P]  # (P, Q)
            y = gy - oy.astype(jnp.float32) + off_ref[yb : yb + P]
            a = attn_ref[ab : ab + P]
            g = g_refs[j]
            _accum_onehot_g(g, x, y, a, Fh, Fw, P, Q)
            # this head's dV slab slice: (K, Q) x (Q, D) MXU dot
            contrib = jax.lax.dot_general(
                g[...].reshape(Fh * Fw, Q),
                do_m,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dslab_refs[j][:, :, m * D : (m + 1) * D] = contrib.reshape(Fh, Fw, D)
            # dG = V @ dO_m^T, staged through a scratch ref
            V = fp_refs[j][0].reshape(Fh * Fw, M * D)[:, m * D : (m + 1) * D]
            dg_refs[j][...] = jax.lax.dot_general(
                V.astype(jnp.float32),
                do_m,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(Fh, Fw, Q)

            xw, dxw = _onehot_rows(x, Fw, P, Q)
            yw, dyw = _onehot_rows(y, Fh, P, Q)
            dgv = dg_refs[j][...]
            for p in range(P):
                r = jnp.sum(yw[p].reshape(Fh, 1, Q) * dgv, axis=0)  # (Fw, Q)
                s = jnp.sum(xw[p].reshape(1, Fw, Q) * dgv, axis=1)  # (Fh, Q)
                dattn_ref[ab + p] = jnp.sum(xw[p] * r, axis=0)
                # offsets are in target-level cells: x = gx - ox + off, so
                # d off == d x directly
                doff_ref[xb + p] = a[p] * jnp.sum(dxw[p] * r, axis=0)
                doff_ref[yb + p] = a[p] * jnp.sum(dyw[p] * s, axis=0)


def _v2_bwd_impl(spatial_shapes, halo, block, tile_sizes, interpret,
                 value, offT, attnT, dout):
    """Backward of ``_v2_impl``: per-tile fused kernel -> (dOffT, dAttnT,
    per-tile dV slabs), then a static-index overlap-add of the slabs into the
    padded level grids (tiles' footprints overlap by the halo, so the scatter
    runs in XLA where accumulation order is free)."""
    B, S, M, D = value.shape
    F2 = offT.shape[1]
    L = len(spatial_shapes)
    P = F2 // (2 * L * M)
    S_tm = offT.shape[2]
    tiles = _norm_tiles(tile_sizes, L)

    grids = pad_level_grids_natural(value, spatial_shapes, block)
    _, level_info = tile_major_perm(spatial_shapes, tiles)

    dgrid = [
        jnp.zeros((B, g.shape[1] * g.shape[2], M * D), jnp.float32) for g in grids
    ]
    doff_parts: List[jnp.ndarray] = []
    dattn_parts: List[jnp.ndarray] = []
    for l in range(L):
        s_tm, T, Q, ty, tx, nty, ntx = level_info[l]
        geom, scales, org, oy_np, ox_np = _v2_level_geometry(
            spatial_shapes, grids, level_info, l, halo, block
        )
        off_l = jax.lax.slice_in_dim(offT, s_tm, s_tm + T * Q, axis=2)
        attn_l = jax.lax.slice_in_dim(attnT, s_tm, s_tm + T * Q, axis=2)
        do_l = jax.lax.slice_in_dim(dout, s_tm, s_tm + T * Q, axis=1)

        def fp_spec(l2, Fh, Fw):
            def idx(t_, b_, org_ref):
                return (
                    b_,
                    org_ref[l2, t_],
                    pl.multiple_of(org_ref[L + l2, t_], block),
                    0,
                )

            return pl.BlockSpec(
                (pl.Element(1), pl.Element(Fh), pl.Element(Fw), pl.Element(M * D)),
                idx,
            )

        off_spec = pl.BlockSpec((None, F2, Q), lambda t_, b_, org_ref: (b_, 0, t_))
        attn_spec = pl.BlockSpec(
            (None, L * M * P, Q), lambda t_, b_, org_ref: (b_, 0, t_)
        )
        do_spec = pl.BlockSpec((None, Q, M * D), lambda t_, b_, org_ref: (b_, t_, 0))
        slab_specs = [
            pl.BlockSpec(
                (None, None, fh, fw, M * D),
                lambda t_, b_, org_ref: (b_, t_, 0, 0, 0),
            )
            for _, fh, fw in geom
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T, B),
            in_specs=[off_spec, attn_spec, do_spec]
            + [fp_spec(l2, fh, fw) for l2, fh, fw in geom],
            out_specs=[off_spec, attn_spec] + slab_specs,
            scratch_shapes=[pltpu.VMEM((fh, fw, Q), jnp.float32) for _, fh, fw in geom]
            + [pltpu.VMEM((fh, fw, Q), jnp.float32) for _, fh, fw in geom],
        )
        kern = functools.partial(
            _bwd_kernel_v2, geom=geom, scales=scales, tile_info=(ty, tx, ntx),
            M=M, L=L, P=P, Q=Q, D=D,
        )
        outs = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, F2, T * Q), jnp.float32),
                jax.ShapeDtypeStruct((B, L * M * P, T * Q), jnp.float32),
            ]
            + [
                jax.ShapeDtypeStruct((B, T, fh, fw, M * D), jnp.float32)
                for _, fh, fw in geom
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            jnp.asarray(org),
            off_l.astype(jnp.float32),
            attn_l.astype(jnp.float32),
            do_l,
            *[grids[l2].astype(jnp.float32) for l2, _, _ in geom],
        )
        doff_parts.append(outs[0])
        dattn_parts.append(outs[1])
        # overlap-add each target level's slabs at their static origins
        for j, (l2, Fh, Fw) in enumerate(geom):
            Wp2 = grids[l2].shape[2]
            oy = oy_np[l2].astype(np.int64)  # (T,)
            ox = ox_np[l2].astype(np.int64)
            fy = np.arange(Fh, dtype=np.int64)
            fx = np.arange(Fw, dtype=np.int64)
            flat = (
                (oy[:, None, None] + fy[None, :, None]) * Wp2
                + (ox[:, None, None] + fx[None, None, :])
            ).reshape(-1)
            dgrid[l2] = dgrid[l2].at[:, jnp.asarray(flat)].add(
                outs[2 + j].reshape(B, -1, M * D)
            )

    dOffT = jnp.concatenate(doff_parts, axis=2).astype(offT.dtype)
    dAttnT = jnp.concatenate(dattn_parts, axis=2).astype(attnT.dtype)

    dval_levels = []
    for (h, w), g, d in zip(spatial_shapes, grids, dgrid):
        hp, wp = g.shape[1], g.shape[2]
        dl = d.reshape(B, hp, wp, M * D)[:, :h, :w]
        dval_levels.append(dl.reshape(B, h * w, M, D))
    dvalue = jnp.concatenate(dval_levels, axis=1).astype(value.dtype)
    return dvalue, dOffT, dAttnT


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _v2_op(spatial_shapes, halo, block, tile_sizes, interpret,
           value, offT, attnT):
    return _v2_impl(value, spatial_shapes, offT, attnT, halo=halo, block=block,
                    tile_sizes=tile_sizes, interpret=interpret)


def _v2_op_fwd(spatial_shapes, halo, block, tile_sizes, interpret,
               value, offT, attnT):
    out = _v2_impl(value, spatial_shapes, offT, attnT, halo=halo, block=block,
                   tile_sizes=tile_sizes, interpret=interpret)
    return out, (value, offT, attnT)


def _v2_op_bwd(spatial_shapes, halo, block, tile_sizes, interpret, res, dout):
    value, offT, attnT = res
    return _v2_bwd_impl(spatial_shapes, halo, block, tile_sizes, interpret,
                        value, offT, attnT, dout.astype(jnp.float32))


_v2_op.defvjp(_v2_op_fwd, _v2_op_bwd)


def ms_deform_attn_encoder_vmem_v2(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    offT: jnp.ndarray,
    attnT: jnp.ndarray,
    halo: int = 8,
    block: int = 8,
    tile_sizes: Optional[Sequence[int]] = None,
    interpret: bool = False,
    ablate: frozenset = frozenset(),  # timing-only: {"gbuild", "dot"}
) -> jnp.ndarray:
    """Projection-layout fused encoder kernel (kernel v2), differentiable.

    See ``_v2_impl`` for the forward design and argument contract; the op
    carries a ``jax.custom_vjp`` whose backward is ``_bwd_kernel_v2`` (fused
    per-tile dV/dOff/dAttn) plus a static-index overlap-add of the dV slabs —
    the TPU analogue of the reference CUDA col2im backwards
    (ms_deform_im2col_cuda.cuh:302,:407,:514). Gradient parity vs the
    differentiable tiled/gather paths: tests/test_deform_attn_grads.py.
    Timing ablations bypass the VJP wrapper (forward only).
    """
    if ablate:
        return _v2_impl(value, spatial_shapes, offT, attnT, halo=halo,
                        block=block, tile_sizes=tile_sizes,
                        interpret=interpret, ablate=ablate)
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    tiles = tuple(
        (int(t[0]), int(t[1])) for t in _norm_tiles(tile_sizes, len(shapes))
    )
    return _v2_op(shapes, halo, block, tiles, interpret, value, offT, attnT)


def _kernel_v3(
    org_ref, off_ref, attn_ref, *refs, geom, scales, tile_info, M, L, P, Q,
    D, block, out_dtype, ablate=frozenset(),
):
    """One (batch, tile) step of the RESIDENT-GRID encoder kernel (v3).

    refs = [fp_0..fp_{nlev-1}, out, g_0.., acc]. Blocks (squeezed):
      off/attn/out/g/acc as in ``_kernel_v2``;
      fp_j (Hp_j, Wp_j, M*D): the ENTIRE padded level grid for target level
        geom[j][0], at a CONSTANT block index — the Pallas pipeline fetches
        it once per batch sweep and skips the copy on every further step
        (grid is (B, T) with tiles innermost), so footprints cost ZERO
        repeated HBM traffic; the kernel dynamic-slices the resident block.
        v2's per-tile Element windows re-shipped overlapping footprints every
        step — measured ~4 ms/layer of DMA against ~0.7 ms of unique bytes.
    """
    ty, tx, ntx = tile_info
    t = pl.program_id(1)
    ty0 = (t // ntx) * ty
    tx0 = (t % ntx) * tx
    nlev = len(geom)
    fp_refs = refs[:nlev]
    out_ref = refs[nlev]
    g_refs = refs[nlev + 1 : nlev + 1 + nlev]
    acc_ref = refs[-1]

    qi = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1)
    row = (qi // tx).astype(jnp.float32)
    col = (qi % tx).astype(jnp.float32)

    for m in range(M):
        accm = None
        for j, (l2, Fh, Fw) in enumerate(geom):
            sy, sx = scales[j]
            oy = org_ref[l2, t]
            ox = org_ref[L + l2, t]
            xb = ((l2 * 2 + 0) * M + m) * P
            yb = ((l2 * 2 + 1) * M + m) * P
            ab = (l2 * M + m) * P
            gx = (tx0 + 0.5) * sx - 0.5 + col * sx  # (1, Q)
            gy = (ty0 + 0.5) * sy - 0.5 + row * sy
            x = gx - ox.astype(jnp.float32) + off_ref[xb : xb + P]  # (P, Q)
            y = gy - oy.astype(jnp.float32) + off_ref[yb : yb + P]
            a = attn_ref[ab : ab + P]
            g = g_refs[j]
            _accum_onehot_g(g, x, y, a, Fh, Fw, P, Q, ablate)
            G = g[...].reshape(Fh * Fw, Q).astype(out_dtype)
            V = fp_refs[j][
                pl.ds(oy, Fh), pl.ds(pl.multiple_of(ox, block), Fw), :
            ].reshape(Fh * Fw, M * D)
            if "dot" in ablate:  # timing ablation: skip the MXU contraction
                U = (
                    g[0, 0, 0] + V[0].astype(jnp.float32)
                ).reshape(1, M * D) * jnp.ones((Q, 1), jnp.float32)
            else:
                U = jax.lax.dot_general(
                    G, V, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )  # (Q, M*D)
            accm = U if accm is None else accm + U
        mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, M * D), 1) // D == m
        ).astype(jnp.float32)
        if m == 0:
            acc_ref[...] = accm * mask
        else:
            acc_ref[...] += accm * mask
    out_ref[...] = acc_ref[...].astype(out_dtype)


def ms_deform_attn_encoder_vmem_v3(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    offT: jnp.ndarray,
    attnT: jnp.ndarray,
    halo: int = 8,
    block: int = 8,
    tile_sizes: Optional[Sequence[int]] = None,
    interpret: bool = False,
    ablate: frozenset = frozenset(),
) -> jnp.ndarray:
    """Resident-grid projection-layout encoder kernel (v3).

    Same contract and arguments as ``ms_deform_attn_encoder_vmem_v2``; the
    difference is purely mechanical: every target level's FULL padded grid
    stays resident in VMEM across a batch sweep (constant block index, grid
    (B, T) with tiles innermost) and footprints are in-kernel dynamic slices
    of it — all four levels sum to ~20 MB bf16 at 1000 px, far under the
    128 MB v5e VMEM, and the per-tile window re-DMA (~60% overlapping bytes)
    disappears.
    """
    B, S, M, D = value.shape
    F2 = offT.shape[1]
    L = len(spatial_shapes)
    P = F2 // (2 * L * M)
    assert F2 == 2 * L * M * P and attnT.shape[1] == L * M * P
    S_tm = offT.shape[2]
    out_dtype = value.dtype
    tiles = _norm_tiles(tile_sizes, L)

    grids = pad_level_grids_natural(value, spatial_shapes, block)
    _, level_info = tile_major_perm(spatial_shapes, tiles)
    assert level_info[-1][0] + level_info[-1][1] * level_info[-1][2] == S_tm

    out_levels: List[jnp.ndarray] = []
    for l, (H1, W1) in enumerate(spatial_shapes):
        s_tm, T, Q, ty, tx, nty, ntx = level_info[l]
        assert tx & (tx - 1) == 0, "in-kernel query iota needs power-of-two tx"
        geom: List[Tuple[int, int, int]] = []
        scales: List[Tuple[float, float]] = []
        oy_np = np.zeros((L, T), np.int32)
        ox_np = np.zeros((L, T), np.int32)
        for l2, (H2, W2) in enumerate(spatial_shapes):
            if "samelvl" in ablate and l2 != l:  # timing-only ablation
                continue
            Hp2, Wp2 = grids[l2].shape[1], grids[l2].shape[2]
            oys, Fh = _footprint_bounds(H1, ty, nty, H2, Hp2, halo, 1)
            oxs, Fw = _footprint_bounds(W1, tx, ntx, W2, Wp2, halo, block)
            geom.append((l2, Fh, Fw))
            scales.append((H2 / H1, W2 / W1))
            oy_np[l2] = np.repeat(np.asarray(oys, np.int32), ntx)
            ox_np[l2] = np.tile(np.asarray(oxs, np.int32), nty)
        org = jnp.asarray(np.stack([oy_np, ox_np], axis=0).reshape(2 * L, T))

        def fp_spec(l2):
            Hp2, Wp2 = grids[l2].shape[1], grids[l2].shape[2]
            return pl.BlockSpec(
                (None, Hp2, Wp2, M * D), lambda b_, t_, org_ref: (b_, 0, 0, 0)
            )

        if s_tm % Q == 0:
            off_l, attn_l, qblk = offT, attnT, s_tm // Q
        else:
            off_l = jax.lax.slice_in_dim(offT, s_tm, s_tm + T * Q, axis=2)
            attn_l = jax.lax.slice_in_dim(attnT, s_tm, s_tm + T * Q, axis=2)
            qblk = 0
        off_spec = pl.BlockSpec(
            (None, F2, Q), lambda b_, t_, org_ref, qb=qblk: (b_, 0, qb + t_)
        )
        attn_spec = pl.BlockSpec(
            (None, L * M * P, Q), lambda b_, t_, org_ref, qb=qblk: (b_, 0, qb + t_)
        )
        out_spec = pl.BlockSpec(
            (None, Q, M * D), lambda b_, t_, org_ref: (b_, t_, 0)
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, T),
            in_specs=[off_spec, attn_spec] + [fp_spec(l2) for l2, _, _ in geom],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((fh, fw, Q), jnp.float32) for _, fh, fw in geom]
            + [pltpu.VMEM((Q, M * D), jnp.float32)],
        )
        kern = functools.partial(
            _kernel_v3, geom=geom, scales=scales, tile_info=(ty, tx, ntx),
            M=M, L=L, P=P, Q=Q, D=D, block=block, out_dtype=out_dtype,
            ablate=ablate,
        )
        out_levels.append(
            pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((B, T * Q, M * D), out_dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024
                ),
                interpret=interpret,
            )(org, off_l, attn_l, *[grids[l2].astype(out_dtype) for l2, _, _ in geom])
        )

    return jnp.concatenate(out_levels, axis=1)


def _kernel(org_ref, x_ref, y_ref, a_ref, *refs, geom, Mb, P, Q, D, out_dtype):
    """One (tile, batch) step: for each head, build G per target level in a
    VMEM scratch via the outer-product one-hot form and contract on the MXU.

    refs = [fp_0..fp_{L-1}, out, g_0..g_{L-1}]. Block shapes (squeezed):
      x/y/a (L, Mb, P, Q) f32 local target-level coords / attention weights;
      fp_l (1, Mb, Fh, Fw, D) Element-windowed grid block; out (Mb, Q, D);
      g_l (Fh, Fw, Q) f32 scratch. ``org_ref`` is the scalar-prefetch origin
      table, only consumed by the index maps.
    """
    L = len(geom)
    fp_refs = refs[:L]
    out_ref = refs[L]
    g_refs = refs[L + 1 :]

    for m in range(Mb):
        acc = jnp.zeros((Q, D), jnp.float32)
        for l2, (Fh, Fw) in enumerate(geom):
            x = x_ref[l2, m]  # (P, Q) local float coords
            y = y_ref[l2, m]
            a = a_ref[l2, m]
            # the G build stays f32: a bf16 scratch/build measured SLOWER
            # (23.0 vs 19.2 ms/layer) — Mosaic adds conversions, no packing
            g = g_refs[l2]
            _accum_onehot_g(g, x, y, a, Fh, Fw, P, Q)
            G = g[...].reshape(Fh * Fw, Q).astype(out_dtype)  # major collapse
            V = fp_refs[l2][0, m].reshape(Fh * Fw, D)
            acc = acc + jax.lax.dot_general(
                G,
                V,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[m] = acc.astype(out_dtype)


def ms_deform_attn_encoder_vmem(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    halo: int = 8,
    block: int = 8,
    tile_sizes: Optional[Sequence[int]] = None,
    heads_per_step: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in equivalent of ``ms_deform_attn_encoder_tiled`` backed by the
    fused VMEM outer-product kernel. Same arguments/contract (see that
    docstring); ``heads_per_step`` folds that many heads into one grid step
    (0 = all M heads)."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert Lq == S, "vmem path requires queries == tokens (encoder self-attn)"
    out_dtype = value.dtype
    tiles = _norm_tiles(tile_sizes, L)
    Mb = M if heads_per_step in (0, M) else heads_per_step
    assert M % Mb == 0
    Mg = M // Mb

    grids = _pad_level_grids(value, spatial_shapes, block)
    starts, _ = _level_starts(spatial_shapes)

    out_levels: List[jnp.ndarray] = []
    for l, (H1, W1) in enumerate(spatial_shapes):
        ty, tx = tiles[l]
        ty, tx = min(ty, H1), min(tx, W1)
        s = starts[l]
        loc_t, nty, ntx = _tile_queries(
            sampling_locations[:, s : s + H1 * W1], H1, W1, ty, tx
        )  # (T, B, Q, M, L, P, 2)
        attn_t, _, _ = _tile_queries(
            attention_weights[:, s : s + H1 * W1], H1, W1, ty, tx
        )  # (T, B, Q, M, L, P)
        T, _, Q = loc_t.shape[:3]

        # static footprint geometry + per-tile origins (block-aligned)
        geom: List[Tuple[int, int]] = []
        oy_np = np.zeros((L, T), np.int32)
        ox_np = np.zeros((L, T), np.int32)
        for l2, (H2, W2) in enumerate(spatial_shapes):
            Hp2, Wp2 = grids[l2].shape[2], grids[l2].shape[3]
            # y rides a MAJOR dim of the grid block — Element offsets there
            # need no sublane-divisibility proof, so the footprint height is
            # exact (tile + 2*halo + 1) instead of block-rounded
            oys, Fh = _footprint_bounds(H1, ty, nty, H2, Hp2, halo, 1)
            oxs, Fw = _footprint_bounds(W1, tx, ntx, W2, Wp2, halo, block)
            geom.append((Fh, Fw))
            oy_np[l2] = np.repeat(np.asarray(oys, np.int32), ntx)
            ox_np[l2] = np.tile(np.asarray(oxs, np.int32), nty)

        # local target-level coords + attention, Q on the minor axis:
        # ONE transpose each for loc/attn, then one fused elementwise pass
        # (the per-target-level slice+transpose+stack form cost ~6 ms/layer)
        wh = np.asarray([[w2, h2] for h2, w2 in spatial_shapes], np.float32)  # (L, 2)
        arr = jnp.transpose(loc_t, (0, 1, 4, 3, 5, 6, 2)).astype(jnp.float32)
        # (T, B, L, M, P, 2, Q)
        scale = jnp.asarray(wh).reshape(1, 1, L, 1, 1, 2, 1)
        origin = jnp.stack(
            [jnp.asarray(ox_np, jnp.float32), jnp.asarray(oy_np, jnp.float32)],
            axis=-1,
        )  # (L, T, 2)
        origin = jnp.transpose(origin, (1, 0, 2)).reshape(T, 1, L, 1, 1, 2, 1)
        xy = arr * scale - 0.5 - origin
        x_arr = xy[..., 0, :]  # (T, B, L, M, P, Q)
        y_arr = xy[..., 1, :]
        a_arr = jnp.transpose(attn_t, (0, 1, 4, 3, 5, 2)).astype(jnp.float32)

        out = _level_pallas(
            grids, geom, oy_np, ox_np, x_arr, y_arr, a_arr,
            T=T, Q=Q, B=B, M=M, D=D, L=L, P=P, Mb=Mb, Mg=Mg,
            block=block, out_dtype=out_dtype, interpret=interpret,
        )
        out = jnp.moveaxis(out, 2, 3)  # (T, B, Q, M, D)
        out_l = _untile_queries(out, nty, ntx, H1, W1, ty, tx)
        out_levels.append(out_l.reshape(B, H1 * W1, M * D).astype(out_dtype))

    return jnp.concatenate(out_levels, axis=1)


def _level_pallas(grids, geom, oy_np, ox_np, x_arr, y_arr, a_arr, *, T, Q, B, M,
                  D, L, P, Mb, Mg, block, out_dtype, interpret):
    """Shared per-source-level pallas invocation: x/y/a (T, B, L, M|Mb-grouped,
    P, Q) local coords/attention -> (T, B, M, Q, D)."""
    # scalar-prefetched origin table consumed by the fp index maps
    org = jnp.asarray(np.stack([oy_np, ox_np], axis=0).reshape(2 * L, T))

    if Mg > 1:
        pgrid = (T, B, Mg)

        def fp_spec(l2, Fh, Fw):
            def idx(t_, b_, m_, org_ref):
                return (
                    b_,
                    m_ * Mb,
                    org_ref[l2, t_],
                    pl.multiple_of(org_ref[L + l2, t_], block),
                    0,
                )

            return pl.BlockSpec(
                (pl.Element(1), pl.Element(Mb), pl.Element(Fh),
                 pl.Element(Fw), pl.Element(D)),
                idx,
            )

        qspec = pl.BlockSpec(
            (None, None, L, Mb, P, Q),
            lambda t_, b_, m_, org_ref: (t_, b_, 0, m_, 0, 0),
        )
        out_spec = pl.BlockSpec(
            (None, None, Mb, Q, D),
            lambda t_, b_, m_, org_ref: (t_, b_, m_, 0, 0),
        )
    else:
        pgrid = (T, B)

        def fp_spec(l2, Fh, Fw):  # noqa: F811
            def idx(t_, b_, org_ref):
                return (
                    b_,
                    0,
                    org_ref[l2, t_],
                    pl.multiple_of(org_ref[L + l2, t_], block),
                    0,
                )

            return pl.BlockSpec(
                (pl.Element(1), pl.Element(M), pl.Element(Fh),
                 pl.Element(Fw), pl.Element(D)),
                idx,
            )

        qspec = pl.BlockSpec(
            (None, None, L, M, P, Q),
            lambda t_, b_, org_ref: (t_, b_, 0, 0, 0, 0),
        )
        out_spec = pl.BlockSpec(
            (None, None, M, Q, D), lambda t_, b_, org_ref: (t_, b_, 0, 0, 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=pgrid,
        in_specs=[qspec, qspec, qspec]
        + [fp_spec(l2, fh, fw) for l2, (fh, fw) in enumerate(geom)],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((fh, fw, Q), jnp.float32) for fh, fw in geom],
    )
    kern = functools.partial(
        _kernel, geom=geom, Mb=Mb, P=P, Q=Q, D=D, out_dtype=out_dtype
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, B, M, Q, D), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(org, x_arr, y_arr, a_arr, *[g.astype(out_dtype) for g in grids])


def ms_deform_attn_encoder_vmem_tm(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    locT: jnp.ndarray,
    attnT: jnp.ndarray,
    halo: int = 8,
    block: int = 8,
    tile_sizes: Optional[Sequence[int]] = None,
    heads_per_step: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Tile-major variant: sampling geometry arrives pre-transposed.

    ``locT`` (B, M, L, P, 2, S_tm) normalized sampling locations and ``attnT``
    (B, M, L, P, S_tm) on the tile-major token axis of ``tile_major_perm`` —
    the layout the transposed offsets/attention matmuls emit directly
    (models/spotter.py), so the wrapper's only data movement is a per-level
    chunked transpose with the whole Q tile contiguous. Returns (B, S, M*D)
    in NATURAL token order.
    """
    B, S, M, D = value.shape
    _, _, L, P, _, S_tm = locT.shape
    out_dtype = value.dtype
    tiles = _norm_tiles(tile_sizes, L)
    Mb = M if heads_per_step in (0, M) else heads_per_step
    assert M % Mb == 0
    Mg = M // Mb

    grids = _pad_level_grids(value, spatial_shapes, block)
    _, level_info = tile_major_perm(spatial_shapes, tiles)
    assert level_info[-1][0] + level_info[-1][1] * level_info[-1][2] == S_tm

    out_levels: List[jnp.ndarray] = []
    for l, (H1, W1) in enumerate(spatial_shapes):
        s_tm, T, Q, ty, tx, nty, ntx = level_info[l]
        geom: List[Tuple[int, int]] = []
        oy_np = np.zeros((L, T), np.int32)
        ox_np = np.zeros((L, T), np.int32)
        for l2, (H2, W2) in enumerate(spatial_shapes):
            Hp2, Wp2 = grids[l2].shape[2], grids[l2].shape[3]
            # y rides a MAJOR dim of the grid block — Element offsets there
            # need no sublane-divisibility proof, so the footprint height is
            # exact (tile + 2*halo + 1) instead of block-rounded
            oys, Fh = _footprint_bounds(H1, ty, nty, H2, Hp2, halo, 1)
            oxs, Fw = _footprint_bounds(W1, tx, ntx, W2, Wp2, halo, block)
            geom.append((Fh, Fw))
            oy_np[l2] = np.repeat(np.asarray(oys, np.int32), ntx)
            ox_np[l2] = np.tile(np.asarray(oxs, np.int32), nty)

        seg = locT[..., s_tm : s_tm + T * Q].reshape(B, M, L, P, 2, T, Q)
        seg = jnp.transpose(seg, (5, 0, 2, 1, 3, 4, 6)).astype(jnp.float32)
        # (T, B, L, M, P, 2, Q) — Q contiguous, chunked move
        wh = np.asarray([[w2, h2] for h2, w2 in spatial_shapes], np.float32)
        scale = jnp.asarray(wh).reshape(1, 1, L, 1, 1, 2, 1)
        origin = jnp.stack(
            [jnp.asarray(ox_np, jnp.float32), jnp.asarray(oy_np, jnp.float32)],
            axis=-1,
        )
        origin = jnp.transpose(origin, (1, 0, 2)).reshape(T, 1, L, 1, 1, 2, 1)
        xy = seg * scale - 0.5 - origin
        x_arr = xy[..., 0, :]
        y_arr = xy[..., 1, :]
        aseg = attnT[..., s_tm : s_tm + T * Q].reshape(B, M, L, P, T, Q)
        a_arr = jnp.transpose(aseg, (4, 0, 2, 1, 3, 5)).astype(jnp.float32)

        out = _level_pallas(
            grids, geom, oy_np, ox_np, x_arr, y_arr, a_arr,
            T=T, Q=Q, B=B, M=M, D=D, L=L, P=P, Mb=Mb, Mg=Mg,
            block=block, out_dtype=out_dtype, interpret=interpret,
        )
        out = jnp.moveaxis(out, 2, 3)  # (T, B, Q, M, D)
        out_l = _untile_queries(out, nty, ntx, H1, W1, ty, tx)
        out_levels.append(out_l.reshape(B, H1 * W1, M * D).astype(out_dtype))

    return jnp.concatenate(out_levels, axis=1)
