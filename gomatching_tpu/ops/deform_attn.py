"""Multi-scale deformable attention sampling — TPU-native core op.

Numerical spec: the reference's pure-PyTorch oracle ``ms_deform_attn_core_pytorch``
(third_party/adet/layers/ms_deform_attn.py:40-60), i.e. for every (batch, query, head):
sample ``n_points`` bilinear taps from each of ``n_levels`` flattened feature maps at
``sampling_locations`` (normalized [0,1] per level), with ``grid_sample``
align_corners=False + zero padding semantics, and reduce with softmaxed
``attention_weights``. The CUDA kernel it replaces lives at
third_party/adet/layers/csrc/ms_deform_attn/ms_deform_im2col_cuda.cuh:238.

Design for TPU: spatial shapes are static (python ints), so all level bookkeeping is
resolved at trace time. The four bilinear corner taps become four batched gathers over
a single level-concatenated value tensor; out-of-range taps are realized by zeroing
the corner weight (not the value), which reproduces zero-padding exactly. The query
axis is processed in chunks under ``lax.map`` to bound gather intermediates.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _merged_corner_table(value_bm: jnp.ndarray, spatial_shapes) -> jnp.ndarray:
    """Build the corner-merged value table.

    value_bm: (B, M, S, D) level-concatenated.
    Returns (B, M, S, 4*D) where slot j = (jy, jx) of row s holds
    value[s + jy*W_l + jx] (within the row's level; rows on the last row/column of
    a level carry an edge duplicate in the +1 slots, which is never *used* because
    the gather base index is clamped to [0, dim-2] and slot weights vanish there).

    Rationale: XLA's TPU row gather runs at a fixed rows/sec rate almost independent
    of row width (measured ~67M rows/s for 128 B rows vs ~33M rows/s for 512 B rows
    on v5e), so fetching all four bilinear corners in ONE 4*D-wide row roughly
    doubles sampling throughput vs four D-wide gathers per sample.
    """
    B, M, S, D = value_bm.shape
    tables = []
    start = 0
    for h, w in spatial_shapes:
        v = value_bm[:, :, start : start + h * w].reshape(B, M, h, w, D)
        # pad one edge row/col with duplicates (never selected by in-range weights)
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
        t = jnp.concatenate(
            [
                vp[:, :, :h, :w],      # (0, 0)
                vp[:, :, :h, 1 : w + 1],  # (0, +x)
                vp[:, :, 1 : h + 1, :w],  # (+y, 0)
                vp[:, :, 1 : h + 1, 1 : w + 1],  # (+y, +x)
            ],
            axis=-1,
        )  # (B, M, h, w, 4D)
        tables.append(t.reshape(B, M, h * w, 4 * D))
        start += h * w
    return jnp.concatenate(tables, axis=2)


def _merged_indices_and_slot_weights(sampling_locations, attention_weights, spatial_shapes):
    """Base (top-left, clamped) gather index + per-slot weights for the merged table.

    For each sample the 2x2 gather window is anchored at
    base = (clip(floor(y), 0, H-2), clip(floor(x), 0, W-2)); a true bilinear corner
    contributes its weight to the slot it lands on (shift of 0/+1 after clamping),
    and corners outside the map contribute nowhere — reproducing grid_sample's
    zero-padding exactly.

    Returns idx (B, M, Lq, L*P) int32, slot_w (B, M, Lq, L*P, 4) f32
    (attention weight folded in).
    """
    B, Lq, M, L, P, _ = sampling_locations.shape
    loc = jnp.transpose(sampling_locations, (0, 2, 1, 3, 4, 5)).astype(jnp.float32)
    attn = jnp.transpose(attention_weights, (0, 2, 1, 3, 4)).astype(jnp.float32)
    # (B, M, Lq, L, P)

    hs = jnp.asarray([h for h, _ in spatial_shapes], dtype=jnp.float32)
    ws = jnp.asarray([w for _, w in spatial_shapes], dtype=jnp.float32)
    level_start = []
    cur = 0
    for h, w in spatial_shapes:
        level_start.append(cur)
        cur += h * w
    starts = jnp.asarray(level_start, dtype=jnp.int32)

    bshape = (1, 1, 1, L, 1)
    hs_b = hs.reshape(bshape)
    ws_b = ws.reshape(bshape)

    x = loc[..., 0] * ws_b - 0.5  # (B, M, Lq, L, P)
    y = loc[..., 1] * hs_b - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    # degenerate 1-wide/1-tall levels: clamp the upper bound to 0 (a plain
    # ws-2 would invert the clip bounds and index into the previous level)
    base_x = jnp.clip(x0, 0.0, jnp.maximum(ws_b - 2.0, 0.0))
    base_y = jnp.clip(y0, 0.0, jnp.maximum(hs_b - 2.0, 0.0))

    def axis_slot_weights(c0, frac, base, size):
        # weight of true corners c0 (1-frac) and c0+1 (frac) landing on slots
        # base+0 / base+1; a corner off the map matches no slot. The +1 slot is
        # additionally masked when it falls outside the level (size == 1, where
        # the merged table's +1 slot holds an edge duplicate, not a zero).
        w_lo = jnp.where(base == c0, 1.0 - frac, 0.0) + jnp.where(base == c0 + 1, frac, 0.0)
        w_hi = jnp.where(base + 1 == c0, 1.0 - frac, 0.0) + jnp.where(base + 1 == c0 + 1, frac, 0.0)
        w_hi = jnp.where(base + 1 <= size - 1, w_hi, 0.0)
        return w_lo, w_hi

    wx0, wx1 = axis_slot_weights(x0, dx, base_x, ws_b)
    wy0, wy1 = axis_slot_weights(y0, dy, base_y, hs_b)

    # slot order must match _merged_corner_table: (0,0), (0,+x), (+y,0), (+y,+x)
    slot_w = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    slot_w = slot_w * attn[..., None]

    idx = (
        starts.reshape(bshape)
        + base_y.astype(jnp.int32) * ws_b.astype(jnp.int32)
        + base_x.astype(jnp.int32)
    )
    return idx.reshape(B, M, Lq, L * P), slot_w.reshape(B, M, Lq, L * P, 4)


def ms_deform_attn_core(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    query_chunk: int = 8192,
) -> jnp.ndarray:
    """Deformable attention sampling (corner-merged single-gather formulation).

    Args:
      value: (B, S, M, D) level-concatenated per-head values, S = sum(H_l * W_l).
      spatial_shapes: static list of (H_l, W_l).
      sampling_locations: (B, Lq, M, L, P, 2) in [0, 1].
      attention_weights: (B, Lq, M, L, P), softmax-normalized over L*P.
      query_chunk: queries processed per gather step to bound gather intermediates.

    Returns:
      (B, Lq, M * D) sampled output, dtype of ``value``.
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    out_dtype = value.dtype

    value_bm = jnp.transpose(value, (0, 2, 1, 3))  # (B, M, S, D)
    table = _merged_corner_table(value_bm, spatial_shapes)  # (B, M, S, 4D)
    idx, slot_w = _merged_indices_and_slot_weights(
        sampling_locations, attention_weights, spatial_shapes
    )
    slot_w = slot_w.astype(out_dtype)

    # query_chunk <= 0: auto-size the chunk so the materialized gather
    # intermediate (B, M, chunk, LP, 4, D) stays under ~2 GB of HBM — fewer,
    # larger chunks are faster (measured 90 ms vs 130 ms per encoder layer at
    # B=1), but the unchunked intermediate OOMs at B=4 on 1000px inputs.
    if query_chunk <= 0:
        bytes_per_q = B * M * L * P * 4 * D * jnp.dtype(out_dtype).itemsize
        query_chunk = max(1024, int(6e8) // max(bytes_per_q, 1))
    n_chunks = -(-Lq // min(query_chunk, Lq))
    chunk = -(-Lq // n_chunks)
    pad = n_chunks * chunk - Lq
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad), (0, 0)))
        slot_w = jnp.pad(slot_w, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    LP = L * P
    idx = idx.reshape(B, M, n_chunks, chunk, LP).transpose(2, 0, 1, 3, 4)
    slot_w = slot_w.reshape(B, M, n_chunks, chunk, LP, 4).transpose(2, 0, 1, 3, 4, 5)

    def gather_bm(t_sd, i_flat):
        # t_sd: (S, 4D); i_flat: (chunk * LP,) -> (chunk * LP, 4D)
        return jnp.take(t_sd, i_flat, axis=0, indices_are_sorted=False, unique_indices=False)

    def chunk_fn(args):
        idx_c, w_c = args  # (B, M, chunk, LP), (B, M, chunk, LP, 4)
        flat = idx_c.reshape(B, M, chunk * LP)
        g = jax.vmap(jax.vmap(gather_bm))(table, flat)  # (B, M, chunk*LP, 4D)
        # keep the gather OUT of the weighted-reduce fusion: letting XLA fuse
        # them serializes the row fetches inside the reduction loop (~2.3x
        # slower end-to-end, measured 383ms vs 168ms at the encoder's scale)
        g = jax.lax.optimization_barrier(g)
        g = g.reshape(B, M, chunk, LP, 4, D)
        acc = jnp.sum(
            g * w_c[..., None], axis=(3, 4), dtype=jnp.float32
        )  # (B, M, chunk, D)
        return acc.astype(out_dtype)

    if n_chunks == 1:
        out = chunk_fn((idx[0], slot_w[0]))[None]
    else:
        out = jax.lax.map(chunk_fn, (idx, slot_w))  # (n_chunks, B, M, chunk, D)
    out = jnp.transpose(out, (1, 0, 3, 2, 4)).reshape(B, n_chunks * chunk, M * D)
    return out[:, :Lq]


def ms_deform_attn_reference(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Straightforward per-level implementation (no chunking) used as a test oracle."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    splits = []
    cur = 0
    for h, w in spatial_shapes:
        splits.append((cur, cur + h * w))
        cur += h * w

    out = jnp.zeros((B, Lq, M, D), dtype=jnp.float32)
    for l, (h, w) in enumerate(spatial_shapes):
        v = value[:, splits[l][0] : splits[l][1]].reshape(B, h, w, M, D).astype(jnp.float32)
        loc = sampling_locations[:, :, :, l].astype(jnp.float32)  # (B, Lq, M, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0, y0 = jnp.floor(x), jnp.floor(y)
        dx, dy = x - x0, y - y0
        acc = jnp.zeros((B, Lq, M, P, D), dtype=jnp.float32)
        for cy, cx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            xi, yi = x0 + cx, y0 + cy
            wgt = jnp.where(cx == 1, dx, 1 - dx) * jnp.where(cy == 1, dy, 1 - dy)
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)

            def tap(v_b, yi_b, xi_b, m_idx):
                # v_b: (h, w, M, D); yi_b/xi_b: (Lq, M, P)
                return v_b[yi_b, xi_b, m_idx]

            m_idx = jnp.broadcast_to(jnp.arange(M)[None, :, None], xi_c.shape[1:])
            g = jax.vmap(tap, in_axes=(0, 0, 0, None))(v, yi_c, xi_c, m_idx)
            acc = acc + jnp.where(inside[..., None], wgt[..., None] * g, 0.0)
        out = out + jnp.sum(acc * attention_weights[:, :, :, l, :, None].astype(jnp.float32), axis=3)
    return out.reshape(B, Lq, M * D).astype(value.dtype)
