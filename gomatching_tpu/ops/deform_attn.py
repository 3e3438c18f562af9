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


def _corner_indices_and_weights(
    sampling_locations: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
):
    """Compute flat gather indices and bilinear weights for the 4 corner taps.

    Args:
      sampling_locations: (B, Lq, M, L, P, 2) normalized (x, y) in [0, 1].
      spatial_shapes: static list of (H, W) per level.

    Returns:
      idx:     4 x (B, M, Lq, L*P) int32 into the level-concatenated token axis.
      weights: 4 x (B, M, Lq, L*P) float32 bilinear corner weights (zero when the
               corner falls outside its level's map).
    """
    B, Lq, M, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    # (B, M, Lq, L, P, 2)
    loc = jnp.transpose(sampling_locations, (0, 2, 1, 3, 4, 5)).astype(jnp.float32)

    hs = jnp.asarray([h for h, _ in spatial_shapes], dtype=jnp.float32)
    ws = jnp.asarray([w for _, w in spatial_shapes], dtype=jnp.float32)
    level_start = []
    cur = 0
    for h, w in spatial_shapes:
        level_start.append(cur)
        cur += h * w
    starts = jnp.asarray(level_start, dtype=jnp.int32)

    # grid_sample(align_corners=False): pixel = loc * size - 0.5
    x = loc[..., 0] * ws[None, None, None, :, None] - 0.5  # (B, M, Lq, L, P)
    y = loc[..., 1] * hs[None, None, None, :, None] - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    idxs = []
    wts = []
    for cy, cx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        xi = x0 + cx
        yi = y0 + cy
        wx = jnp.where(cx == 1, dx, 1.0 - dx)
        wy = jnp.where(cy == 1, dy, 1.0 - dy)
        in_x = (xi >= 0) & (xi <= ws[None, None, None, :, None] - 1)
        in_y = (yi >= 0) & (yi <= hs[None, None, None, :, None] - 1)
        w = jnp.where(in_x & in_y, wx * wy, 0.0)
        xi_c = jnp.clip(xi, 0, ws[None, None, None, :, None] - 1)
        yi_c = jnp.clip(yi, 0, hs[None, None, None, :, None] - 1)
        flat = (
            starts[None, None, None, :, None]
            + yi_c.astype(jnp.int32) * ws.astype(jnp.int32)[None, None, None, :, None]
            + xi_c.astype(jnp.int32)
        )
        idxs.append(flat.reshape(B, M, Lq, L * P))
        wts.append(w.reshape(B, M, Lq, L * P))
    return idxs, wts


def ms_deform_attn_core(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    query_chunk: int = 4096,
) -> jnp.ndarray:
    """Deformable attention sampling.

    Args:
      value: (B, S, M, D) level-concatenated per-head values, S = sum(H_l * W_l).
      spatial_shapes: static list of (H_l, W_l).
      sampling_locations: (B, Lq, M, L, P, 2) in [0, 1].
      attention_weights: (B, Lq, M, L, P), softmax-normalized over L*P.
      query_chunk: queries processed per gather step to bound VMEM/HBM pressure.

    Returns:
      (B, Lq, M * D) sampled output, dtype of ``value``.
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    out_dtype = value.dtype

    idxs, wts = _corner_indices_and_weights(sampling_locations, spatial_shapes)
    attn = jnp.transpose(attention_weights, (0, 2, 1, 3, 4)).reshape(B, M, Lq, L * P)
    attn = attn.astype(jnp.float32)
    # fold the bilinear weight into the attention weight per corner
    cw = [(attn * w).astype(out_dtype) for w in wts]  # 4 x (B, M, Lq, LP)
    cidx = jnp.stack(idxs, axis=0)  # (4, B, M, Lq, LP)
    cw = jnp.stack(cw, axis=0)  # (4, B, M, Lq, LP)

    value_bm = jnp.transpose(value, (0, 2, 1, 3))  # (B, M, S, D)

    # pad the query axis to a multiple of the chunk size
    chunk = min(query_chunk, Lq)
    n_chunks = -(-Lq // chunk)
    pad = n_chunks * chunk - Lq
    if pad:
        cidx = jnp.pad(cidx, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
        cw = jnp.pad(cw, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    # (n_chunks, 4, B, M, chunk, LP)
    cidx = cidx.reshape(4, B, M, n_chunks, chunk, L * P).transpose(3, 0, 1, 2, 4, 5)
    cw = cw.reshape(4, B, M, n_chunks, chunk, L * P).transpose(3, 0, 1, 2, 4, 5)

    def gather_bm(v_sd, i_flat):
        # v_sd: (S, D); i_flat: (chunk * LP,) -> (chunk * LP, D)
        return jnp.take(v_sd, i_flat, axis=0, indices_are_sorted=False, unique_indices=False)

    def chunk_fn(args):
        idx_c, w_c = args  # (4, B, M, chunk, LP)
        acc = jnp.zeros((B, M, chunk, D), dtype=jnp.float32)
        for c in range(4):
            flat = idx_c[c].reshape(B, M, chunk * (L * P))
            g = jax.vmap(jax.vmap(gather_bm))(value_bm, flat)  # (B, M, chunk*LP, D)
            g = g.reshape(B, M, chunk, L * P, D)
            acc = acc + jnp.sum(g * w_c[c][..., None], axis=3, dtype=jnp.float32)
        return acc.astype(out_dtype)

    out = jax.lax.map(chunk_fn, (cidx, cw))  # (n_chunks, B, M, chunk, D)
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
