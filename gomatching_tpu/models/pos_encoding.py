"""Sine positional encodings.

Parity: adet/layers/pos_encoding.py:46-82 (2D, mask-aware cumsum normalization) and
adet/modeling/model/utils.py:24-37 (per-point query position embedding). NHWC layout.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from .layers import sine_embed


def position_encoding_1d(
    length: int,
    channels: int,
    temperature: float = 10000.0,
    normalize: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """1D sine-cosine encoding (adet/layers/pos_encoding.py:5-43): positions
    1..length, sin block then cos block over ``channels``."""
    if scale is None:
        scale = 2 * math.pi
    dim_t = jnp.arange(0, channels, 2, dtype=jnp.float32)
    inv_freq = 1.0 / (temperature ** (dim_t / channels))
    pos = jnp.arange(1, length + 1, dtype=jnp.float32)
    if normalize:
        pos = pos / (pos[-1] + 1e-6) * scale
    ang = pos[:, None] * inv_freq[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)[:, :channels]


def position_encoding_2d(
    shape: Tuple[int, int, int],
    num_pos_feats: int,
    temperature: float = 10000.0,
    mask: Optional[jnp.ndarray] = None,
    scale: float = 2 * math.pi,
) -> jnp.ndarray:
    """Mask-aware normalized 2D sine embedding -> (B, H, W, 2*num_pos_feats).

    ``mask`` is True on padded pixels (reference convention). With no mask the whole
    map is valid, which collapses the cumsum to a plain index grid.
    Channel order: [y-embedding, x-embedding] (pos_encoding.py:81).
    """
    b, h, w = shape
    eps = 1e-6
    if mask is None:
        y = jnp.broadcast_to(jnp.arange(1, h + 1, dtype=jnp.float32)[None, :, None], (b, h, w))
        x = jnp.broadcast_to(jnp.arange(1, w + 1, dtype=jnp.float32)[None, None, :], (b, h, w))
        y_max = jnp.full((b, 1, w), float(h))
        x_max = jnp.full((b, h, 1), float(w))
    else:
        not_mask = (~mask).astype(jnp.float32)
        y = jnp.cumsum(not_mask, axis=1)
        x = jnp.cumsum(not_mask, axis=2)
        y_max = y[:, -1:, :]
        x_max = x[:, :, -1:]
    y = (y - 0.5) / (y_max + eps)
    x = (x - 0.5) / (x_max + eps)
    pos_y = sine_embed(y, num_pos_feats, temperature, scale)
    pos_x = sine_embed(x, num_pos_feats, temperature, scale)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def point_query_pos_embed(pts: jnp.ndarray, d_model: int, temperature: float) -> jnp.ndarray:
    """Per-point sine embedding for decoder queries.

    ``pts``: (..., 2) normalized (x, y). Returns (..., d_model) with channel order
    [x-embedding, y-embedding] (model/utils.py:36 — note the opposite order vs. the
    2D image encoding).
    """
    scale = 2 * math.pi
    half = d_model // 2
    pos_x = sine_embed(pts[..., 0], half, temperature, scale)
    pos_y = sine_embed(pts[..., 1], half, temperature, scale)
    return jnp.concatenate([pos_x, pos_y], axis=-1)
