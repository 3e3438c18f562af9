"""Shared NN building blocks (flax.linen).

The parameter layout intentionally mirrors the reference torch modules 1:1 per leaf
(e.g. a torch ``nn.MultiheadAttention`` in-proj splits into our q/k/v Dense kernels)
so the PyTorch->JAX weight converter is a pure renaming + transpose pass.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    """ReLU MLP head, matching adet/modeling/model/utils.py:7-21 semantics."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class MultiHeadAttention(nn.Module):
    """Standard softmax MHA with torch ``nn.MultiheadAttention`` numerics.

    q/k/v/out projections all carry bias; scores scaled by head_dim**-0.5.
    Inputs are (B, N, C); an optional boolean ``key_mask`` marks *invalid* keys.
    """

    num_heads: int
    # dropout on the attention probabilities, like torch nn.MultiheadAttention's
    # ``dropout=`` arg (roi_heads/transformer.py:173,243-244); inert in eval
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, query, key, value, key_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        d = query.shape[-1]
        assert d % self.num_heads == 0
        hd = d // self.num_heads

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, hd)

        q = split(nn.Dense(d, name="q_proj")(query))
        k = split(nn.Dense(d, name="k_proj")(key))
        v = split(nn.Dense(d, name="v_proj")(value))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        if self.dropout_rate > 0.0:
            attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(query.shape)
        return nn.Dense(d, name="out_proj")(out)


class FFN(nn.Module):
    """Post-norm transformer FFN block: x + linear2(act(linear1(x))), then LayerNorm."""

    dim_feedforward: int
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = self.activation(h)
        h = nn.Dense(d, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x + h)


def sine_embed(coords: jnp.ndarray, num_feats: int, temperature: float, scale: float):
    """Sine/cosine embedding of scalar coordinates.

    ``coords`` (...,) already multiplied by nothing; caller controls normalization.
    Returns (..., num_feats) interleaved [sin(x/t^0), cos(x/t^0), sin(x/t^..), ...]
    matching the torch ``stack(sin, cos, dim=-1).flatten`` layout used across the
    reference (adet/layers/pos_encoding.py:74-81, model/utils.py:24-37).
    """
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_feats)
    pos = coords[..., None] * scale / dim_t
    return jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1).reshape(
        *coords.shape, num_feats
    )
