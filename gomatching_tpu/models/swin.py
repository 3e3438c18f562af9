"""Swin Transformer backbone (tiny/small), NHWC flax.linen.

Parity: third_party/adet/modeling/swin/swin_transformer.py:491-726 as configured by
the GoMatching Swin configs: patch 4, window 7, embed_dim 96, depths [2,2,6,2]
(tiny) / [2,2,18,2] (small), heads [3,6,12,24], out stages (1,2,3) -> channels
192/384/768 at strides 8/16/32, per-output LayerNorm (``norm{i}``), absolute pos
embedding off, patch-norm on.

TPU notes: window partition/shift are static reshapes + jnp.roll; feature maps are
right/bottom-padded to window multiples (static padding since input shapes are
static under jit).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _rel_pos_index(wh: int, ww: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))  # 2, wh, ww
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, n, n
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # (n, n)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (nW*B, n, C); mask: (nW, n, n) additive or None
        Bn, n, C = x.shape
        h = self.num_heads
        hd = C // h
        ws = self.window_size
        qkv = nn.Dense(3 * C, name="qkv")(x).reshape(Bn, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (hd**-0.5), k)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), h),
        )
        rel_idx = jnp.asarray(_rel_pos_index(ws, ws))
        bias = table[rel_idx.reshape(-1)].reshape(n, n, h)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, h, n, n) + mask[None, :, None]
            attn = attn.reshape(Bn, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bn, n, C)
        return nn.Dense(C, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    # stochastic depth on both residual branches (swin_transformer.py:221,287,291);
    # train-time only — GoMatching freezes the backbone so this is pretraining-only
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        def dp(branch):
            if self.drop_path <= 0.0:
                return branch
            # per-sample branch drop with 1/(1-p) rescale == timm DropPath
            return nn.Dropout(self.drop_path, broadcast_dims=(1, 2, 3))(
                branch, deterministic=deterministic
            )
        # x: (B, H, W, C)
        B, H, W, C = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = _shift_mask(Hp, Wp, ws, self.shift)
        else:
            mask = None

        xw = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
        xw = jnp.transpose(xw, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, C)
        aw = WindowAttention(self.dim, self.num_heads, ws, name="attn")(xw, mask)
        aw = aw.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
        x = jnp.transpose(aw, (0, 1, 3, 2, 4, 5)).reshape(B, Hp, Wp, C)

        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x[:, :H, :W]
        x = shortcut + dp(x)

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C, name="mlp_fc2")(y)
        return x + dp(y)


def _shift_mask(Hp, Wp, ws, shift):
    img = np.zeros((Hp, Wp), np.int32)
    cnt = 0
    for hsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hsl, wsl] = cnt
            cnt += 1
    win = img.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    mask = (win[:, None, :] != win[:, :, None]).astype(np.float32) * -100.0
    return jnp.asarray(mask)


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        pad_b, pad_r = H % 2, W % 2
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin-T/S trunk emitting {res3, res4, res5}-style stage outputs (NHWC)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    out_indices: Sequence[int] = (1, 2, 3)
    # per-block rates ramp linearly to drop_path_rate (swin_transformer.py:570)
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        # patch embed: conv 4x4 stride 4 + LN
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), padding="VALID", name="patch_embed_proj")(
            jnp.pad(x, ((0, 0), (0, (4 - x.shape[1] % 4) % 4), (0, (4 - x.shape[2] % 4) % 4), (0, 0)))
        )
        x = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(x)

        outputs = {}
        dim = self.embed_dim
        total = sum(self.depths)
        rates = np.linspace(0.0, self.drop_path_rate, total)
        bidx = 0
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                x = SwinBlock(
                    dim,
                    self.num_heads[si],
                    self.window_size,
                    shift=0 if bi % 2 == 0 else self.window_size // 2,
                    drop_path=float(rates[bidx]),
                    name=f"layers_{si}_blocks_{bi}",
                )(x, deterministic=not train)
                bidx += 1
            if si in self.out_indices:
                out = nn.LayerNorm(epsilon=1e-5, name=f"out_norm{si}")(x)
                outputs[f"res{si + 2}"] = out
            if si < len(self.depths) - 1:
                x = PatchMerging(dim, name=f"layers_{si}_downsample")(x)
                dim *= 2
        return outputs
