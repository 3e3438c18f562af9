"""ViTAEv2-S backbone, NHWC flax.linen.

Parity: third_party/adet/modeling/vitae_v2/ (vitae_v2.py:98-255, ReductionCell.py,
NormalCell.py, window.py, token_transformer.py) as configured by
``build_vitaev2_backbone`` for type 'vitaev2_s' (vitae_v2.py:229-255):

  4 stages of BasicLayer = ReductionCell + NC_depth x NormalCell, with
  RC/NC token types ['window','window','transformer','transformer'],
  embed_dims [64,64,128,256], token_dims [64,128,256,512],
  downsample [4,2,2,2], NC_depth [2,2,8,2], NC_heads [1,2,4,8],
  RC_heads [1,1,2,4], NC_group [1,32,64,128], RC_group [1,16,32,64],
  dilations [[1,2,3,4],[1,2,3],[1,2],[1,2]], window 7, mlp_ratio 4.
  Outputs stage3/4/5 -> channels 128/256/512 at strides 8/16/32.

All attention shifts are 0 in this config (shift_size=0 everywhere), so there are
no attention masks. DropPath/Dropout are identity at inference; the backbone is
frozen in GoMatching (FREEZE_TYPE=ExceptROIheads) so BatchNorm is realized as a
frozen per-channel affine (same treatment as the ResNet trunk).

TPU notes: everything is static-shape NHWC; window partition is reshape+transpose;
the stage-3 'transformer' cells run full global attention over ~H/16*W/16 tokens,
which XLA maps to large MXU matmuls (no windowing needed).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import FrozenBN


def _gelu(x):
    return nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = _gelu(x)
        return nn.Dense(self.out, name="fc2")(x)


class FullAttention(nn.Module):
    """Standard MHA over all tokens (NormalCell.py:33-58)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = self.num_heads
        hd = self.dim // h
        qkv = nn.Dense(3 * self.dim, name="qkv")(x).reshape(B, N, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (hd**-0.5), k)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class TokenAttention(nn.Module):
    """T2T-style attention mapping dim -> in_dim with internal v-skip
    (token_transformer.py:9-43)."""

    in_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        h = self.num_heads
        hd = self.in_dim // h
        # T2T attention is built with the default qkv_bias=False
        # (ReductionCell.py:117-118 -> token_transformer.py:16)
        qkv = nn.Dense(3 * self.in_dim, use_bias=False, name="qkv")(x).reshape(B, N, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (hd**-0.5), k)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, self.in_dim)
        out = nn.Dense(self.in_dim, name="proj")(out)
        # v is the skip connection (input has a different width than the output)
        return v.reshape(B, N, self.in_dim) + out


class VitaeWindowAttention(nn.Module):
    """Window MHA mapping in_dim -> out_dim, no relative position bias
    (window.py:65-145; the rel-pos table is commented out in the reference)."""

    out_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, xw):
        Bn, n, _ = xw.shape
        h = self.num_heads
        hd = self.out_dim // h
        qkv = nn.Dense(3 * self.out_dim, name="qkv")(xw).reshape(Bn, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (hd**-0.5), k)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bn, n, self.out_dim)
        return nn.Dense(self.out_dim, name="proj")(out)


def _window_apply(x, H, W, C_out, ws, attn_fn):
    """Pad symmetrically to window multiples, partition, attend, un-partition.

    The reference pads top+bottom/left+right with the remainder split in half
    (ReductionCell.py:155-176, NormalCell.py:171-231).
    """
    B = x.shape[0]
    pad_td = (ws - H % ws) % ws
    pad_lr = (ws - W % ws) % ws
    pt, pb = pad_td // 2, pad_td - pad_td // 2
    pl, pr = pad_lr // 2, pad_lr - pad_lr // 2
    x = x.reshape(B, H, W, -1)
    x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    Hp, Wp = H + pad_td, W + pad_lr
    C = x.shape[-1]
    xw = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    xw = jnp.transpose(xw, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, C)
    aw = attn_fn(xw)
    aw = aw.reshape(B, Hp // ws, Wp // ws, ws, ws, C_out)
    x = jnp.transpose(aw, (0, 1, 3, 2, 4, 5)).reshape(B, Hp, Wp, C_out)
    x = x[:, pt : pt + H, pl : pl + W]
    return x.reshape(B, H * W, C_out)


class PRM(nn.Module):
    """Pyramid reduction module: parallel dilated convs + GELU, concatenated
    (ReductionCell.py:13-65, op='cat')."""

    embed_dim: int
    kernel_size: int
    stride: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, d in enumerate(self.dilations):
            pad = math.ceil(((self.kernel_size - 1) * d + 1 - self.stride) / 2)
            y = nn.Conv(
                self.embed_dim,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                kernel_dilation=(d, d),
                name=f"conv{i}",
            )(x)
            outs.append(_gelu(y))
        return jnp.concatenate(outs, axis=-1)


class PCM(nn.Module):
    """Parallel convolution module: 3 grouped 3x3 convs with (frozen) BN + SiLU
    between. Per-conv output dims differ between the two uses:
    ReductionCell.py:99-107 -> (embed, embed, token);
    NormalCell.py:147-154   -> (mlp_hidden, dim, dim)."""

    dims: Sequence[int]
    strides: Sequence[int]
    group: int

    @nn.compact
    def __call__(self, x):
        for i, (dim, s) in enumerate(zip(self.dims, self.strides)):
            x = nn.Conv(
                dim, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
                feature_group_count=self.group, name=f"conv{i}",
            )(x)
            if i < 2:
                x = FrozenBN(dim, name=f"bn{i}")(x)
                x = nn.silu(x)
        return x


class ReductionCell(nn.Module):
    """PRM + attention + PCM residual + MLP (ReductionCell.py:67-188)."""

    embed_dim: int
    token_dim: int
    downsample: int
    kernel_size: int
    heads: int
    dilations: Sequence[int]
    group: int
    tokens_type: str  # 'window' | 'transformer'
    window_size: int = 7

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        H, W = hw
        B = x.shape[0]
        x = x.reshape(B, H, W, -1)

        # PCM strides decompose the downsample ratio over three convs
        # (ReductionCell.py:84-90): 4 -> (2,2,1), 2 -> (2,1,1)
        residual = self.downsample // 2
        strides = []
        for _ in range(3):
            strides.append(2 if residual > 0 else 1)
            residual //= 2

        prm = PRM(
            self.embed_dim, self.kernel_size, self.downsample, self.dilations, name="prm"
        )(x)  # (B, H', W', embed*len(dil))
        Ho, Wo = prm.shape[1], prm.shape[2]
        prm = prm.reshape(B, Ho * Wo, -1)

        conv_x = PCM(
            (self.embed_dim, self.embed_dim, self.token_dim), strides, self.group,
            name="pcm",
        )(x)
        conv_x = conv_x.reshape(B, Ho * Wo, self.token_dim)

        if self.tokens_type == "window":
            y = nn.LayerNorm(epsilon=1e-5, name="norm1")(prm)
            attn = VitaeWindowAttention(self.token_dim, self.heads, name="attn")
            y = _window_apply(y, Ho, Wo, self.token_dim, self.window_size, attn)
        else:  # 'transformer': T2T attention with internal v-skip
            y = nn.LayerNorm(epsilon=1e-5, name="norm1")(prm)
            y = TokenAttention(self.token_dim, self.heads, name="attn")(y)
        y = y + conv_x
        y = y + Mlp(self.token_dim, self.token_dim, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(y)
        )
        return y, (Ho, Wo)


class NormalCell(nn.Module):
    """norm1 -> attention; out = x + attn + PCM(x); out += MLP(norm2(out))
    (NormalCell.py:117-251)."""

    dim: int
    heads: int
    group: int
    tokens_type: str  # 'window' | 'transformer'
    mlp_ratio: float = 4.0
    window_size: int = 7

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        H, W = hw
        B, N, C = x.shape
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.tokens_type == "window":
            attn = VitaeWindowAttention(self.dim, self.heads, name="attn")
            y = _window_apply(y, H, W, self.dim, self.window_size, attn)
        else:
            y = FullAttention(self.dim, self.heads, name="attn")(y)

        hidden = int(self.dim * self.mlp_ratio)
        conv_x = PCM((hidden, self.dim, self.dim), (1, 1, 1), self.group, name="pcm")(
            shortcut.reshape(B, H, W, C)
        ).reshape(B, N, C)

        x = shortcut + y + conv_x
        x = x + Mlp(hidden, self.dim, name="mlp")(nn.LayerNorm(epsilon=1e-6, name="norm2")(x))
        return x


class ViTAEv2(nn.Module):
    """ViTAEv2-S trunk emitting {stage3, stage4, stage5} (NHWC), strides 8/16/32."""

    embed_dims: Sequence[int] = (64, 64, 128, 256)
    token_dims: Sequence[int] = (64, 128, 256, 512)
    downsample: Sequence[int] = (4, 2, 2, 2)
    kernel_sizes: Sequence[int] = (7, 3, 3, 3)
    rc_heads: Sequence[int] = (1, 1, 2, 4)
    nc_heads: Sequence[int] = (1, 2, 4, 8)
    dilations: Sequence[Sequence[int]] = ((1, 2, 3, 4), (1, 2, 3), (1, 2), (1, 2))
    rc_groups: Sequence[int] = (1, 16, 32, 64)
    nc_groups: Sequence[int] = (1, 32, 64, 128)
    nc_depths: Sequence[int] = (2, 2, 8, 2)
    tokens_types: Sequence[str] = ("window", "window", "transformer", "transformer")
    window_size: int = 7
    out_stages: Sequence[int] = (1, 2, 3)  # -> stage3/4/5

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        outputs = {}
        hw = (H, W)
        for i in range(4):
            x, hw = ReductionCell(
                self.embed_dims[i],
                self.token_dims[i],
                self.downsample[i],
                self.kernel_sizes[i],
                self.rc_heads[i],
                self.dilations[i],
                self.rc_groups[i],
                self.tokens_types[i],
                self.window_size,
                name=f"layers_{i}_rc",
            )(x, hw)
            for j in range(self.nc_depths[i]):
                x = NormalCell(
                    self.token_dims[i],
                    self.nc_heads[i],
                    self.nc_groups[i],
                    self.tokens_types[i],
                    window_size=self.window_size,
                    name=f"layers_{i}_nc_{j}",
                )(x, hw)
            if i in self.out_stages:
                # framework-internal level names (reference calls these stage3/4/5,
                # vitae_v2.py:218-223); res* keeps the spotter backbone-agnostic
                outputs[f"res{i + 2}"] = x.reshape(B, hw[0], hw[1], -1)
        return outputs
