"""DeepSolo spotter — deformable encoder + composite decoder + prediction heads.

This is the JAX re-design of the reference's frozen image spotter:
  - ``DeformableTransformer`` (third_party/adet/layers/deformable_transformer.py:22)
  - ``DETECTION_TRANSFORMER_WOBACKBONE`` heads
    (third_party/adet/modeling/model/detection_transformer_wobackbone.py:15)

Everything is fused into one linen module so the prediction heads shared between the
decoder's iterative refinement and the final outputs (ctrl_point_coord) and between
the encoder proposal stage and the transformer (bezier heads) are plain shared
submodules. All shapes are static: level spatial shapes are python ints, the query
budget is (num_queries, num_points), and padding is expressed through boolean masks
rather than dynamic slicing.

Layout: features NHWC; token axes (B, S, C) with S the level-concatenated token
count. Dropout is omitted on this path — every shipped config sets
MODEL.TRANSFORMER.DROPOUT = 0.0 and the spotter is frozen in GoMatching.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deform_attn import ms_deform_attn_core
from ..utils.misc import inverse_sigmoid
from .layers import MLP, FFN, MultiHeadAttention
from .pos_encoding import point_query_pos_embed, position_encoding_2d


def _on_tpu() -> bool:
    """True when jit will target a TPU (honoring an explicit default device;
    a string-valued jax_default_device also resolves via its platform)."""
    dd = jax.config.jax_default_device
    if dd is None:
        return jax.default_backend() == "tpu"
    plat = getattr(dd, "platform", dd)
    return str(plat) == "tpu"


def bernstein_matrix(num_points: int) -> np.ndarray:
    """(num_points, 4) cubic Bernstein basis evaluated at linspace(0, 1)."""
    t = np.linspace(0.0, 1.0, num_points)[:, None]
    k = np.arange(4)[None, :]
    binom = np.array([1.0, 3.0, 3.0, 1.0])[None, :]
    return (binom * t**k * (1 - t) ** (3 - k)).astype(np.float32)


def _offset_grid_init(n_heads: int, n_levels: int, n_points: int):
    """Radial-grid bias init for the sampling-offset projection.

    Head h points along angle 2*pi*h/n_heads, scaled to L-inf norm 1, multiplied by
    (point_index + 1) — the reference's MSDeformAttn._reset_parameters scheme
    (ms_deform_attn.py:101-109).
    """
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1

    def init(key, shape, dtype=jnp.float32):
        assert np.prod(shape) == grid.size
        return jnp.asarray(grid.reshape(shape), dtype)

    return init


class TransposedDense(nn.Module):
    """Dense emitting features-major output: (B, C, S) -> (B, F, S).

    Same parameter tree as ``nn.Dense`` (kernel (C, F), bias (F,)), applied as
    an einsum contraction so the output is born with the token axis minor —
    the layout the fused encoder sampler consumes (no per-layer element-
    strided transpose). ``col_perm`` (static, new->old) reorders the OUTPUT
    feature rows without touching the canonical parameter layout, so the
    kernel-v2 sampler can consume rows grouped (level, head) while the
    converter/golden contract keeps the reference ordering."""

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    col_perm: Optional[Any] = None

    @nn.compact
    def __call__(self, xT):
        k = self.param("kernel", self.kernel_init, (xT.shape[1], self.features))
        b = self.param("bias", self.bias_init, (self.features,))
        if self.col_perm is not None:
            cp = jnp.asarray(self.col_perm)
            k = k[:, cp]
            b = b[cp]
        return jnp.einsum("bcs,cf->bfs", xT, k.astype(xT.dtype)) + b.astype(
            xT.dtype
        )[None, :, None]


class MSDeformAttn(nn.Module):
    """Deformable attention layer: offset/weight projections around the core op.

    Parity: third_party/adet/layers/ms_deform_attn.py:69-156.
    """

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    # 'xla' (gather core, exact, works everywhere), 'tiled' (one-hot MXU path for
    # encoder self-attn; falls back to 'xla' outside its exact regime), 'pallas'
    sampling_impl: str = "xla"
    tiled_halo: int = 8
    # vmem tuning knobs (TPU.ENC_BLOCK / TPU.DEC_GATHER_LEVELS): encoder
    # footprint x-origin alignment, and how many finest levels the decoder
    # hybrid routes through the gather core (0 = all fused one-hot)
    enc_block: int = 8
    dec_gather_levels: int = 0

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Lq, C)
        reference_points: jnp.ndarray,  # (B, Lq, L, 2) normalized
        value_tokens: jnp.ndarray,  # (B, S, C)
        spatial_shapes: Sequence[Tuple[int, int]],
        token_valid: Optional[jnp.ndarray] = None,  # (B, S) True where real
        query_chunk: int = 0,
        is_encoder_self_attn: bool = False,
    ) -> jnp.ndarray:
        B, Lq, C = query.shape
        M, L, P = self.n_heads, self.n_levels, self.n_points
        D = C // M

        value = nn.Dense(C, name="value_proj")(value_tokens)
        if token_valid is not None:
            value = jnp.where(token_valid[..., None], value, 0.0)
        value = value.reshape(B, -1, M, D)

        if (
            self.sampling_impl == "vmem"
            and is_encoder_self_attn
            and token_valid is None
        ):
            # Encoder fast path (kernel v2): sampling geometry is BORN in the
            # fused kernel's layout. The offsets/attention projections run as
            # (C, S)-contraction matmuls on a tile-major permuted token axis
            # with their feature rows statically reordered to (level, head)
            # groups, and the kernel windows those outputs DIRECTLY — no
            # location tensor, no relayout; reference coordinates come from
            # the in-kernel tile-affine query iota. Same parameters, same
            # math: reference points are the grid centers the caller passes
            # when inputs are un-padded (valid_ratios == 1).
            assert Lq == value.shape[1]
            from ..ops.deform_attn_vmem import (
                attn_column_perm,
                ms_deform_attn_encoder_vmem_v2,
                offset_column_perm,
                tile_major_inverse,
                tile_major_perm,
            )

            perm, _ = tile_major_perm(spatial_shapes)
            qp = jnp.take(query, jnp.asarray(perm), axis=1)  # (B, S_tm, C)
            qT = jnp.swapaxes(qp, 1, 2)  # (B, C, S_tm)
            S_tm = perm.shape[0]
            offT = TransposedDense(
                M * L * P * 2,
                kernel_init=nn.initializers.zeros,
                bias_init=_offset_grid_init(M, L, P),
                col_perm=offset_column_perm(M, L, P),
                name="sampling_offsets",
            )(qT).astype(jnp.float32)  # (B, 2LMP, S_tm) rows (l, xy, m, p)
            attnT = TransposedDense(
                M * L * P,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                col_perm=attn_column_perm(M, L, P),
                name="attention_weights",
            )(qT).astype(jnp.float32)  # (B, LMP, S_tm) rows (l, m, p)
            # softmax over (level, point) jointly per head — rows are strided
            # in the (l, m, p) order, so reduce over axes (1, 3) of the
            # major-split view (pure elementwise + reductions, no relayout)
            z = attnT.reshape(B, L, M, P, S_tm)
            z = z - jax.lax.stop_gradient(jnp.max(z, axis=(1, 3), keepdims=True))
            e = jnp.exp(z)
            attnT = (e / jnp.sum(e, axis=(1, 3), keepdims=True)).reshape(
                B, L * M * P, S_tm
            )
            out_tm = ms_deform_attn_encoder_vmem_v2(
                value, spatial_shapes, offT, attnT, halo=self.tiled_halo,
                block=self.enc_block, interpret=not _on_tpu(),
            )  # (B, S_tm, M*D) tile-major
            inv = tile_major_inverse(spatial_shapes)
            out = jnp.take(out_tm, jnp.asarray(inv), axis=1)
            return nn.Dense(C, name="output_proj")(out)

        offsets = nn.Dense(
            M * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_grid_init(M, L, P),
            name="sampling_offsets",
        )(query).reshape(B, Lq, M, L, P, 2)
        attn = nn.Dense(
            M * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(B, Lq, M, L * P)
        attn = jax.nn.softmax(attn, axis=-1).reshape(B, Lq, M, L, P)

        wh = jnp.asarray([[w, h] for h, w in spatial_shapes], dtype=jnp.float32)  # (L, 2)
        loc = reference_points[:, :, None, :, None, :] + offsets / wh[None, None, None, :, None, :]

        if is_encoder_self_attn:
            # calibration hook: apply(..., mutable=["intermediates"]) captures
            # per-layer sampling geometry for halo certification
            # (tools/certify_halo.py; ops.deform_attn_tiled.deform_attn_dropped_mass)
            self.sow("intermediates", "sampling_loc", loc)
            self.sow("intermediates", "sampling_attn", attn)

        if self.sampling_impl == "pallas":
            from .. ops.deform_attn_pallas import ms_deform_attn_pallas

            out = ms_deform_attn_pallas(value, spatial_shapes, loc, attn)
        elif (
            self.sampling_impl == "tiled"
            and is_encoder_self_attn
            and token_valid is None
        ):
            # explicit routing: only encoder self-attention satisfies the
            # queries-are-grid-tokens premise (Lq == S alone is a coincidence
            # a small config could reproduce in the decoder)
            assert Lq == value.shape[1]
            # encoder self-attn on un-padded inputs: queries are the grid tokens
            # themselves, so the tiled one-hot MXU contraction applies exactly
            # (up to the halo bound — see ops/deform_attn_tiled.py docstring)
            from ..ops.deform_attn_tiled import ms_deform_attn_encoder_tiled

            out = ms_deform_attn_encoder_tiled(
                value, spatial_shapes, loc, attn, halo=self.tiled_halo
            )
        elif self.sampling_impl == "vmem":
            # decoder cross-attention (arbitrary refined-point queries): the
            # full-level one-hot VMEM kernel is exact — padded tokens are
            # already zeroed in `value`, reproducing the mask semantics of the
            # gather core (ops/deform_attn_dec_vmem.py)
            from ..ops.deform_attn_dec_vmem import ms_deform_attn_queries_vmem

            out = ms_deform_attn_queries_vmem(
                value, spatial_shapes, loc, attn,
                gather_levels=self.dec_gather_levels, interpret=not _on_tpu()
            )
        else:
            out = ms_deform_attn_core(value, spatial_shapes, loc, attn, query_chunk=query_chunk)
        return nn.Dense(C, name="output_proj")(out)


class EncoderLayer(nn.Module):
    """Deformable self-attention + FFN (deformable_transformer.py:218-278)."""

    d_model: int
    dim_feedforward: int
    n_levels: int
    n_heads: int
    n_points: int
    sampling_impl: str = "xla"
    tiled_halo: int = 8
    enc_block: int = 8

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, token_valid):
        attn = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            sampling_impl=self.sampling_impl, tiled_halo=self.tiled_halo,
            enc_block=self.enc_block, name="self_attn"
        )(src + pos, reference_points, src, spatial_shapes, token_valid,
          is_encoder_self_attn=True)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + attn)
        return FFN(self.dim_feedforward, name="ffn")(src)


class DecoderLayer(nn.Module):
    """Composite decoder layer: intra-point MHA, inter-query MHA, deformable cross-attn,
    FFN (deformable_transformer.py:326-427)."""

    d_model: int
    dim_feedforward: int
    n_levels: int
    n_heads: int
    n_points: int
    sampling_impl: str = "xla"
    tiled_halo: int = 8
    dec_gather_levels: int = 0

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, memory, spatial_shapes, token_valid):
        B, nq, npts, C = tgt.shape

        # intra-group attention across the npts point axis
        q = (tgt + query_pos).reshape(B * nq, npts, C)
        v = tgt.reshape(B * nq, npts, C)
        out = MultiHeadAttention(self.n_heads, name="attn_intra")(q, q, v)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm_intra")(tgt + out.reshape(tgt.shape))

        # inter-group attention across the nq query axis
        t = jnp.swapaxes(tgt, 1, 2).reshape(B * npts, nq, C)
        out = MultiHeadAttention(self.n_heads, name="attn_inter")(t, t, t)
        t = nn.LayerNorm(epsilon=1e-5, name="norm_inter")(t + out)
        tgt = jnp.swapaxes(t.reshape(B, npts, nq, C), 1, 2)

        # deformable cross-attention into the encoder memory
        flat_q = (tgt + query_pos).reshape(B, nq * npts, C)
        flat_ref = reference_points.reshape(B, nq * npts, self.n_levels, 2)
        out = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            sampling_impl=self.sampling_impl, tiled_halo=self.tiled_halo,
            dec_gather_levels=self.dec_gather_levels, name="attn_cross"
        )(flat_q, flat_ref, memory, spatial_shapes, token_valid, query_chunk=0)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm_cross")(tgt + out.reshape(tgt.shape))

        return FFN(self.dim_feedforward, name="ffn")(tgt)


class DeepSoloSpotter(nn.Module):
    """Full spotter over backbone features.

    __call__(features, pos_embeds, masks) -> dict with:
      pred_logits (B, nq, npts, 1), pred_text_logits (B, nq, npts, voc+1),
      pred_ctrl_points (B, nq, npts, 2), pred_bd_points (B, nq, npts, 4),
      query_features (B, nq, npts, C), enc_class/enc_coords for pretraining losses.
    """

    d_model: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    num_queries: int = 100
    num_points: int = 25
    voc_size: int = 37
    temperature: float = 10000.0
    in_channels: Tuple[int, ...] = (512, 1024, 2048)
    boundary_head: bool = True
    return_enc_outputs: bool = False
    # pretraining: also emit every decoder layer's head outputs (aux losses,
    # detection_transformer.py:209-253) — the GoMatching (frozen-spotter) path
    # keeps this off and only materializes the last layer
    return_aux_outputs: bool = False
    sampling_impl: str = "xla"
    tiled_halo: int = 8
    enc_block: int = 8
    dec_gather_levels: int = 0

    def setup(self):
        C = self.d_model
        n_backbone = len(self.in_channels)
        projs = []
        for i in range(self.num_feature_levels):
            stride = 1 if i < n_backbone else 2
            k = 1 if i < n_backbone else 3
            pad = (k - 1) // 2
            projs.append(
                nn.Conv(
                    C,
                    (k, k),
                    strides=(stride, stride),
                    padding=((pad, pad), (pad, pad)),
                    name=f"input_proj_{i}_conv",
                )
            )
        self.input_projs = projs
        self.input_gns = [
            nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"input_proj_{i}_gn")
            for i in range(self.num_feature_levels)
        ]

        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.num_feature_levels, C)
        )
        self.point_embed = self.param(
            "point_embed",
            nn.initializers.normal(1.0),
            (self.num_queries, self.num_points, C),
        )

        self.encoder_layers = [
            EncoderLayer(
                C,
                self.dim_feedforward,
                self.num_feature_levels,
                self.n_heads,
                self.enc_n_points,
                sampling_impl=self.sampling_impl,
                tiled_halo=self.tiled_halo,
                enc_block=self.enc_block,
                name=f"encoder_layer_{i}",
            )
            for i in range(self.num_encoder_layers)
        ]
        self.decoder_layers = [
            DecoderLayer(
                C,
                self.dim_feedforward,
                self.num_feature_levels,
                self.n_heads,
                self.dec_n_points,
                sampling_impl=self.sampling_impl,
                tiled_halo=self.tiled_halo,
                dec_gather_levels=self.dec_gather_levels,
                name=f"decoder_layer_{i}",
            )
            for i in range(self.num_decoder_layers)
        ]

        self.enc_output = nn.Dense(C, name="enc_output")
        self.enc_output_norm = nn.LayerNorm(epsilon=1e-5, name="enc_output_norm")
        self.ref_point_head = MLP(C, C, 2, name="ref_point_head")

        bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        self.bezier_proposal_class = nn.Dense(1, bias_init=bias_init, name="bezier_proposal_class")
        self.bezier_proposal_coord = MLP(C, 8, 3, name="bezier_proposal_coord")
        self.ctrl_point_class = nn.Dense(1, bias_init=bias_init, name="ctrl_point_class")
        self.ctrl_point_text = nn.Dense(
            self.voc_size + 1, bias_init=bias_init, name="ctrl_point_text"
        )
        self.ctrl_point_coord = MLP(C, 2, 3, name="ctrl_point_coord")
        if self.boundary_head:
            self.boundary_offset = MLP(C, 4, 3, name="boundary_offset")

    # ------------------------------------------------------------------
    def _flatten_levels(self, features, pos_embeds, masks):
        """Project levels to d_model, add the extra stride-2 level, flatten to tokens."""
        srcs, poss, valids, shapes, level_masks = [], [], [], [], []
        n_backbone = len(features)
        for i in range(self.num_feature_levels):
            x = features[i] if i < n_backbone else (features[-1] if i == n_backbone else prev)
            x = self.input_projs[i](x)
            x = self.input_gns[i](x)
            prev = x
            b, h, w, c = x.shape
            shapes.append((h, w))
            srcs.append(x.reshape(b, h * w, c))
            if i < n_backbone:
                pos = pos_embeds[i]
                mask_l = None if masks is None else masks[i]
            else:
                # synthesize mask + pos for the extra stride-2 level with
                # torch F.interpolate(mode='nearest') semantics — index
                # floor(i * in/out), NOT half-pixel-center rounding
                # (detection_transformer_wobackbone.py:180; golden 'pad' case)
                if masks is None:
                    mask_l = None
                else:
                    m0 = masks[0]
                    h0, w0 = m0.shape[1], m0.shape[2]
                    ridx = (jnp.arange(h) * h0) // h
                    cidx = (jnp.arange(w) * w0) // w
                    mask_l = m0[:, ridx][:, :, cidx]
                pos = position_encoding_2d((b, h, w), self.d_model // 2, self.temperature, mask_l)
            level_masks.append(mask_l)
            poss.append(pos.reshape(b, h * w, -1) + self.level_embed[i][None, None, :])
            valids.append(
                jnp.ones((b, h * w), bool) if mask_l is None else (~mask_l).reshape(b, h * w)
            )
        src_flat = jnp.concatenate(srcs, axis=1)
        pos_flat = jnp.concatenate(poss, axis=1).astype(src_flat.dtype)
        valid_flat = jnp.concatenate(valids, axis=1)
        return src_flat, pos_flat, valid_flat, shapes, level_masks

    def _valid_ratios(self, level_masks, shapes, batch: int):
        """(B, L, 2) fraction of (w, h) that is non-padded per level
        (deformable_transformer.py:141-148)."""
        ratios = []
        for (h, w), m in zip(shapes, level_masks):
            if m is None:
                ratios.append(jnp.ones((batch, 2), jnp.float32))
            else:
                valid_h = jnp.sum((~m[:, :, 0]).astype(jnp.float32), axis=1)
                valid_w = jnp.sum((~m[:, 0, :]).astype(jnp.float32), axis=1)
                ratios.append(jnp.stack([valid_w / w, valid_h / h], -1))
        return jnp.stack(ratios, axis=1)

    def _encoder_reference_points(self, shapes, valid_ratios):
        refs = []
        B = valid_ratios.shape[0]
        for lvl, (h, w) in enumerate(shapes):
            ry = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
            rx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
            ry = jnp.broadcast_to(ry, (h, w)).reshape(-1)
            rx = jnp.broadcast_to(rx, (h, w)).reshape(-1)
            ref = jnp.stack(
                [
                    rx[None] / (valid_ratios[:, None, lvl, 0] * w),
                    ry[None] / (valid_ratios[:, None, lvl, 1] * h),
                ],
                -1,
            )  # (B, HW, 2)
            refs.append(ref)
        ref_pts = jnp.concatenate(refs, axis=1)  # (B, S, 2)
        return ref_pts[:, :, None, :] * valid_ratios[:, None, :, :]  # (B, S, L, 2)

    def _gen_proposals(self, memory, valid_flat, shapes):
        """Two-stage proposal generation (deformable_transformer.py:108-139)."""
        B, S, C = memory.shape
        props = []
        offset = 0
        for h, w in shapes:
            v = valid_flat[:, offset : offset + h * w].reshape(B, h, w)
            valid_h = jnp.sum(v[:, :, 0].astype(jnp.float32), axis=1)
            valid_w = jnp.sum(v[:, 0, :].astype(jnp.float32), axis=1)
            gy = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
            gx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
            grid = jnp.stack([gx, gy], -1)[None]  # (1, h, w, 2)
            scale = jnp.stack([valid_w, valid_h], -1)[:, None, None, :]  # (B, 1, 1, 2)
            grid = (grid + 0.5) / scale
            props.append(jnp.tile(grid, (1, 1, 1, 4)).reshape(B, h * w, 8))
            offset += h * w
        proposals = jnp.concatenate(props, axis=1)  # (B, S, 8)
        in_range = jnp.all((proposals > 0.01) & (proposals < 0.99), axis=-1, keepdims=True)
        proposals = jnp.log(proposals / (1 - proposals))
        bad = (~valid_flat[..., None]) | (~in_range)
        proposals = jnp.where(bad, jnp.inf, proposals)
        mem = jnp.where(bad, 0.0, memory)
        mem = self.enc_output_norm(self.enc_output(mem))
        return mem, proposals

    # ------------------------------------------------------------------
    def __call__(self, features: List[jnp.ndarray], pos_embeds: List[jnp.ndarray], masks=None):
        src, pos, valid, shapes, level_masks = self._flatten_levels(features, pos_embeds, masks)
        B = src.shape[0]
        valid_ratios = self._valid_ratios(level_masks, shapes, B)
        token_valid = None if masks is None else valid

        # ---- encoder ----
        enc_refs = self._encoder_reference_points(shapes, valid_ratios)
        memory = src
        for layer in self.encoder_layers:
            memory = layer(memory, pos, enc_refs, shapes, token_valid)

        # ---- two-stage proposals ----
        out_mem, out_props = self._gen_proposals(memory, valid, shapes)
        enc_class = self.bezier_proposal_class(out_mem)  # (B, S, 1)
        enc_coords = self.bezier_proposal_coord(out_mem) + out_props  # (B, S, 8)
        _, topk_idx = jax.lax.top_k(enc_class[..., 0], self.num_queries)
        topk_coords = jnp.take_along_axis(enc_coords, topk_idx[..., None], axis=1)
        topk_coords = jax.lax.stop_gradient(topk_coords)
        bez = jax.nn.sigmoid(topk_coords).reshape(B, self.num_queries, 4, 2)
        bern = jnp.asarray(bernstein_matrix(self.num_points))
        reference_points = jnp.einsum("pk,bqkc->bqpc", bern, bez)  # (B, nq, npts, 2)

        # ---- decoder ----
        tgt = jnp.broadcast_to(
            self.point_embed[None].astype(memory.dtype),
            (B, self.num_queries, self.num_points, self.d_model),
        )
        ref = reference_points
        ref_in_last = ref
        aux_outputs = []
        for li, layer in enumerate(self.decoder_layers):
            # (B, nq, npts, L, 2)
            ref_input = ref[:, :, :, None, :] * valid_ratios[:, None, None, :, :]
            qp = point_query_pos_embed(ref_input[:, :, :, 0, :], self.d_model, self.temperature)
            query_pos = self.ref_point_head(qp).astype(tgt.dtype)
            tgt = layer(tgt, query_pos, ref_input, memory, shapes, token_valid)
            delta = self.ctrl_point_coord(tgt)
            ref_in_last = ref
            if self.return_aux_outputs and li < self.num_decoder_layers - 1:
                r = inverse_sigmoid(ref)
                aux = {
                    "pred_logits": self.ctrl_point_class(tgt),
                    "pred_text_logits": self.ctrl_point_text(tgt),
                    "pred_ctrl_points": jax.nn.sigmoid(delta + r),
                }
                if self.boundary_head:
                    aux["pred_bd_points"] = jax.nn.sigmoid(
                        self.boundary_offset(tgt) + jnp.tile(r, (1, 1, 1, 2))
                    )
                aux_outputs.append(aux)
            ref = jax.lax.stop_gradient(jax.nn.sigmoid(delta + inverse_sigmoid(ref)))

        # ---- heads on the last decoder state ----
        ref_unact = inverse_sigmoid(ref_in_last)
        out = {
            "pred_logits": self.ctrl_point_class(tgt),
            "pred_text_logits": self.ctrl_point_text(tgt),
            "pred_ctrl_points": jax.nn.sigmoid(self.ctrl_point_coord(tgt) + ref_unact),
            "query_features": tgt,
        }
        if self.boundary_head:
            bd = self.boundary_offset(tgt) + jnp.tile(ref_unact, (1, 1, 1, 2))
            out["pred_bd_points"] = jax.nn.sigmoid(bd)
        else:
            out["pred_bd_points"] = None
        if self.return_enc_outputs:
            out["enc_logits"] = enc_class
            out["enc_beziers"] = jax.nn.sigmoid(enc_coords)
        if self.return_aux_outputs:
            out["aux_outputs"] = aux_outputs
        return out
