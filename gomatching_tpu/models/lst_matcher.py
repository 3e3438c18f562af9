"""LST-Matcher: the trainable tracker head (rescoring + association transformers).

Re-design of the reference roi_heads:
  - ``LSTMatcher`` (gomatching/modeling/roi_heads/lstmatcher.py:59): two DETR-lite
    matcher transformers (long/short term) + two ATTWeightHead affinity heads +
    FCHead4Query reid embedding + a Linear rescoring head.
  - ``SHA_FFN_CRSATTN`` (gomatching/modeling/roi_heads/shared_ffn_crsattn.py:62):
    GoMatching++ — one shared decoder-only matcher (0 encoder layers, cross-attn
    only, no FFN), with the same pair of affinity predictors.

TPU-first design: the association pass is a fixed-shape function over a padded token
axis with a validity mask. Because the decoder has no self-attention, every query row
is independent given the encoder memory — so we always decode *all* N rows and let
the (host-side) tracker slice out the query frame's rows, instead of gathering
dynamic ``query_inds`` like the reference (roi_heads/transformer.py:80-84). The
softmax-with-background activation and Hungarian assignment stay outside this module.

All shipped configs set ASSO_HEAD.NORM=False (norms are identity) and
ASSO_HEAD.DROPOUT=0.1: during training the matcher layers apply dropout on the
attention probabilities, after each attention output, and inside/after the FFN,
exactly where the reference's nn.Dropout modules sit
(roi_heads/transformer.py:166-258). Pass ``train=True`` + a 'dropout' rng to
``associate`` to enable; inference and init stay deterministic.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import MLP, MultiHeadAttention


class ReidHead(nn.Module):
    """FCHead4Query (association_head.py:100-122): flatten (.., npts, C) query
    features -> num_fc x [Dense(fc_dim) + relu]. ReLU after every layer."""

    fc_dim: int = 1024
    num_fc: int = 2

    @nn.compact
    def __call__(self, query_features):
        x = query_features.reshape(*query_features.shape[:-2], -1)
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, name=f"fc{i + 1}")(x))
        return x


class AffinityHead(nn.Module):
    """ATTWeightHead (association_head.py:35-57): q/k MLP projections + bmm.

    With num_layers=0 (all shipped configs) both projections are the identity.
    """

    feature_dim: int
    num_layers: int = 0

    @nn.compact
    def __call__(self, query, key):
        if self.num_layers > 0:
            q = MLP(self.feature_dim, self.feature_dim, self.num_layers, name="q_proj")(query)
            k = MLP(self.feature_dim, self.feature_dim, self.num_layers, name="k_proj")(key)
        else:
            q, k = query, key
        return jnp.einsum("bmf,bnf->bmn", q, k)


class MatcherEncoderLayer(nn.Module):
    """Self-attn + FFN with residuals; norms identity when with_norm=False;
    dropout placement mirrors forward_post (roi_heads/transformer.py:191-207:
    attn-prob dropout, dropout1 on the attn output, dropout inside the FFN,
    dropout2 on the FFN output)."""

    num_heads: int
    dim_feedforward: int
    with_norm: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, src, valid: Optional[jnp.ndarray] = None, deterministic: bool = True,
                 pos: Optional[jnp.ndarray] = None):
        key_mask = None if valid is None else ~valid
        drop = lambda x: (
            nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
            if self.dropout_rate > 0.0
            else x
        )
        qk = src if pos is None else src + pos  # with_pos_embed, transformer.py:196
        attn = MultiHeadAttention(
            self.num_heads, dropout_rate=self.dropout_rate, name="self_attn"
        )(qk, qk, src, key_mask, deterministic=deterministic)
        src = src + drop(attn)
        if self.with_norm:
            src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)
        h = nn.Dense(src.shape[-1], name="linear2")(
            drop(nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(src)))
        )
        src = src + drop(h)
        if self.with_norm:
            src = nn.LayerNorm(epsilon=1e-5, name="norm2")(src)
        return src


class MatcherDecoderLayer(nn.Module):
    """Cross-attn (+ optional FFN); no self-attention (NO_DECODER_SELF_ATT=True).
    Dropout placement mirrors forward_post (roi_heads/transformer.py:264-287)."""

    num_heads: int
    dim_feedforward: int
    with_ffn: bool = True
    with_norm: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, tgt, memory, valid: Optional[jnp.ndarray] = None,
                 deterministic: bool = True, pos: Optional[jnp.ndarray] = None):
        key_mask = None if valid is None else ~valid
        drop = lambda x: (
            nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
            if self.dropout_rate > 0.0
            else x
        )
        # query carries no pos (query_pos is None in the matchers); keys do
        # (transformer.py:277-279)
        keys = memory if pos is None else memory + pos
        attn = MultiHeadAttention(
            self.num_heads, dropout_rate=self.dropout_rate, name="cross_attn"
        )(tgt, keys, memory, key_mask, deterministic=deterministic)
        tgt = tgt + drop(attn)
        if self.with_norm:
            tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        if self.with_ffn:
            h = nn.Dense(tgt.shape[-1], name="linear2")(
                drop(nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(tgt)))
            )
            tgt = tgt + drop(h)
            if self.with_norm:
                tgt = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        return tgt


class MatcherTransformer(nn.Module):
    """DETR-lite matcher trunk. Returns (decoded_tokens, memory), both (B, N, F)."""

    feature_dim: int = 1024
    num_heads: int = 8
    num_encoder_layers: int = 1
    num_decoder_layers: int = 1
    decoder_ffn: bool = True
    with_norm: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(
        self, tokens: jnp.ndarray, valid: Optional[jnp.ndarray] = None,
        deterministic: bool = True, pos: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        memory = tokens
        for i in range(self.num_encoder_layers):
            memory = MatcherEncoderLayer(
                self.num_heads, self.feature_dim, self.with_norm,
                dropout_rate=self.dropout_rate, name=f"enc_{i}"
            )(memory, valid, deterministic=deterministic, pos=pos)
        # decoder targets are the RAW input rows, not the encoder output
        # (transformer.py:80-84: tgt = src[query_inds] with src pre-encoder)
        tgt = tokens
        for i in range(self.num_decoder_layers):
            tgt = MatcherDecoderLayer(
                self.num_heads,
                self.feature_dim,
                with_ffn=self.decoder_ffn,
                with_norm=self.with_norm,
                dropout_rate=self.dropout_rate,
                name=f"dec_{i}",
            )(tgt, memory, valid, deterministic=deterministic, pos=pos)
        return tgt, memory


class LSTMatcherHead(nn.Module):
    """The trainable GoMatching parameter bundle (reid + rescore + matchers).

    variant "lst"    = GoMatching   (ROI_HEADS.NAME=LSTMatcher)
    variant "shared" = GoMatching++ (ROI_HEADS.NAME=SHA_FFN_CRSATTN)
    """

    hidden_dim: int = 256
    num_points: int = 25
    feature_dim: int = 1024
    num_fc: int = 2
    num_heads: int = 8
    num_encoder_layers: int = 1
    num_decoder_layers: int = 1
    num_weight_layers: int = 0
    variant: str = "lst"
    with_rescore: bool = True
    with_norm: bool = False
    dropout_rate: float = 0.0
    # box/temporal interpolated positional embeddings (lstmatcher.py:498-532);
    # every shipped YAML sets NO_POS_EMB=True so these default off
    no_pos_emb: bool = True
    with_temp_emb: bool = False
    learn_pos_emb_num: int = 16
    learn_temp_emb_num: int = 16

    def setup(self):
        self.asso_head = ReidHead(self.feature_dim, self.num_fc, name="asso_head")
        if self.with_rescore:
            self.rescoring_head = nn.Dense(1, name="rescoring_head")
        if self.variant == "lst":
            self.long_term_matcher = MatcherTransformer(
                self.feature_dim,
                self.num_heads,
                self.num_encoder_layers,
                self.num_decoder_layers,
                with_norm=self.with_norm,
                dropout_rate=self.dropout_rate,
                name="long_term_matcher",
            )
            self.short_term_matcher = MatcherTransformer(
                self.feature_dim,
                self.num_heads,
                self.num_encoder_layers,
                self.num_decoder_layers,
                with_norm=self.with_norm,
                dropout_rate=self.dropout_rate,
                name="short_term_matcher",
            )
        elif self.variant == "shared":
            self.shared_matcher = MatcherTransformer(
                self.feature_dim,
                self.num_heads,
                num_encoder_layers=0,
                num_decoder_layers=self.num_decoder_layers,
                decoder_ffn=False,
                with_norm=self.with_norm,
                dropout_rate=self.dropout_rate,
                name="shared_matcher",
            )
        else:
            raise ValueError(f"unknown matcher variant: {self.variant}")
        if not self.no_pos_emb:
            self.pos_emb = self.param(
                "pos_emb",
                nn.initializers.normal(1.0),
                (self.learn_pos_emb_num * 4, self.feature_dim // 4),
            )
            if self.with_temp_emb:
                self.temp_emb = self.param(
                    "temp_emb",
                    nn.initializers.normal(1.0),
                    (self.learn_temp_emb_num, self.feature_dim),
                )
        self.asso_predictor = AffinityHead(
            self.feature_dim, self.num_weight_layers, name="asso_predictor"
        )
        self.local_asso_predictor = AffinityHead(
            self.feature_dim, self.num_weight_layers, name="local_asso_predictor"
        )

    def rescore(self, query_features):
        """Linear rescoring head over per-point query features (lstmatcher.py:185-186)."""
        return self.rescoring_head(query_features)

    def reid(self, query_features):
        """(.., npts, C) -> (.., feature_dim) reid embedding."""
        return self.asso_head(query_features)

    def box_pe(self, boxes):
        """Bilinearly-interpolated learned box embedding (lstmatcher.py:498-518).
        ``boxes``: (..., 4) xyxy normalized to [0, 1] -> (..., F)."""
        T = self.learn_pos_emb_num
        xywh = jnp.concatenate(
            [(boxes[..., 2:] + boxes[..., :2]) / 2, boxes[..., 2:] - boxes[..., :2]],
            axis=-1,
        ) * T  # (..., 4)
        l = jnp.clip(jnp.floor(xywh), 0, T - 1).astype(jnp.int32)
        r = jnp.clip(l + 1, 0, T - 1)
        lw = xywh - l.astype(xywh.dtype)
        rw = 1.0 - lw
        table = self.pos_emb.reshape(T, 4, -1)  # (T, 4, F//4)
        four = jnp.arange(4)
        pos_le = table[l, four]  # (..., 4, F//4)
        pos_re = table[r, four]
        out = lw[..., None] * pos_re + rw[..., None] * pos_le
        return out.reshape(*boxes.shape[:-1], -1)

    def temp_pe(self, times):
        """Interpolated temporal embedding (lstmatcher.py:521-532). ``times``:
        (...,) in [0, 1] (frame index / window length) -> (..., F)."""
        T = self.learn_temp_emb_num
        t = times * T
        l = jnp.clip(jnp.floor(t), 0, T - 1).astype(jnp.int32)
        r = jnp.clip(l + 1, 0, T - 1)
        lw = t - l.astype(t.dtype)
        return lw[..., None] * self.temp_emb[r] + (1.0 - lw[..., None]) * self.temp_emb[l]

    def associate(self, reid_tokens, valid, short_term: bool, train: bool = False,
                  boxes=None, times=None):
        """(B, N, F) padded reid tokens + (B, N) validity -> (B, N, N) affinity logits.

        ``train=True`` enables ASSO_HEAD.DROPOUT in the matcher layers (needs a
        'dropout' rng); inference stays deterministic. With NO_POS_EMB=False,
        ``boxes`` (B, N, 4 normalized xyxy) and (if WITH_TEMP_EMB) ``times``
        (B, N in [0,1]) feed the interpolated embeddings
        (_forward_transformer, lstmatcher.py:338-346)."""
        pos = None
        if not self.no_pos_emb and boxes is not None:
            pos = self.box_pe(boxes)
            if self.with_temp_emb and times is not None:
                pos = (pos + self.temp_pe(times)) / 2.0
        if self.variant == "lst":
            matcher = self.short_term_matcher if short_term else self.long_term_matcher
        else:
            matcher = self.shared_matcher
        tgt, memory = matcher(reid_tokens, valid, deterministic=not train, pos=pos)
        predictor = self.local_asso_predictor if short_term else self.asso_predictor
        return predictor(tgt, memory)

    def __call__(self, query_features, reid_tokens, valid, short_term: bool = False):
        """Init-friendly entry touching every submodule."""
        out = {}
        if self.with_rescore:
            out["re_logits"] = self.rescore(query_features)
        out["reid"] = self.reid(query_features)
        out["asso_short"] = self.associate(reid_tokens, valid, True)
        out["asso_long"] = self.associate(reid_tokens, valid, False)
        return out
