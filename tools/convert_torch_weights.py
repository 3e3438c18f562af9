#!/usr/bin/env python
"""Convert reference PyTorch checkpoints (DeepSolo / GoMatching) to our npz format.

Usage:
    python tools/convert_torch_weights.py in.pth out.npz --config configs/GoMatching_ICDAR15.yaml

Covers:
  - the decoupled-backbone key layout (tools/decouple_deepsolo.py:10-20 renames
    detection_transformer.backbone.* -> backbone.*), i.e. GoMatching checkpoints
    with top-level ``backbone.0.backbone`` (MaskedBackbone in Joiner), and raw
    DeepSolo checkpoints (backbone still under detection_transformer);
  - layout transposes: torch Linear (out,in) -> flax kernel (in,out); Conv2d
    (out,in,kh,kw) -> (kh,kw,in,out); packed MHA in_proj -> split q/k/v.

The inverse mapping (ours -> torch-style flat dict) is exposed for round-trip
tests since reference checkpoints are not shipped in this environment.
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict

import numpy as np


def _linear(out, prefix_t, node, name):
    out[f"{prefix_t}.weight"] = ("linear_w", (node, name, "kernel"))
    out[f"{prefix_t}.bias"] = ("copy", (node, name, "bias"))


def _mlp(out, prefix_t, node, name, n_layers):
    for i in range(n_layers):
        _linear(out, f"{prefix_t}.layers.{i}", node, f"{name}/layers_{i}")


def _mha(out, prefix_t, node, name):
    # torch packed in_proj -> q/k/v
    out[f"{prefix_t}.in_proj_weight"] = ("mha_in_w", (node, name))
    out[f"{prefix_t}.in_proj_bias"] = ("mha_in_b", (node, name))
    _linear(out, f"{prefix_t}.out_proj", node, f"{name}/out_proj")


def _ms_deform_attn(out, prefix_t, node, name):
    for sub in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
        _linear(out, f"{prefix_t}.{sub}", node, f"{name}/{sub}")


def _layernorm(out, prefix_t, node, name):
    out[f"{prefix_t}.weight"] = ("copy", (node, name, "scale"))
    out[f"{prefix_t}.bias"] = ("copy", (node, name, "bias"))


def _frozen_bn(out, prefix_t, node, name):
    for k in ("weight", "bias", "running_mean", "running_var"):
        out[f"{prefix_t}.{k}"] = ("copy", (node, name, k))


def _conv(out, prefix_t, node, name, bias=False):
    out[f"{prefix_t}.weight"] = ("conv_w", (node, name, "kernel"))
    if bias:
        out[f"{prefix_t}.bias"] = ("copy", (node, name, "bias"))


def build_key_map(cfg) -> Dict[str, tuple]:
    """torch key -> (transform, (our_node, our_path...))."""
    t = cfg.MODEL.TRANSFORMER
    m: Dict[str, tuple] = {}

    bb = "backbone.0.backbone"
    bname = cfg.MODEL.BACKBONE.NAME
    if bname == "build_resnet_backbone":
        # ---- ResNet backbone (detectron2 naming) ----
        _conv(m, f"{bb}.stem.conv1", "backbone", "stem_conv1")
        _frozen_bn(m, f"{bb}.stem.conv1.norm", "backbone", "stem_norm1")
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[cfg.MODEL.RESNETS.DEPTH]
        for si, nb in enumerate(blocks):
            stage = f"res{si + 2}"
            for b in range(nb):
                tb = f"{bb}.{stage}.{b}"
                ob = f"{stage}_{b}"
                if b == 0:
                    _conv(m, f"{tb}.shortcut", "backbone", f"{ob}/shortcut")
                    _frozen_bn(m, f"{tb}.shortcut.norm", "backbone", f"{ob}/shortcut_norm")
                for ci in (1, 2, 3):
                    _conv(m, f"{tb}.conv{ci}", "backbone", f"{ob}/conv{ci}")
                    _frozen_bn(m, f"{tb}.conv{ci}.norm", "backbone", f"{ob}/norm{ci}")
    elif bname == "build_swin_backbone":
        # ---- Swin backbone (adet/modeling/swin/swin_transformer.py naming) ----
        _conv(m, f"{bb}.patch_embed.proj", "backbone", "patch_embed_proj", bias=True)
        _layernorm(m, f"{bb}.patch_embed.norm", "backbone", "patch_embed_norm")
        depths = {"tiny": (2, 2, 6, 2), "small": (2, 2, 18, 2)}[cfg.MODEL.SWIN.TYPE]
        for si, nb in enumerate(depths):
            for b in range(nb):
                tb = f"{bb}.layers.{si}.blocks.{b}"
                ob = f"layers_{si}_blocks_{b}"
                _layernorm(m, f"{tb}.norm1", "backbone", f"{ob}/norm1")
                _linear(m, f"{tb}.attn.qkv", "backbone", f"{ob}/attn/qkv")
                _linear(m, f"{tb}.attn.proj", "backbone", f"{ob}/attn/proj")
                m[f"{tb}.attn.relative_position_bias_table"] = (
                    "copy", ("backbone", f"{ob}/attn", "relative_position_bias_table"))
                _layernorm(m, f"{tb}.norm2", "backbone", f"{ob}/norm2")
                _linear(m, f"{tb}.mlp.fc1", "backbone", f"{ob}/mlp_fc1")
                _linear(m, f"{tb}.mlp.fc2", "backbone", f"{ob}/mlp_fc2")
            if si < 3:
                _layernorm(m, f"{bb}.layers.{si}.downsample.norm", "backbone",
                           f"layers_{si}_downsample/norm")
                m[f"{bb}.layers.{si}.downsample.reduction.weight"] = (
                    "linear_w", ("backbone", f"layers_{si}_downsample/reduction", "kernel"))
            if si in (1, 2, 3):
                _layernorm(m, f"{bb}.norm{si}", "backbone", f"out_norm{si}")
    elif bname == "build_vitaev2_backbone":
        # ---- ViTAEv2-S backbone (adet/modeling/vitae_v2 naming) ----
        nc_depths = (2, 2, 8, 2)
        dilations = ((1, 2, 3, 4), (1, 2, 3), (1, 2), (1, 2))

        def pcm(tprefix, oprefix):
            # torch PCM = Sequential(conv,BN,SiLU,conv,BN,SiLU,conv) -> idx 0,1,3,4,6
            for oi, ti in enumerate((0, 3, 6)):
                _conv(m, f"{tprefix}.{ti}", "backbone", f"{oprefix}/conv{oi}", bias=True)
            for oi, ti in enumerate((1, 4)):
                _frozen_bn(m, f"{tprefix}.{ti}", "backbone", f"{oprefix}/bn{oi}")

        def block(tprefix, oprefix, qkv_bias=True):
            # shared subtree of WindowTransformerBlock / Token_transformer / NormalCell
            _layernorm(m, f"{tprefix}.norm1", "backbone", f"{oprefix}/norm1")
            m[f"{tprefix}.attn.qkv.weight"] = (
                "linear_w", ("backbone", f"{oprefix}/attn/qkv", "kernel"))
            if qkv_bias:  # T2T attention in the 'transformer' RCs is bias-free
                m[f"{tprefix}.attn.qkv.bias"] = (
                    "copy", ("backbone", f"{oprefix}/attn/qkv", "bias"))
            _linear(m, f"{tprefix}.attn.proj", "backbone", f"{oprefix}/attn/proj")
            _layernorm(m, f"{tprefix}.norm2", "backbone", f"{oprefix}/norm2")
            _linear(m, f"{tprefix}.mlp.fc1", "backbone", f"{oprefix}/mlp/fc1")
            _linear(m, f"{tprefix}.mlp.fc2", "backbone", f"{oprefix}/mlp/fc2")

        tokens_types = ("window", "window", "transformer", "transformer")
        for si in range(4):
            trc = f"{bb}.layers.{si}.RC"
            orc = f"layers_{si}_rc"
            for k in range(len(dilations[si])):
                _conv(m, f"{trc}.PRM.convs.{k}.0", "backbone", f"{orc}/prm/conv{k}", bias=True)
            pcm(f"{trc}.PCM", f"{orc}/pcm")
            block(f"{trc}.attn", orc, qkv_bias=(tokens_types[si] == "window"))
            for b in range(nc_depths[si]):
                tnc = f"{bb}.layers.{si}.NC.{b}"
                onc = f"layers_{si}_nc_{b}"
                block(tnc, onc)
                pcm(f"{tnc}.PCM", f"{onc}/pcm")

    # ---- spotter ----
    dt = "detection_transformer"
    o = "detection_transformer"
    m[f"{dt}.point_embed.weight"] = ("point_embed", (o, "point_embed"))
    m[f"{dt}.transformer.level_embed"] = ("copy", (o, "level_embed"))
    for i in range(t.NUM_FEATURE_LEVELS):
        _conv(m, f"{dt}.input_proj.{i}.0", o, f"input_proj_{i}_conv", bias=True)
        m[f"{dt}.input_proj.{i}.1.weight"] = ("copy", (o, f"input_proj_{i}_gn", "scale"))
        m[f"{dt}.input_proj.{i}.1.bias"] = ("copy", (o, f"input_proj_{i}_gn", "bias"))
    for i in range(t.ENC_LAYERS):
        te = f"{dt}.transformer.encoder.layers.{i}"
        oe = f"encoder_layer_{i}"
        _ms_deform_attn(m, f"{te}.self_attn", o, f"{oe}/self_attn")
        _layernorm(m, f"{te}.norm1", o, f"{oe}/norm1")
        _linear(m, f"{te}.linear1", o, f"{oe}/ffn/linear1")
        _linear(m, f"{te}.linear2", o, f"{oe}/ffn/linear2")
        _layernorm(m, f"{te}.norm2", o, f"{oe}/ffn/norm")
    for i in range(t.DEC_LAYERS):
        td = f"{dt}.transformer.decoder.layers.{i}"
        od = f"decoder_layer_{i}"
        _mha(m, f"{td}.attn_intra", o, f"{od}/attn_intra")
        _layernorm(m, f"{td}.norm_intra", o, f"{od}/norm_intra")
        _mha(m, f"{td}.attn_inter", o, f"{od}/attn_inter")
        _layernorm(m, f"{td}.norm_inter", o, f"{od}/norm_inter")
        _ms_deform_attn(m, f"{td}.attn_cross", o, f"{od}/attn_cross")
        _layernorm(m, f"{td}.norm_cross", o, f"{od}/norm_cross")
        _linear(m, f"{td}.linear1", o, f"{od}/ffn/linear1")
        _linear(m, f"{td}.linear2", o, f"{od}/ffn/linear2")
        _layernorm(m, f"{td}.norm3", o, f"{od}/ffn/norm")
    _mlp(m, f"{dt}.transformer.decoder.ref_point_head", o, "ref_point_head", 2)
    _linear(m, f"{dt}.transformer.enc_output", o, "enc_output")
    _layernorm(m, f"{dt}.transformer.enc_output_norm", o, "enc_output_norm")
    # shared prediction heads: the ModuleList dedups to index 0 in torch state_dicts
    _linear(m, f"{dt}.bezier_proposal_class", o, "bezier_proposal_class")
    _mlp(m, f"{dt}.bezier_proposal_coord", o, "bezier_proposal_coord", 3)
    _linear(m, f"{dt}.ctrl_point_class.0", o, "ctrl_point_class")
    _linear(m, f"{dt}.ctrl_point_text.0", o, "ctrl_point_text")
    _mlp(m, f"{dt}.ctrl_point_coord.0", o, "ctrl_point_coord", 3)
    if t.BOUNDARY_HEAD:
        _mlp(m, f"{dt}.boundary_offset.0", o, "boundary_offset", 3)

    # ---- roi_heads (tracker) ----
    r = "roi_heads"
    for i in range(cfg.MODEL.ASSO_HEAD.NUM_FC):
        _linear(m, f"{r}.asso_head.fc{i + 1}", r, f"asso_head/fc{i + 1}")
    if cfg.MODEL.ROI_HEADS.WITH_RESR:
        _linear(m, f"{r}.rescoring_head", r, "rescoring_head")
    if not cfg.MODEL.ASSO_HEAD.NO_POS_EMB:
        m[f"{r}.pos_emb.weight"] = ("copy", (r, "pos_emb"))
        if cfg.MODEL.ASSO_HEAD.WITH_TEMP_EMB:
            m[f"{r}.temp_emb.weight"] = ("copy", (r, "temp_emb"))
    nwl = cfg.MODEL.ASSO_HEAD.NUM_WEIGHT_LAYERS
    if nwl > 0:
        for pred in ("asso_predictor", "local_asso_predictor"):
            _mlp(m, f"{r}.{pred}.q_proj", r, f"{pred}/q_proj", nwl)
            _mlp(m, f"{r}.{pred}.k_proj", r, f"{pred}/k_proj", nwl)

    variant = cfg.MODEL.ROI_HEADS.NAME
    def matcher_keys(tname, oname, n_enc, n_dec, dec_ffn=True):
        for i in range(n_enc):
            te = f"{r}.{tname}.encoder.layers.{i}"
            oe = f"{oname}/enc_{i}"
            _mha(m, f"{te}.self_attn", r, f"{oe}/self_attn")
            _linear(m, f"{te}.linear1", r, f"{oe}/linear1")
            _linear(m, f"{te}.linear2", r, f"{oe}/linear2")
        for i in range(n_dec):
            td = f"{r}.{tname}.decoder.layers.{i}"
            od = f"{oname}/dec_{i}"
            _mha(m, f"{td}.multihead_attn", r, f"{od}/cross_attn")
            if dec_ffn:
                _linear(m, f"{td}.linear1", r, f"{od}/linear1")
                _linear(m, f"{td}.linear2", r, f"{od}/linear2")

    a = cfg.MODEL.ASSO_HEAD
    if variant == "LSTMatcher":
        matcher_keys("long_term_matcher", "long_term_matcher", a.NUM_ENCODER_LAYERS, a.NUM_DECODER_LAYERS)
        matcher_keys("short_term_matcher", "short_term_matcher", a.NUM_ENCODER_LAYERS, a.NUM_DECODER_LAYERS)
    else:  # SHA_FFN_CRSATTN
        matcher_keys("shared_matcher", "shared_matcher", 0, a.NUM_DECODER_LAYERS, dec_ffn=False)
    return m


def apply_transform(kind: str, tensor: np.ndarray, cfg):
    if kind == "copy":
        return tensor
    if kind == "linear_w":
        return tensor.T
    if kind == "conv_w":
        return tensor.transpose(2, 3, 1, 0)
    if kind == "point_embed":
        t = cfg.MODEL.TRANSFORMER
        return tensor.reshape(t.NUM_QUERIES, t.NUM_POINTS, t.HIDDEN_DIM)
    raise ValueError(kind)


def set_path(tree, node, path, value):
    cur = tree.setdefault(node, {})
    parts = path.split("/")
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
    cur[parts[-1]] = value


def convert(state_dict: Dict[str, np.ndarray], cfg) -> Dict:
    """torch flat state_dict -> our nested {'params': ...} tree."""
    # normalize raw-DeepSolo layout to the decoupled one
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("detection_transformer.backbone.0.backbone."):
            k = k.replace("detection_transformer.backbone.", "backbone.")
        sd[k] = np.asarray(v)

    key_map = build_key_map(cfg)
    tree: Dict = {}
    missing, used = [], set()
    for tk, (kind, target) in key_map.items():
        if kind in ("mha_in_w", "mha_in_b"):
            if tk not in sd:
                missing.append(tk)
                continue
            w = sd[tk]
            node, name = target
            parts = np.split(w, 3, axis=0)
            for pn, pv in zip(("q_proj", "k_proj", "v_proj"), parts):
                leaf = "kernel" if kind == "mha_in_w" else "bias"
                set_path(tree, node, f"{name}/{pn}/{leaf}", pv.T if kind == "mha_in_w" else pv)
            used.add(tk)
            continue
        if tk not in sd:
            missing.append(tk)
            continue
        node, *path_parts = target
        set_path(tree, node, "/".join(path_parts), apply_transform(kind, sd[tk], cfg))
        used.add(tk)
    unused = [k for k in sd if k not in used]
    return {"params": tree}, missing, unused


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--config", default="configs/GoMatching_ICDAR15.yaml")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import torch

    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.checkpoint import save_params

    cfg = setup_eval_cfg(args.config, ["MODEL.WEIGHTS", "''"])
    if args.input.endswith(".pkl"):
        # detectron2 model-zoo format (AdetCheckpointer, adet_checkpoint.py:6-36):
        # a pickle of {'model': {name: ndarray}, '__author__'/'matching_heuristics'...}
        import pickle

        with open(args.input, "rb") as f:
            ckpt = pickle.load(f, encoding="latin1")
    else:
        ckpt = torch.load(args.input, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    params, missing, unused = convert(sd, cfg)
    if missing:
        print(f"WARNING: {len(missing)} expected keys missing, e.g. {missing[:5]}")
    if unused:
        print(f"note: {len(unused)} checkpoint keys unused, e.g. {unused[:5]}")
    save_params(args.output, params)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
