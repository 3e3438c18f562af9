#!/usr/bin/env python
"""One-shot dump: reference DETECTION_TRANSFORMER_WOBACKBONE on a tiny config.

Runs the actual reference spotter (/root/reference/third_party/adet/modeling/
model/detection_transformer_wobackbone.py:159) end-to-end on CPU with random
weights + random multi-scale features, and writes everything a parity test
needs into tests/golden/data/spotter_tiny.npz:

  sd.<torch_key>      the full torch state_dict (detection_transformer.-prefixed,
                      the decoupled-checkpoint layout of tools/decouple_deepsolo.py)
  feat{0,1,2}         (B, C_l, H_l, W_l) backbone features, NCHW
  mask{0,1,2}         (B, H_l, W_l) bool padding masks (True = padded)
  out.<name>          the 5 reference output tensors (pred_logits,
                      pred_text_logits, pred_ctrl_points, pred_bd_points,
                      query_features)

Two cases are dumped: 'sq' (no padding — the square inference regime) and
'pad' (right/bottom padding — exercises valid_ratios + token masking).

Usage: python tests/golden/make_golden_spotter.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.getcwd())

from ref_loader import load_reference_adet, tiny_cfg  # noqa: E402

load_reference_adet()

import torch  # noqa: E402
from adet.layers.pos_encoding import PositionalEncoding2D  # noqa: E402
from adet.modeling.model.detection_transformer_wobackbone import (  # noqa: E402
    DETECTION_TRANSFORMER_WOBACKBONE,
)
from adet.utils.misc import NestedTensor  # noqa: E402

CHANNELS = (512, 1024, 2048)  # resnet table, detection_transformer_wobackbone.py:70
BASE_HW = (24, 32)  # stride-8 level; /2 per level


def dump(case: str, pad_frac: float, seed: int, out: dict):
    cfg = tiny_cfg()
    torch.manual_seed(seed)
    model = DETECTION_TRANSFORMER_WOBACKBONE(cfg)
    model.eval()

    # the positional encoder the meta-arch pairs with the backbone
    # (gom_lstmatcher.py:149-154): N_steps = hidden_dim // 2, normalize=True
    penc = PositionalEncoding2D(
        cfg.MODEL.TRANSFORMER.HIDDEN_DIM // 2,
        cfg.MODEL.TRANSFORMER.TEMPERATURE,
        normalize=True,
    )

    rng = np.random.RandomState(seed)
    feats, pos = [], []
    for lvl, c in enumerate(CHANNELS):
        h, w = BASE_HW[0] // 2**lvl, BASE_HW[1] // 2**lvl
        x = torch.from_numpy(rng.randn(1, c, h, w).astype(np.float32))
        mask = torch.zeros(1, h, w, dtype=torch.bool)
        if pad_frac > 0:  # MaskedBackbone-style right/bottom padding
            mask[:, int(h * (1 - pad_frac)) :, :] = True
            mask[:, :, int(w * (1 - pad_frac)) :] = True
        feats.append(NestedTensor(x, mask))
        pos.append(penc(NestedTensor(x, mask)))
        out[f"{case}.feat{lvl}"] = x.numpy()
        out[f"{case}.mask{lvl}"] = mask.numpy()

    with torch.no_grad():
        res = model(feats, list(pos), (None, penc))

    for k, v in res.items():
        out[f"{case}.out.{k}"] = v.numpy()

    if case == "sq":  # weights are identical across cases (same seed/model)
        for k, v in model.state_dict().items():
            out[f"sd.detection_transformer.{k}"] = v.numpy()
    return out


def main():
    out = {}
    dump("sq", 0.0, seed=0, out=out)
    dump("pad", 0.25, seed=0, out=out)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "spotter_tiny.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB, {len(out)} arrays)")


if __name__ == "__main__":
    main()
