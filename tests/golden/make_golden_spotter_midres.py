#!/usr/bin/env python
"""Per-run dump: reference DETECTION_TRANSFORMER_WOBACKBONE at PRODUCTION dims.

Same recipe as make_golden_spotter.py but with the shipped ICDAR15 model
configuration (hidden 256, 8 heads, 6+6 layers, 100 queries, 25 points,
voc 37) on mid-resolution features (480x640 input -> stride-8 level 60x80),
fp32 on CPU. Closes the scale gap of the committed tiny golden: level
arithmetic, two-stage top-k over ~6.4k tokens, padding and the production
sampler all run at realistic extents (detection_transformer_wobackbone.py:159).

Not committed — regenerated per test run (tests/test_golden_spotter_midres.py)
like the backbone goldens, because the fp32 state_dict is ~100 MB.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.getcwd())

CHANNELS = (512, 1024, 2048)  # resnet table, detection_transformer_wobackbone.py:70
BASE_HW = (60, 80)  # stride-8 level of a 480x640 input


def prod_cfg():
    from gomatching_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.TRANSFORMER.DROPOUT = 0.0
    return cfg


def main(path: str, pad_frac: float = 0.0, case: str = "sq", seed: int = 0,
         base_hw=BASE_HW):
    from ref_loader import load_reference_adet

    load_reference_adet()

    import torch
    from adet.layers.pos_encoding import PositionalEncoding2D
    from adet.modeling.model.detection_transformer_wobackbone import (
        DETECTION_TRANSFORMER_WOBACKBONE,
    )
    from adet.utils.misc import NestedTensor

    cfg = prod_cfg()
    torch.manual_seed(seed)
    model = DETECTION_TRANSFORMER_WOBACKBONE(cfg)
    model.eval()
    penc = PositionalEncoding2D(
        cfg.MODEL.TRANSFORMER.HIDDEN_DIM // 2,
        cfg.MODEL.TRANSFORMER.TEMPERATURE,
        normalize=True,
    )

    rng = np.random.RandomState(seed)
    out = {}
    feats, pos = [], []
    for lvl, c in enumerate(CHANNELS):
        h, w = base_hw[0] // 2**lvl, base_hw[1] // 2**lvl
        x = torch.from_numpy(rng.randn(1, c, h, w).astype(np.float32))
        mask = torch.zeros(1, h, w, dtype=torch.bool)
        if pad_frac > 0:
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
    for k, v in model.state_dict().items():
        out[f"sd.detection_transformer.{k}"] = v.numpy()

    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **out)
    return path


if __name__ == "__main__":
    main(os.path.join("/tmp", "spotter_midres.npz"))
