#!/usr/bin/env python
"""One-shot dump: reference SetCriterion (DeepSolo pretraining losses) outputs.

Runs the ACTUAL reference criterion + Hungarian matchers
(third_party/adet/modeling/model/losses.py:44-297, matcher.py:28-261) on CPU
over synthetic head outputs + targets — including aux decoder layers, encoder
(two-stage bezier) losses, an empty-GT image, and '###'-style all-unknown
texts — and commits every per-loss value. The JAX SpotterCriterion must
reproduce loss[k] * weight[k] for every key.

Usage: python tests/golden/make_golden_losses.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.getcwd())

from ref_loader import load_reference_gom_meta, tiny_cfg  # noqa: E402

load_reference_gom_meta()  # installs the adet skeletons + d2 comm facade

import torch  # noqa: E402
from adet.modeling.model.losses import SetCriterion  # noqa: E402
from adet.modeling.model.matcher import build_matcher  # noqa: E402

B, NQ, NPTS, VOC, S, TLEN = 2, 8, 5, 10, 60, 25


def build_criterion(cfg):
    """Mirror TransformerPureDetector.__init__ (text_spotter.py:131-178)."""
    loss_cfg = cfg.MODEL.TRANSFORMER.LOSS
    bezier_matcher, point_matcher = build_matcher(cfg)
    weight_dict = {
        "loss_ce": loss_cfg.POINT_CLASS_WEIGHT,
        "loss_texts": loss_cfg.POINT_TEXT_WEIGHT,
        "loss_ctrl_points": loss_cfg.POINT_COORD_WEIGHT,
        "loss_bd_points": loss_cfg.BOUNDARY_WEIGHT,
    }
    enc_weight_dict = {
        "loss_bezier": loss_cfg.BEZIER_COORD_WEIGHT,
        "loss_ce": loss_cfg.BEZIER_CLASS_WEIGHT,
    }
    aux = {}
    for i in range(cfg.MODEL.TRANSFORMER.DEC_LAYERS - 1):
        aux.update({k + f"_{i}": v for k, v in weight_dict.items()})
    aux.update({k + "_enc": v for k, v in enc_weight_dict.items()})
    weight_dict.update(aux)
    criterion = SetCriterion(
        1,
        bezier_matcher,
        point_matcher,
        weight_dict,
        ["labels", "beziers"],
        loss_cfg.BEZIER_SAMPLE_POINTS,
        ["labels", "texts", "ctrl_points", "bd_points"],
        cfg.MODEL.TRANSFORMER.VOC_SIZE,
        NPTS,
        focal_alpha=loss_cfg.FOCAL_ALPHA,
        focal_gamma=loss_cfg.FOCAL_GAMMA,
    )
    return criterion, weight_dict


def head_bundle(rng):
    return {
        "pred_logits": rng.randn(B, NQ, NPTS, 1).astype(np.float32),
        "pred_text_logits": rng.randn(B, NQ, NPTS, VOC + 1).astype(np.float32),
        "pred_ctrl_points": rng.rand(B, NQ, NPTS, 2).astype(np.float32),
        "pred_bd_points": rng.rand(B, NQ, NPTS, 4).astype(np.float32),
    }


def main():
    cfg = tiny_cfg()
    torch.manual_seed(0)
    criterion, weight_dict = build_criterion(cfg)

    rng = np.random.RandomState(7)
    final = head_bundle(rng)
    aux0 = head_bundle(rng)
    enc = {
        "pred_logits": rng.randn(B, S, 1).astype(np.float32),
        "pred_beziers": rng.rand(B, S, 8).astype(np.float32),
    }
    # image 0: 3 instances (one with an all-unknown '###'-style text);
    # image 1: EMPTY (the zero-GT edge case)
    n0 = 3
    texts = np.full((n0, TLEN), VOC, np.int64)
    texts[0, :3] = [1, 2, 3]
    texts[1, :2] = [4, 5]
    texts[2, 0] = VOC - 1  # unknown class only -> CTC ignore (losses.py:165-168)
    tg0 = {
        "labels": np.zeros((n0,), np.int64),
        "beziers": rng.rand(n0, 4, 2).astype(np.float32),
        "ctrl_points": rng.rand(n0, NPTS, 2).astype(np.float32),
        "texts": texts,
        "bd_points": rng.rand(n0, NPTS, 4).astype(np.float32),
    }
    tg1 = {
        "labels": np.zeros((0,), np.int64),
        "beziers": np.zeros((0, 4, 2), np.float32),
        "ctrl_points": np.zeros((0, NPTS, 2), np.float32),
        "texts": np.zeros((0, TLEN), np.int64),
        "bd_points": np.zeros((0, NPTS, 4), np.float32),
    }

    outputs = {
        **{k: torch.from_numpy(v) for k, v in final.items()},
        "aux_outputs": [{k: torch.from_numpy(v) for k, v in aux0.items()}],
        "enc_outputs": {k: torch.from_numpy(v) for k, v in enc.items()},
    }
    targets = [
        {k: torch.from_numpy(v) for k, v in tg0.items()},
        {k: torch.from_numpy(v) for k, v in tg1.items()},
    ]
    with torch.no_grad():
        losses = criterion(outputs, targets)

    out = {}
    for name, arrs in (("final", final), ("aux0", aux0), ("enc", enc)):
        for k, v in arrs.items():
            out[f"in.{name}.{k}"] = v
    for k, v in tg0.items():
        out[f"tg0.{k}"] = v
    for k, v in losses.items():
        out[f"loss.{k}"] = np.float64(float(v))
        out[f"w.{k}"] = np.float64(weight_dict[k])
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "losses_tiny.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: " + ", ".join(sorted(k for k in losses)))


if __name__ == "__main__":
    main()
