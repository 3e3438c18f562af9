#!/usr/bin/env python
"""One-shot dump: reference GoMatching tracker chain on synthetic clips.

Runs the ACTUAL reference code (/root/reference/gomatching/modeling/...) on CPU:

  1. ``GoMatching.detection`` (gom_lstmatcher.py:579-651) — rescore fusion
     max(score, re_score), thresholding, coordinate scaling, rec argmax — on a
     random head-output bundle.
  2. The full tracking driver over a 6-frame synthetic clip with appearing /
     disappearing / re-appearing tracks: per-frame reid via FCHead4Query,
     ``run_short_term_match`` (gom_lstmatcher.py:405-465) per adjacent pair and
     ``run_long_term_match`` (:467-564) for unmatched detections, with the
     id-count bookkeeping of ``batch_inference`` (:366-403), then
     ``_remove_short_track`` (:566-577). Both LSTMatcher (GoMatching) and
     SHA_FFN_CRSATTN (GoMatching++) roi-heads are dumped.

Writes tests/golden/data/tracker_tiny.npz with the roi_heads state_dicts
(roi_heads.-prefixed for the converter), all inputs, and the reference's
resulting track ids / detection fields.

Usage: python tests/golden/make_golden_tracker.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.getcwd())

from ref_loader import load_reference_gom_meta, tiny_cfg  # noqa: E402

GOM_MOD, LST_MOD, D2S = load_reference_gom_meta()

import torch  # noqa: E402
from torch import nn  # noqa: E402

# sha_ffn_crsattn imports the same facade set as lstmatcher — import after it
import gomatching.modeling.roi_heads.shared_ffn_crsattn as SHA_MOD  # noqa: E402

H, W = 96, 128
NPTS = 5
HID = 64
FDIM = 64

# tracker hyper-params — exercise decay + center gating + iou fusion
TRACK_KW = dict(
    test_len=4,
    overlap_thresh=0.2,
    min_track_len=2,
    max_center_dist=0.3,
    decay_time=0.9,
    with_iou=True,
    not_mult_thresh=True,
)


def build_roi_heads(variant: str, seed: int):
    cfg = tiny_cfg()
    torch.manual_seed(seed)
    if variant in ("lst", "lstpe"):
        if variant == "lstpe":  # box + temporal positional embeddings active
            cfg.MODEL.ASSO_HEAD.NO_POS_EMB = False
            cfg.MODEL.ASSO_HEAD.WITH_TEMP_EMB = True
        obj = LST_MOD.LSTMatcher.__new__(LST_MOD.LSTMatcher)
        nn.Module.__init__(obj)
        obj._init_asso_head(cfg)
    else:
        cfg.MODEL.ROI_HEADS.NAME = "SHA_FFN_CRSATTN"
        obj = SHA_MOD.SHA_FFN_CRSATTN.__new__(SHA_MOD.SHA_FFN_CRSATTN)
        nn.Module.__init__(obj)
        obj._init_asso_head(cfg)
    obj.eval()
    return obj, cfg


def build_gom(roi_heads, cfg):
    gom = GOM_MOD.GoMatching.__new__(GOM_MOD.GoMatching)
    nn.Module.__init__(gom)
    gom.roi_heads = roi_heads
    gom.test_score_threshold = cfg.MODEL.TRANSFORMER.INFERENCE_TH_TEST
    for k, v in TRACK_KW.items():
        setattr(gom, k, v)
    gom.eval()
    return gom


# ---------------------------------------------------------------------------
# synthetic clip: per-track latent query features + smooth boxes, with
# appear/disappear/re-appear structure to force every matcher path
# ---------------------------------------------------------------------------
TRACKS = "ABCDE"
#        frame:   0      1       2        3       4      5
CLIP = ["ABC", "ABCD", "ABDE", "ABC", "ABCD", "A"]
# C misses frames 2 (gap -> long-term re-match at frame 3)
# E appears only in frame 2 (track len 1 -> pruned by _remove_short_track)


def make_clip(rng):
    base_q = {t: rng.randn(NPTS, HID).astype(np.float32) * 2.0 for t in TRACKS}
    base_box = {
        t: np.array([10 + 20 * i, 10 + 12 * i, 30 + 20 * i, 30 + 12 * i], np.float32)
        for i, t in enumerate(TRACKS)
    }
    frames = []
    for fi, present in enumerate(CLIP):
        n = len(present)
        qf = np.stack(
            [base_q[t] + rng.randn(NPTS, HID).astype(np.float32) * 0.05 for t in present]
        )
        boxes = np.stack(
            [base_box[t] + np.array([2, 1, 2, 1], np.float32) * fi for t in present]
        )
        scores = 0.5 + 0.4 * rng.rand(n).astype(np.float32)
        frames.append(dict(qf=qf, boxes=boxes, scores=scores, present=present))
    return frames


def run_reference_tracking(gom, frames):
    """The batch_inference driver loop (gom_lstmatcher.py:366-403) minus the
    spotter call — per-frame Instances come from the synthetic clip."""
    Instances = D2S.Instances
    Boxes = D2S.Boxes
    instances = []
    id_count = 0
    with torch.no_grad():
        for frame_id, fr in enumerate(frames):
            qf = torch.from_numpy(fr["qf"])
            inst = Instances((H, W))
            inst.reid_features = gom.roi_heads.asso_head(qf)
            inst.pred_boxes = Boxes(torch.from_numpy(fr["boxes"]))
            inst.scores = torch.from_numpy(fr["scores"])
            inst.pred_classes = torch.zeros(len(fr["scores"]), dtype=torch.int64)
            inst.ctrl_points = torch.zeros((len(fr["scores"]), NPTS * 2))
            inst.recs = torch.zeros((len(fr["scores"]), NPTS), dtype=torch.int64)
            inst.bd = torch.zeros((len(fr["scores"]), NPTS, 4))
            instances.append(inst)

            if frame_id == 0:
                instances[0].track_ids = torch.arange(1, len(instances[0]) + 1)
                id_count = len(instances[0]) + 1
            elif frame_id == 1:
                instances[0:2], id_count = gom.run_short_term_match(
                    instances[0:2], id_count=id_count
                )
            else:
                instances[frame_id - 1 : frame_id + 1], cur_id = gom.run_short_term_match(
                    instances[frame_id - 1 : frame_id + 1]
                )
                if -1 in cur_id:
                    win_st = max(0, frame_id + 1 - gom.test_len)
                    instances[win_st : frame_id + 1], id_count = gom.run_long_term_match(
                        instances[win_st : frame_id + 1],
                        k=min(gom.test_len - 1, frame_id),
                        id_count=id_count,
                        cur_id=cur_id,
                    )
            assert len(instances[-1].track_ids) == len(
                torch.unique(instances[-1].track_ids)
            )
    track_ids = [inst.track_ids.numpy().copy() for inst in instances]
    pruned = gom._remove_short_track(instances)
    pruned_ids = [inst.track_ids.numpy().copy() for inst in pruned]
    reid = [inst.reid_features.numpy().copy() for inst in pruned]
    return track_ids, pruned_ids, reid, id_count


def dump_detection(out: dict, seed: int):
    """GoMatching.detection on a random head-output bundle (thresholds chosen so
    some-but-not-all queries survive)."""
    lst, cfg = build_roi_heads("lst", seed)
    gom = build_gom(lst, cfg)
    rng = np.random.RandomState(seed + 100)
    nq = cfg.MODEL.TRANSFORMER.NUM_QUERIES
    voc = cfg.MODEL.TRANSFORMER.VOC_SIZE
    cls = rng.randn(1, nq, NPTS, 1).astype(np.float32)
    cls_re = rng.randn(1, nq, NPTS, 1).astype(np.float32)
    coord = rng.rand(1, nq, NPTS, 2).astype(np.float32)
    text = rng.randn(1, nq, NPTS, voc + 1).astype(np.float32)
    bd = rng.rand(1, nq, NPTS, 4).astype(np.float32)
    qf = rng.randn(1, nq, NPTS, HID).astype(np.float32)
    # pick the median fused score as threshold so the selector is selective
    with torch.no_grad():
        prob0 = torch.sigmoid(torch.from_numpy(cls).mean(-2))[..., 0]
        re_prob0 = torch.sigmoid(torch.from_numpy(cls_re).mean(-2))[..., 0]
        fused0 = torch.maximum(prob0, re_prob0)[0]
    thresh = float(fused0.median())
    gom.test_score_threshold = thresh
    with torch.no_grad():
        results = gom.detection(
            torch.from_numpy(cls),
            torch.from_numpy(cls_re),
            torch.from_numpy(coord),
            torch.from_numpy(text),
            torch.from_numpy(bd),
            torch.from_numpy(qf),
            [(H, W)],
        )
    r = results[0]
    for name, arr in [
        ("cls", cls), ("cls_re", cls_re), ("coord", coord),
        ("text", text), ("bd", bd), ("qf", qf),
    ]:
        out[f"det.in.{name}"] = arr
    out["det.thresh"] = np.float32(thresh)
    out["det.out.scores"] = r.scores.numpy()
    out["det.out.ctrl_points"] = r.ctrl_points.numpy()
    out["det.out.recs"] = r.recs.numpy()
    out["det.out.bd"] = r.bd.numpy()
    out["det.out.query_features"] = r.query_features.numpy()
    # which query slots survived (for mask comparison): recompute the selector
    prob = torch.sigmoid(torch.from_numpy(cls).mean(-2))[..., 0]
    re_prob = torch.sigmoid(torch.from_numpy(cls_re).mean(-2))[..., 0]
    out["det.out.selector"] = (torch.maximum(prob, re_prob)[0] > thresh).numpy()


def main():
    out = {}
    dump_detection(out, seed=3)
    dump_train_losses(out, seed=7)

    for variant in ("lst", "shared", "lstpe"):
        roi, cfg = build_roi_heads(variant, seed=7)
        gom = build_gom(roi, cfg)
        rng = np.random.RandomState(11)
        frames = make_clip(rng)
        track_ids, pruned_ids, reid, id_count = run_reference_tracking(gom, frames)
        p = f"trk.{variant}"
        for fi, fr in enumerate(frames):
            out[f"{p}.in.qf{fi}"] = fr["qf"]
            out[f"{p}.in.boxes{fi}"] = fr["boxes"]
            out[f"{p}.in.scores{fi}"] = fr["scores"]
            out[f"{p}.out.ids{fi}"] = track_ids[fi]
            out[f"{p}.out.pruned_ids{fi}"] = pruned_ids[fi]
            out[f"{p}.out.reid{fi}"] = reid[fi]
        out[f"{p}.out.id_count"] = np.int64(id_count)
        for k, v in roi.state_dict().items():
            out[f"{p}.sd.roi_heads.{k}"] = v.numpy()

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "tracker_tiny.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB, {len(out)} arrays)")





def dump_train_losses(out, seed):
    """Reference training losses: loss_res (4GM Hungarian + focal,
    lstmatcher.py:237-268) and the long/short association losses
    (_forward_asso train path :271-330, _get_asso_gt :384-428,
    detr_asso_loss :431-460) on a synthetic 3-frame clip with a GT-empty
    frame. Our Trainer._loss_fn must reproduce all three values."""
    from adet.modeling.model.matcher import build_point_matcher

    lst, cfg = build_roi_heads("lst", seed)
    lst.train()
    # attrs the losses read that live on LSTMatcher.__init__ (bypassed by the
    # __new__ construction): lstmatcher.py:64-77
    lst.point_matcher = build_point_matcher(cfg)
    lst.num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    lst.focal_alpha = cfg.MODEL.TRANSFORMER.LOSS.FOCAL_ALPHA
    lst.focal_gamma = cfg.MODEL.TRANSFORMER.LOSS.FOCAL_GAMMA

    T, nq, npts, hid = 3, 8, NPTS, HID
    rng = np.random.RandomState(seed + 50)
    pred_logits = rng.randn(T, nq, npts, 1).astype(np.float32)
    rng.randn(T, nq, npts, 1)  # keep the stream position stable
    ctrl = rng.rand(T, nq, npts, 2).astype(np.float32)
    qf = rng.randn(T, nq, npts, hid).astype(np.float32)
    # re logits must come from the rescoring head so the JAX side (which
    # recomputes them from query_features) sees identical values
    with torch.no_grad():
        re_logits = lst.rescoring_head(torch.from_numpy(qf)).numpy()
    # boxes via boundary extremes: bd rows all equal (x1,y1,x2,y2), x1<x2, y1<y2
    x1 = rng.rand(T, nq).astype(np.float32) * 0.5
    y1 = rng.rand(T, nq).astype(np.float32) * 0.5
    x2 = x1 + 0.1 + rng.rand(T, nq).astype(np.float32) * 0.3
    y2 = y1 + 0.1 + rng.rand(T, nq).astype(np.float32) * 0.3
    bd = np.stack([x1, y1, x2, y2], -1)[:, :, None, :].repeat(npts, axis=2)

    scores = 1 / (1 + np.exp(-pred_logits.mean(2)[..., 0]))
    re_s = 1 / (1 + np.exp(-re_logits.mean(2)[..., 0]))
    fused = np.maximum(scores, re_s)
    thresh = float(np.median(fused))  # keep ~half the slots

    # GT: frames 0/1 have 3 tracked instances; frame 2 is EMPTY
    gt_boxes, gt_ids = [], []
    for t in range(T):
        if t == 2:
            gt_boxes.append(np.zeros((0, 4), np.float32))
            gt_ids.append(np.zeros((0,), np.int64))
        else:
            # overlap some proposals: reuse 3 proposal boxes + jitter
            base = np.stack([x1[t, :3], y1[t, :3], x2[t, :3], y2[t, :3]], -1)
            gt_boxes.append((base + rng.randn(3, 4).astype(np.float32) * 0.01) * [W, H, W, H])
            gt_ids.append(np.asarray([1, 2, 3], np.int64))

    Instances, Boxes = D2S.Instances, D2S.Boxes
    proposals, targets_inst = [], []
    for t in range(T):
        pi = Instances((H, W))
        pi.objectness_logits = torch.from_numpy(fused[t])
        pi.query_features = torch.from_numpy(qf[t])
        pi.pred_boxes = Boxes(torch.from_numpy(
            np.stack([x1[t] * W, y1[t] * H, x2[t] * W, y2[t] * H], -1)))
        proposals.append(pi)
        ti = Instances((H, W))
        ti.gt_boxes = Boxes(torch.from_numpy(gt_boxes[t]))
        ti.gt_instance_ids = torch.from_numpy(gt_ids[t])
        targets_inst.append(ti)

    lst.asso_thresh_train = thresh
    with torch.no_grad():
        asso_losses = lst._forward_asso(proposals, targets_inst)
        res_targets = [
            {"labels": torch.zeros(len(g), dtype=torch.int64),
             "ctrl_points": torch.from_numpy(
                 ctrl[t][: len(g)] * 0 + rng.rand(len(g), npts, 2).astype(np.float32))}
            for t, g in enumerate(gt_ids)
        ]
        # use gt ctrl points near some predictions for a non-trivial match
        for t in range(T):
            n = len(gt_ids[t])
            if n:
                res_targets[t]["ctrl_points"] = torch.from_numpy(
                    ctrl[t, :n] + rng.randn(n, npts, 2).astype(np.float32) * 0.02)
        res_loss = lst.loss_res(
            {"re_pred_logits": torch.from_numpy(re_logits),
             "pred_ctrl_points": torch.from_numpy(ctrl)},
            res_targets,
        )

    p = "trainloss"
    out[f"{p}.pred_logits"] = pred_logits
    out[f"{p}.re_logits"] = re_logits
    out[f"{p}.ctrl"] = ctrl
    out[f"{p}.qf"] = qf
    out[f"{p}.bd"] = bd
    out[f"{p}.thresh"] = np.float32(thresh)
    for t in range(T):
        out[f"{p}.gt_boxes{t}"] = gt_boxes[t]
        out[f"{p}.gt_ids{t}"] = gt_ids[t]
        out[f"{p}.res_ctrl{t}"] = res_targets[t]["ctrl_points"].numpy()
    out[f"{p}.loss_long"] = np.float64(float(asso_losses["loss_long_asso"]))
    out[f"{p}.loss_short"] = np.float64(float(asso_losses["loss_short_asso"]))
    out[f"{p}.loss_res"] = np.float64(float(res_loss["loss_res"]))


if __name__ == "__main__":
    main()
