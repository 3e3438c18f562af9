"""Golden tracker-chain parity: JAX tracker vs the ACTUAL PyTorch reference.

tests/golden/make_golden_tracker.py ran the reference GoMatching tracking chain
(gom_lstmatcher.py:366-651) + both roi-head variants on CPU over a synthetic
6-frame clip with appearing / disappearing / re-appearing tracks, and committed
the roi_heads state_dicts, inputs, and resulting track ids. Here the weights go
through the production converter and our Tracker + LSTMatcherHead must
reproduce the reference's track-id assignments EXACTLY — short-term matching,
long-term window re-matching with decay + center gating + IoU fusion, id-count
bookkeeping quirks, and short-track removal — plus GoMatching.detection()'s
score fusion / threshold / scaling on the detection bundle.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden", "data", "tracker_tiny.npz")

sys.path.insert(0, os.path.join(os.path.dirname(HERE), "tools"))
sys.path.insert(0, os.path.join(HERE, "golden"))

H, W = 96, 128
NPTS = 5

TRACK_KW = dict(
    test_len=4,
    overlap_thresh=0.2,
    min_track_len=2,
    max_center_dist=0.3,
    decay_time=0.9,
    with_iou=True,
    not_mult_thresh=True,
)


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def _head_and_params(golden, variant):
    from convert_torch_weights import convert
    from ref_loader import tiny_cfg

    from gomatching_tpu.models.lst_matcher import LSTMatcherHead

    cfg = tiny_cfg()
    if variant == "shared":
        cfg.MODEL.ROI_HEADS.NAME = "SHA_FFN_CRSATTN"
    if variant == "lstpe":
        cfg.MODEL.ASSO_HEAD.NO_POS_EMB = False
        cfg.MODEL.ASSO_HEAD.WITH_TEMP_EMB = True
    pre = f"trk.{variant}.sd."
    sd = {k[len(pre) :]: golden[k] for k in golden.files if k.startswith(pre)}
    tree, missing, unused = convert(sd, cfg)
    roi_missing = [k for k in missing if k.startswith("roi_heads.")]
    assert not roi_missing, roi_missing[:5]
    assert not [k for k in unused if "matcher" in k or "head" in k], unused[:5]

    a = cfg.MODEL.ASSO_HEAD
    head = LSTMatcherHead(
        hidden_dim=cfg.MODEL.TRANSFORMER.HIDDEN_DIM,
        num_points=NPTS,
        feature_dim=a.FC_DIM,
        num_fc=a.NUM_FC,
        num_heads=a.NUM_HEADS,
        num_encoder_layers=a.NUM_ENCODER_LAYERS,
        num_decoder_layers=a.NUM_DECODER_LAYERS,
        num_weight_layers=a.NUM_WEIGHT_LAYERS,
        variant={"LSTMatcher": "lst", "SHA_FFN_CRSATTN": "shared"}[
            cfg.MODEL.ROI_HEADS.NAME
        ],
        no_pos_emb=cfg.MODEL.ASSO_HEAD.NO_POS_EMB,
        with_temp_emb=cfg.MODEL.ASSO_HEAD.WITH_TEMP_EMB,
    )
    return head, {"params": tree["params"]["roi_heads"]}


@pytest.mark.parametrize("variant", ["lst", "shared", "lstpe"])
def test_tracking_matches_reference(golden, variant):
    from gomatching_tpu.models.lst_matcher import LSTMatcherHead
    from gomatching_tpu.tracking.tracker import FrameDetections, Tracker

    head, params = _head_and_params(golden, variant)
    use_pos = variant == "lstpe"

    def associate_fn(tokens, valid, short_term, boxes=None, times=None):
        return head.apply(
            params,
            jnp.asarray(tokens),
            jnp.asarray(valid),
            short_term,
            False,
            None if boxes is None else jnp.asarray(boxes),
            None if times is None else jnp.asarray(times),
            method=LSTMatcherHead.associate,
        )

    def reid_fn(qf):
        return np.asarray(head.apply(params, jnp.asarray(qf), method=LSTMatcherHead.reid))

    tracker = Tracker(associate_fn, use_pos_emb=use_pos, with_temp_emb=use_pos,
                      **TRACK_KW)
    p = f"trk.{variant}"
    n_frames = len([k for k in golden.files if k.startswith(f"{p}.in.qf")])
    for fi in range(n_frames):
        qf = golden[f"{p}.in.qf{fi}"]
        n = qf.shape[0]
        det = FrameDetections(
            boxes=golden[f"{p}.in.boxes{fi}"],
            scores=golden[f"{p}.in.scores{fi}"],
            ctrl_points=np.zeros((n, NPTS * 2), np.float32),
            recs=np.zeros((n, NPTS), np.int64),
            bd=np.zeros((n, NPTS, 4), np.float32),
            reid=reid_fn(qf),
            image_hw=(H, W),
        )
        tracker.step(det)
        np.testing.assert_array_equal(
            det.track_ids, golden[f"{p}.out.ids{fi}"], err_msg=f"{variant} frame {fi}"
        )
    assert tracker.id_count == int(golden[f"{p}.out.id_count"])

    frames = tracker.remove_short_tracks()
    for fi, f in enumerate(frames):
        np.testing.assert_array_equal(
            f.track_ids, golden[f"{p}.out.pruned_ids{fi}"], err_msg=f"pruned {fi}"
        )
        if f.reid is not None:
            np.testing.assert_allclose(
                f.reid, golden[f"{p}.out.reid{fi}"], rtol=1e-4, atol=1e-5
            )


def test_detection_matches_reference(golden):
    """GoMatching.detection parity: fusion, threshold selector, coordinate
    scaling, rec argmax — against GoMatchingModel.detect's static-slot output."""
    from ref_loader import tiny_cfg

    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.models.gomatching import GoMatchingModel, build_model

    cfg = tiny_cfg()
    cfg.MODEL.WEIGHTS = ""
    cfg.VIDEO_TEST.NMS_THRESH = 1.01  # reference applies NMS later, in inference()
    model = build_model(cfg)
    params = init_params(model, image_size=(64, 64))

    out = {
        "pred_logits": jnp.asarray(golden["det.in.cls"]),
        "re_pred_logits": jnp.asarray(golden["det.in.cls_re"]),
        "pred_ctrl_points": jnp.asarray(golden["det.in.coord"]),
        "pred_text_logits": jnp.asarray(golden["det.in.text"]),
        "pred_bd_points": jnp.asarray(golden["det.in.bd"]),
        "query_features": jnp.asarray(golden["det.in.qf"]),
    }
    hw = jnp.asarray([[H, W]], jnp.float32)
    det = model.apply(
        params,
        out,
        hw,
        float(golden["det.thresh"]),
        method=GoMatchingModel.detect,
    )
    sel = np.asarray(det["valid"][0])
    np.testing.assert_array_equal(sel, golden["det.out.selector"])
    np.testing.assert_allclose(
        np.asarray(det["scores"][0])[sel], golden["det.out.scores"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(det["ctrl_points"][0])[sel],
        golden["det.out.ctrl_points"],
        rtol=1e-5,
        atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(det["recs"][0])[sel], golden["det.out.recs"]
    )
    np.testing.assert_allclose(
        np.asarray(det["bd"][0])[sel], golden["det.out.bd"], rtol=1e-5, atol=1e-4
    )


def test_training_losses_match_reference(golden):
    """Tracker TRAINING losses vs the reference: loss_res (4GM Hungarian +
    focal, lstmatcher.py:237-268) and long/short association losses
    (_forward_asso :271-330 incl. _get_asso_gt and detr_asso_loss) on a
    3-frame clip with a GT-empty frame, through our full Trainer._loss_fn
    chain (fused-score thresholding, reid head, decode-all matcher, padded
    CE-with-background)."""
    from convert_torch_weights import convert
    from ref_loader import tiny_cfg

    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.engine.train import Trainer
    from gomatching_tpu.models.gomatching import build_model

    p = "trainloss"
    thresh = float(golden[f"{p}.thresh"])
    cfg = tiny_cfg()
    cfg.MODEL.WEIGHTS = ""
    cfg.MODEL.TRANSFORMER.INFERENCE_TH_TRAIN = thresh
    cfg.MODEL.ASSO_HEAD.ASSO_THRESH = thresh
    sd = {k[len("trk.lst.sd.") :]: golden[k] for k in golden.files
          if k.startswith("trk.lst.sd.")}
    tree, _, _ = convert(sd, cfg)

    model = build_model(cfg)
    params = init_params(model, image_size=(64, 64))
    params["params"]["roi_heads"] = tree["params"]["roi_heads"]
    trainer = Trainer(cfg, model, params)
    assert not trainer.use_dropout  # deterministic comparison

    T = golden[f"{p}.pred_logits"].shape[0]
    spot_out = {
        "pred_logits": golden[f"{p}.pred_logits"],
        "re_pred_logits": golden[f"{p}.re_logits"],
        "pred_ctrl_points": golden[f"{p}.ctrl"],
        "pred_bd_points": golden[f"{p}.bd"],
        "query_features": golden[f"{p}.qf"],
    }
    targets = {
        "gt_ctrl": [golden[f"{p}.res_ctrl{t}"] for t in range(T)],
        "gt_boxes": [
            golden[f"{p}.gt_boxes{t}"] / np.asarray([W, H, W, H], np.float32)
            for t in range(T)
        ],
        "gt_ids": [golden[f"{p}.gt_ids{t}"] for t in range(T)],
    }
    batch = trainer.prepare_batch(spot_out, targets)
    batch["query_features"] = jnp.asarray(spot_out["query_features"])
    _, losses = trainer._loss_fn(trainer.state.trainable, trainer.state.frozen, batch)

    np.testing.assert_allclose(
        float(losses["loss_res"]), float(golden[f"{p}.loss_res"]), rtol=1e-4,
        err_msg="loss_res")
    np.testing.assert_allclose(
        float(losses["loss_long_asso"]), float(golden[f"{p}.loss_long"]), rtol=1e-4,
        err_msg="loss_long_asso")
    np.testing.assert_allclose(
        float(losses["loss_short_asso"]), float(golden[f"{p}.loss_short"]), rtol=1e-3,
        err_msg="loss_short_asso")
