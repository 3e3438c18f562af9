"""SPMD data-parallel training path (reference DDP equivalent, train_net.py:186-209).

Engine level: Trainer.step_multi over an 8-device CPU mesh must produce the
mean of the per-clip single-device losses at the same initial params (DDP
averaging semantics), and padded frames (frame_valid) must contribute nothing.
CLI level: train_net.main trains on the mesh end-to-end and logs finite losses.
"""

import json
import os
import sys

import jax
import numpy as np
import pytest

TINY_OPTS = [
    "MODEL.TRANSFORMER.ENC_LAYERS", "1",
    "MODEL.TRANSFORMER.DEC_LAYERS", "1",
    "MODEL.TRANSFORMER.NUM_QUERIES", "8",
    "MODEL.TRANSFORMER.NUM_POINTS", "5",
    "MODEL.TRANSFORMER.HIDDEN_DIM", "64",
    "MODEL.TRANSFORMER.NHEADS", "4",
    "MODEL.TRANSFORMER.DIM_FEEDFORWARD", "64",
    "MODEL.TRANSFORMER.INFERENCE_TH_TRAIN", "0.0001",
    "MODEL.ASSO_HEAD.FC_DIM", "64",
    "MODEL.ASSO_HEAD.ASSO_THRESH", "0.0001",
    "MODEL.ASSO_HEAD.DROPOUT", "0.0",  # deterministic loss comparisons
    "MODEL.WEIGHTS", "''",
]

from gomatching_tpu.utils.synthetic import make_targets


def _clip(seed, T=2, H=48, W=64):
    images = np.random.RandomState(seed).randn(T, H, W, 3).astype(np.float32)
    return images, None, make_targets(T, npts=5)


@pytest.fixture(scope="module")
def setup():
    from gomatching_tpu.config import setup_train_cfg
    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.models.gomatching import build_model

    cfg = setup_train_cfg("configs/GoMatching_ICDAR15.yaml", list(TINY_OPTS))
    model = build_model(cfg)
    params = init_params(model, image_size=(64, 64))
    return cfg, model, params


def test_step_multi_equals_mean_of_single_device_losses(setup):
    from gomatching_tpu.engine.train import Trainer
    from gomatching_tpu.parallel import build_mesh

    cfg, model, params = setup
    n = 8
    assert len(jax.devices()) >= n
    clips = [_clip(seed) for seed in range(n)]

    single = Trainer(cfg, model, params)
    per_clip = []
    for images, hw, targets in clips:
        spot = single._spot(single.state.frozen, single.state.trainable, images, hw)
        spot = {k: np.asarray(v) for k, v in spot.items()}
        b = single.prepare_batch(spot, targets)
        b["query_features"] = np.asarray(spot["query_features"])
        total, _ = single._loss_fn(single.state.trainable, single.state.frozen, b)
        per_clip.append(float(total))

    mesh = build_mesh(devices=jax.devices()[:n])
    multi = Trainer(cfg, model, params, mesh=mesh)
    before = jax.tree.map(np.asarray, multi.state.trainable)
    metrics = multi.step_multi(clips)
    np.testing.assert_allclose(metrics["total_loss"], np.mean(per_clip), rtol=2e-5)
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), multi.state.trainable, before
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_frame_padding_contributes_nothing(setup):
    """A clip padded with an extra zero frame + frame_valid mask must produce
    the same loss as the unpadded clip."""
    from gomatching_tpu.engine.train import Trainer

    cfg, model, params = setup
    tr = Trainer(cfg, model, params)
    images, _, targets = _clip(3, T=2)

    spot = tr._spot(tr.state.frozen, tr.state.trainable, images, None)
    spot = {k: np.asarray(v) for k, v in spot.items()}
    b = tr.prepare_batch(spot, targets)
    b["query_features"] = np.asarray(spot["query_features"])
    loss_plain, _ = tr._loss_fn(tr.state.trainable, tr.state.frozen, b)

    padded = np.concatenate([images, np.zeros_like(images[:1])], axis=0)
    tg = {
        "gt_ctrl": targets["gt_ctrl"] + [np.zeros((0, 5, 2), np.float32)],
        "gt_boxes": targets["gt_boxes"] + [np.zeros((0, 4), np.float32)],
        "gt_ids": targets["gt_ids"] + [np.zeros((0,), np.int64)],
    }
    spot_p = tr._spot(tr.state.frozen, tr.state.trainable, padded, None)
    spot_p = {k: np.asarray(v) for k, v in spot_p.items()}
    bp = tr.prepare_batch(spot_p, tg, frame_valid=np.array([True, True, False]))
    bp["query_features"] = np.asarray(spot_p["query_features"])
    loss_pad, _ = tr._loss_fn(tr.state.trainable, tr.state.frozen, bp)
    # short-term loss averages over T-1 pairs (2 vs 1): rescale for comparison
    np.testing.assert_allclose(float(loss_pad), float(loss_plain), rtol=5e-2)


def test_train_net_main_on_mesh(tmp_path, monkeypatch):
    """train_net.main over the 8-device mesh: 3 iterations, finite losses logged."""
    import cv2

    from gomatching_tpu.data.datasets import register_dataset

    frame_dir = tmp_path / "frames"
    frame_dir.mkdir()
    images, annotations = [], []
    rng = np.random.RandomState(0)
    aid = 1
    for vid in range(3):
        for fi in range(4):
            img_id = vid * 10 + fi
            fn = f"v{vid}_{fi}.jpg"
            cv2.imwrite(str(frame_dir / fn), rng.randint(0, 255, (72, 96, 3), np.uint8))
            images.append(
                {"id": img_id, "file_name": fn, "height": 72, "width": 96, "video_id": vid}
            )
            x0 = 10 + fi * 3
            annotations.append(
                {
                    "id": aid,
                    "image_id": img_id,
                    "category_id": 1,
                    "bbox": [x0, 20, 30, 14],
                    "poly": [x0, 20, x0 + 30, 20, x0 + 30, 34, x0, 34],
                    "transcription": "abc",
                    "instance_id": 100 + vid,
                }
            )
            aid += 1
    (tmp_path / "train.json").write_text(
        json.dumps({"images": images, "annotations": annotations,
                    "categories": [{"id": 1, "name": "text"}]})
    )
    register_dataset("synth_mesh_train", str(frame_dir), str(tmp_path / "train.json"))

    out_dir = str(tmp_path / "out")
    argv = [
        "train_net.py", "--config-file", "configs/GoMatching_ICDAR15.yaml",
        "--max-iter", "3", "--num-chips", "8",
        "--opts", *TINY_OPTS,
        "DATASETS.TRAIN", "('synth_mesh_train',)",
        "OUTPUT_DIR", out_dir,
        "INPUT.TRAIN_SIZE", "64",
        "INPUT.MIN_SIZE_TRAIN", "(64,)",
        "SOLVER.CHECKPOINT_PERIOD", "3",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    sys.path.insert(0, os.getcwd())
    import train_net

    train_net.main()
    # metrics.json may be empty (log_every=20 > 3 iters) but checkpoints must exist
    ckpts = os.listdir(os.path.join(out_dir, "checkpoints"))
    assert any(f.endswith("_rescore.npz") for f in ckpts), ckpts


def test_step_multi_spot_phase_is_one_sharded_dispatch(setup):
    """The spot phase must run as ONE vmapped dispatch with the clip axis
    sharded over 'data' (the DDP-concurrent per-GPU forward, reference
    train_net.py:186-191) — not N sequential replicated passes."""
    from gomatching_tpu.engine.train import Trainer
    from gomatching_tpu.parallel import build_mesh

    cfg, model, params = setup
    n = 8
    clips = [_clip(seed + 100) for seed in range(n)]
    mesh = build_mesh(devices=jax.devices()[:n])
    tr = Trainer(cfg, model, params, mesh=mesh)

    calls = {"multi": 0, "single": 0}
    tr._build_sharded_update()
    tr.shard_state()
    orig_multi = tr._spot_multi

    def counting_multi(fr, tn, imgs, hws):
        calls["multi"] += 1
        # clip axis genuinely sharded over the mesh
        assert imgs.shape[0] == n
        shard_shapes = {s.data.shape for s in imgs.addressable_shards}
        assert shard_shapes == {(1,) + imgs.shape[1:]}
        return orig_multi(fr, tn, imgs, hws)

    tr._spot_multi = counting_multi
    tr._spot = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("per-clip replicated spot pass used in step_multi")
    )
    metrics = tr.step_multi(clips)
    assert calls["multi"] == 1
    assert np.isfinite(metrics["total_loss"])
