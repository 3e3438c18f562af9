"""Single-chip train_net CLI: the double-buffered overlap loop (default
TPU.TRAIN_OVERLAP_UPLOAD) with the yuv420 training wire, end-to-end on a
synthetic registered dataset — checkpoints written, metrics finite, and the
overlap loop's losses identical to the sequential loop's (the overlap only
reorders dispatch; reference recipe train_net.py:186-209)."""

import json
import os
import sys

import numpy as np
import pytest

from test_train_net_mesh import TINY_OPTS


def _make_dataset(tmp_path, name, n_videos=2, n_frames=4, hw=(72, 96)):
    import cv2

    from gomatching_tpu.data.datasets import register_dataset

    frame_dir = tmp_path / "frames"
    frame_dir.mkdir(exist_ok=True)
    images, annotations = [], []
    rng = np.random.RandomState(0)
    aid = 1
    for vid in range(n_videos):
        for fi in range(n_frames):
            img_id = vid * 10 + fi
            fn = f"v{vid}_{fi}.jpg"
            cv2.imwrite(
                str(frame_dir / fn),
                rng.randint(0, 255, (hw[0], hw[1], 3), np.uint8),
            )
            images.append(
                {"id": img_id, "file_name": fn, "height": hw[0], "width": hw[1],
                 "video_id": vid}
            )
            x0 = 10 + fi * 3
            annotations.append(
                {"id": aid, "image_id": img_id, "category_id": 1,
                 "bbox": [x0, 20, 30, 14],
                 "poly": [x0, 20, x0 + 30, 20, x0 + 30, 34, x0, 34],
                 "transcription": "abc", "instance_id": 100 + vid}
            )
            aid += 1
    (tmp_path / "train.json").write_text(
        json.dumps({"images": images, "annotations": annotations,
                    "categories": [{"id": 1, "name": "text"}]})
    )
    register_dataset(name, str(frame_dir), str(tmp_path / "train.json"))


def _run_train(tmp_path, out_name, extra_opts, monkeypatch, max_iter=3):
    out_dir = str(tmp_path / out_name)
    argv = [
        "train_net.py", "--config-file", "configs/GoMatching_ICDAR15.yaml",
        "--max-iter", str(max_iter),
        "--opts", *TINY_OPTS,
        "DATASETS.TRAIN", "('synth_cli_train',)",
        "OUTPUT_DIR", out_dir,
        "INPUT.TRAIN_SIZE", "64",
        "INPUT.MIN_SIZE_TRAIN", "(64,)",
        "SOLVER.CHECKPOINT_PERIOD", str(max_iter),
        *extra_opts,
    ]
    monkeypatch.setattr(sys, "argv", argv)
    sys.path.insert(0, os.getcwd())
    import train_net

    train_net.main()
    ckpts = os.listdir(os.path.join(out_dir, "checkpoints"))
    assert any(f.endswith("_rescore.npz") for f in ckpts), ckpts
    return out_dir


def test_train_net_overlap_yuv420(tmp_path, monkeypatch):
    _make_dataset(tmp_path, "synth_cli_train")
    _run_train(
        tmp_path, "out_overlap",
        ["TPU.TRAIN_OVERLAP_UPLOAD", "True", "TPU.TRAIN_UPLOAD_FORMAT", "yuv420"],
        monkeypatch,
    )


def test_train_net_overlap_matches_sequential(tmp_path, monkeypatch):
    """Same data order (deterministic loader seed), same iterations: the
    overlap loop's final trainable params must equal the sequential loop's."""
    from gomatching_tpu.engine.checkpoint import load_params

    _make_dataset(tmp_path, "synth_cli_train")
    out_a = _run_train(
        tmp_path, "out_seq",
        ["SEED", "7", "TPU.TRAIN_OVERLAP_UPLOAD", "False"], monkeypatch,
    )
    out_b = _run_train(
        tmp_path, "out_ovl",
        ["SEED", "7", "TPU.TRAIN_OVERLAP_UPLOAD", "True"], monkeypatch,
    )
    pa = load_params(os.path.join(out_a, "checkpoints", "model_0000003_rescore.npz"))
    pb = load_params(os.path.join(out_b, "checkpoints", "model_0000003_rescore.npz"))
    import jax

    la, lb = jax.tree.leaves(pa), jax.tree.leaves(pb)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
