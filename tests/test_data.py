"""Data pipeline tests: json loading, text encoding, bezier GT, clip mapping."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def synth_dataset(tmp_path):
    import cv2

    frame_dir = tmp_path / "frames"
    frame_dir.mkdir()
    images, annotations = [], []
    rng = np.random.RandomState(0)
    aid = 1
    for vid in range(2):
        for fi in range(4):
            img_id = vid * 10 + fi
            fn = f"v{vid}_{fi}.jpg"
            cv2.imwrite(str(frame_dir / fn), rng.randint(0, 255, (72, 96, 3), np.uint8))
            images.append(
                {"id": img_id, "file_name": fn, "height": 72, "width": 96, "video_id": vid}
            )
            # one quad text instance per frame, drifting right
            x0 = 10 + fi * 3
            quad = [x0, 20, x0 + 30, 20, x0 + 30, 34, x0, 34]
            annotations.append(
                {
                    "id": aid,
                    "image_id": img_id,
                    "category_id": 1,
                    "bbox": [x0, 20, 30, 14],
                    "poly": quad,
                    "transcription": "abc" if vid == 0 else "###",
                    "instance_id": 100 + vid,
                }
            )
            aid += 1
    js = {"images": images, "annotations": annotations, "categories": [{"id": 1, "name": "text"}]}
    json_path = tmp_path / "train.json"
    json_path.write_text(json.dumps(js))
    return str(frame_dir), str(json_path)


def test_load_video_json(synth_dataset):
    from gomatching_tpu.data.datasets import group_by_video, load_video_json

    frame_dir, json_path = synth_dataset
    records = load_video_json(json_path, frame_dir)
    assert len(records) == 8
    videos = group_by_video(records)
    assert set(videos) == {0, 1}
    r = records[0]
    a = r["annotations"][0]
    # dense instance remap: ids 100,101 -> 1,2
    assert a["instance_id"] in (1, 2)
    # text encoding: 'abc' -> [0,1,2, pad...]
    assert list(a["texts"][:3]) == [0, 1, 2]
    assert (a["texts"][3:] == 37).all()
    # GT geometry shapes
    assert a["beziers"].shape == (4, 2)
    assert a["boundary"].shape == (50, 2)
    assert a["polyline"].shape == (25, 2)
    # polyline should lie near the quad's vertical center (y ~= 27)
    assert abs(a["polyline"][:, 1].mean() - 27) < 3


def test_unknown_text_encoding():
    from gomatching_tpu.data.datasets import encode_text

    t = encode_text("###")
    assert t[0] == 36 and (t[1:] == 37).all()
    t = encode_text("a#z")
    assert list(t[:3]) == [0, 36, 25]
    t = encode_text(None)
    assert t[0] == 36


def test_clip_mapper(synth_dataset):
    from gomatching_tpu.data.datasets import group_by_video, load_video_json
    from gomatching_tpu.data.mapper import ClipMapper

    frame_dir, json_path = synth_dataset
    videos = group_by_video(load_video_json(json_path, frame_dir))
    mapper = ClipMapper(
        train_size=64, scale_range=(0.9, 1.1), train_len=3, dynamic_scale=False, seed=0
    )
    sample = mapper(videos[0])
    assert 1 <= len(sample.images) <= 3
    h, w = sample.image_hw
    for img, boxes, ids in zip(sample.images, sample.gt_boxes, sample.gt_ids):
        assert img.shape[:2] == (h, w)
        assert boxes.shape[1] == 4 if len(boxes) else True
    # same transform across frames: instance drifts right over frames
    xs = [b[0, 0] for b in sample.gt_boxes if len(b)]
    if len(xs) > 1:
        assert xs == sorted(xs)


def test_loader_iterates(synth_dataset):
    from gomatching_tpu.data.datasets import register_dataset
    from gomatching_tpu.data.loader import VideoClipLoader
    from gomatching_tpu.data.mapper import ClipMapper

    frame_dir, json_path = synth_dataset
    register_dataset("synth_train", frame_dir, json_path)
    loader = VideoClipLoader(
        ["synth_train"], ClipMapper(train_size=64, train_len=2, dynamic_scale=False, seed=0)
    )
    it = iter(loader)
    for _ in range(3):
        s = next(it)
        assert len(s.images) >= 1


def test_device_preprocess_matches_pil_downscale():
    """device_preprocess must match the host PIL path (d2 ResizeShortestEdge via
    DefaultPredictor, text_track_visualizer.py:295) within ~1 uint8 LSB on the
    production DOWNSCALE path (>=1080p datasets -> MIN_SIZE_TEST=1000): PIL
    BILINEAR antialiases downscales, so the device resize must too."""
    from gomatching_tpu.data.preprocess import (
        compute_test_size,
        device_preprocess,
        resize_shortest_edge,
    )

    rng = np.random.RandomState(0)
    for src_hw in ((1080, 1920), (720, 1280)):  # downscale and upscale regimes
        img = (rng.rand(*src_hw, 3) * 255).astype(np.uint8)
        h, w = compute_test_size(src_hw[0], src_hw[1], 1000, 3000)
        ref = resize_shortest_edge(img[:, :, ::-1], 1000, 3000).astype(np.float32)
        got = np.asarray(
            device_preprocess(img[None], (h, w), [0, 0, 0], [1, 1, 1], "RGB")
        )[0]
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() <= 1.1, (src_hw, np.abs(got - ref).max())


def test_empty_rec_keeps_instance():
    """An annotation with rec=[] stays a (no-text) instance, like the
    reference's truthiness gate (text.py:204-211) — it must not be dropped."""
    import json as _json
    from gomatching_tpu.data.datasets import load_video_json

    root = "/tmp/_rec_empty_ds"
    os.makedirs(f"{root}/imgs", exist_ok=True)
    coco = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 32, "width": 32,
                     "video_id": 1}],
        "annotations": [
            {"id": 1, "image_id": 1, "instance_id": 1, "bbox": [1, 1, 5, 5],
             "rec": [], "category_id": 1},
            {"id": 2, "image_id": 1, "instance_id": 2, "bbox": [2, 2, 6, 6],
             "rec": [96] * 25, "category_id": 1},
        ],
        "categories": [{"id": 1, "name": "text"}],
    }
    with open(f"{root}/ann.json", "w") as f:
        _json.dump(coco, f)
    records = load_video_json(f"{root}/ann.json", f"{root}/imgs", voc_size=96)
    annos = records[0]["annotations"]
    # empty rec kept (falls through to encode_text); all-padding rec dropped
    assert len(annos) == 1
