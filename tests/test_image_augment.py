"""Image-pretraining augmentations: rotation keeps points on content, crop
drops out-of-window instances and shifts coordinates."""

import numpy as np


def _rec(n=3):
    rng = np.random.RandomState(0)
    annos = []
    for i in range(n):
        x0, y0 = 10 + i * 25, 12 + i * 10
        pl = np.stack([np.linspace(x0, x0 + 20, 5), np.full(5, y0 + 5)], -1).astype(np.float32)
        bd = np.concatenate([pl - [0, 5], pl + [0, 5]], -1).astype(np.float32)
        annos.append({
            "polyline": pl,
            "boundary": bd,
            "beziers": pl[[0, 1, 3, 4]].copy(),
            "texts": np.full(25, 37, np.int32),
        })
    return {"height": 80, "width": 100, "annotations": annos}


def test_rotate_preserves_relative_geometry():
    from gomatching_tpu.data.image_augment import rotate_image_and_points

    img = np.zeros((80, 100, 3), np.uint8)
    pts = [np.asarray([[10.0, 10.0], [90.0, 10.0]])]
    out, new_pts = rotate_image_and_points(img, pts, 90.0)
    assert out.shape[0] >= 100 - 2 and out.shape[1] >= 80 - 2  # canvas expanded
    d0 = np.linalg.norm(pts[0][0] - pts[0][1])
    d1 = np.linalg.norm(new_pts[0][0] - new_pts[0][1])
    assert abs(d0 - d1) < 1e-6  # rigid transform


def test_crop_keeps_chosen_instance():
    from gomatching_tpu.data.image_augment import augment_pretrain_record

    rec = _rec()
    img = np.zeros((80, 100, 3), np.uint8)
    rng = np.random.RandomState(1)
    out, annos = augment_pretrain_record(
        img, rec, rng, rotate=False, crop_enabled=True, crop_frac=(0.5, 0.5),
        crop_instance=True,
    )
    assert len(annos) >= 1  # the anchor instance's center stays inside
    for a in annos:
        pl = a["polyline"].reshape(-1, 2)
        cx, cy = pl[:, 0].mean(), pl[:, 1].mean()
        assert 0 <= cx < out.shape[1] and 0 <= cy < out.shape[0]


def test_crop_instance_false_avoids_cutting():
    from gomatching_tpu.data.image_augment import augment_pretrain_record

    rec = _rec()
    img = np.zeros((80, 100, 3), np.uint8)
    rng = np.random.RandomState(2)
    out, annos = augment_pretrain_record(
        img, rec, rng, rotate=False, crop_enabled=True, crop_frac=(0.4, 0.4),
        crop_instance=False,
    )
    # every kept instance is fully inside the expanded window
    for a in annos:
        pl = a["polyline"].reshape(-1, 2)
        assert pl[:, 0].min() >= -1e-6 and pl[:, 0].max() <= out.shape[1] + 1e-6
        assert pl[:, 1].min() >= -1e-6 and pl[:, 1].max() <= out.shape[0] + 1e-6
