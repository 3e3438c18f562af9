"""Fixed-shape NMS mask vs a plain numpy greedy oracle (torchvision semantics)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    for i in order:
        ok = True
        for j in keep:
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + b - inter, 1e-9) > thr:
                ok = False
                break
        if ok:
            keep.append(i)
    return sorted(keep)


def test_nms_mask_matches_greedy_oracle():
    from gomatching_tpu.utils.boxes import nms_mask

    rng = np.random.RandomState(0)
    for trial in range(10):
        n = 24
        xy = rng.rand(n, 2) * 50
        wh = rng.rand(n, 2) * 30 + 2
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        valid = rng.rand(n) > 0.2
        thr = 0.4

        keep = np.asarray(
            nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thr)
        )
        vi = np.nonzero(valid)[0]
        expected = set(vi[i] for i in greedy_nms(boxes[vi], scores[vi], thr))
        assert set(np.nonzero(keep)[0]) == expected, trial
