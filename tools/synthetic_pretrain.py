#!/usr/bin/env python
"""Short from-scratch spotter pretrain on synthetic text, for halo certification.

No public checkpoints ship with the reference repo, so realistic sampling-
offset statistics must come from training: this generates a synthetic scene-
text dataset (cv2-rendered words at varied scales/angles), runs the image
spotter pretraining path for a few hundred iterations, and saves a checkpoint
that ``tools/certify_halo.py`` can then measure `deform_attn_dropped_mass`
against (VERDICT r2 next-step 1b).

Usage:
  python tools/synthetic_pretrain.py --out /tmp/synthpre [--iters 400]
      [--size 480] [--images 160] [--cpu] [--opts ...]
then:
  python tools/certify_halo.py --config-file configs/GoMatching_ICDAR15.yaml \
      --opts MODEL.WEIGHTS /tmp/synthpre/checkpoints/spotter_<N>.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WORDS = [
    "text", "video", "spot", "track", "match", "frame", "glyph", "tpu",
    "deform", "query", "token", "scale", "grid", "point", "caption",
]


def make_dataset(root: str, n_images: int, size: int, rng):
    import cv2

    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        h = w = size
        img = rng.randint(0, 80, (h, w, 3), np.uint8)  # dark noisy background
        n_words = rng.randint(2, 7)
        for _ in range(n_words):
            word = WORDS[rng.randint(len(WORDS))]
            fs = rng.uniform(0.7, 2.2)
            th = max(1, int(fs * 2))
            (tw, tth), _ = cv2.getTextSize(word, cv2.FONT_HERSHEY_SIMPLEX, fs, th)
            if tw >= w - 8 or tth >= h - 8:
                continue
            x0 = rng.randint(2, w - tw - 2)
            y0 = rng.randint(tth + 2, h - 4)
            color = tuple(int(c) for c in rng.randint(170, 255, 3))
            cv2.putText(img, word, (x0, y0), cv2.FONT_HERSHEY_SIMPLEX, fs, color, th)
            poly = [x0, y0 - tth, x0 + tw, y0 - tth, x0 + tw, y0 + 2, x0, y0 + 2]
            annotations.append(
                {
                    "id": aid, "image_id": i, "category_id": 1,
                    "bbox": [x0, y0 - tth, tw, tth + 2],
                    "poly": [float(v) for v in poly],
                    "transcription": word, "instance_id": 0,
                }
            )
            aid += 1
        fn = f"im{i:04d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fn), img)
        images.append({"id": i, "file_name": fn, "height": h, "width": w})
    jf = os.path.join(root, "train.json")
    with open(jf, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "text"}]}, f)
    print(f"# synthetic dataset: {len(images)} images, {aid - 1} instances")
    return img_dir, jf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--size", type=int, default=480)
    ap.add_argument("--images", type=int, default=160)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--config-file", default="configs/GoMatching_ICDAR15.yaml")
    ap.add_argument("--opts", default=[], nargs=argparse.REMAINDER)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    rng = np.random.RandomState(0)
    os.makedirs(args.out, exist_ok=True)
    img_dir, jf = make_dataset(os.path.join(args.out, "data"), args.images, args.size, rng)

    from gomatching_tpu.data.datasets import register_dataset

    register_dataset("synthpre_train", img_dir, jf)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import train_net

    argv = [
        "train_net.py", "--config-file", args.config_file,
        "--task", "spotter", "--max-iter", str(args.iters),
        "--opts",
        "DATASETS.TRAIN", "('synthpre_train',)",
        "OUTPUT_DIR", args.out,
        "INPUT.TRAIN_SIZE", str(args.size),
        f"INPUT.MIN_SIZE_TRAIN", f"({args.size},)",
        "SOLVER.CHECKPOINT_PERIOD", str(args.iters),
        "SOLVER.IMS_PER_BATCH", "1",
        "MODEL.WEIGHTS", "''",
    ] + list(args.opts)
    old_argv = sys.argv
    sys.argv = argv
    try:
        train_net.main()
    finally:
        sys.argv = old_argv
    print(f"# checkpoints under {os.path.join(args.out, 'checkpoints')}")


if __name__ == "__main__":
    main()
