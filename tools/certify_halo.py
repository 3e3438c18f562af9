#!/usr/bin/env python
"""Certify TPU.TILED_HALO against a checkpoint's actual sampling offsets.

The tiled/vmem encoder samplers resolve a sample exactly only when it lands
within ``halo`` target-level cells of the query's footprint
(ops/deform_attn_tiled.py docstring); everything further is dropped. The init
scheme caps offsets at NUM_POINTS cells, but a converted checkpoint can learn
larger ones — this tool measures the actually-dropped attention mass on a
calibration forward and prints a per-layer halo table, so production configs
can size TILED_HALO (smaller halo = smaller footprints = faster encoder).

Usage:
  python tools/certify_halo.py --config-file configs/GoMatching_ICDAR15.yaml \
      [--image path.jpg ...] [--size 736x992] [--halos 1,2,3,4,5,7] [--cpu]

With no --image a random calibration frame is used (meaningful for offset
STATISTICS only insofar as the checkpoint is; always prefer real frames).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def level_shapes(h, w, pad=32):
    hp, wp = -(-h // pad) * pad, -(-w // pad) * pad
    return [(-(-hp // s), -(-wp // s)) for s in (8, 16, 32, 64)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--weights", default="", help="npz param tree; spotter-only "
                    "checkpoints (tools/synthetic_pretrain.py) merge over random init")
    ap.add_argument("--image", nargs="*", default=[])
    ap.add_argument("--size", default="", help="HxW calibration size override")
    ap.add_argument("--halos", default="1,2,3,4,5,6,7,8")
    ap.add_argument("--budget", type=float, default=1e-4,
                    help="max acceptable dropped attention mass fraction")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--opts", default=[], nargs=argparse.REMAINDER)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import VideoPredictor
    from gomatching_tpu.models.gomatching import GoMatchingModel
    from gomatching_tpu.ops.deform_attn_tiled import deform_attn_dropped_mass

    # the exact gather path goes through the generic sampling computation,
    # which sows the calibration intermediates (the vmem fast path bypasses it)
    cfg = setup_eval_cfg(
        args.config_file, ["TPU.SAMPLING_IMPL", "xla"] + list(args.opts)
    )
    predictor = VideoPredictor(cfg)
    if args.weights:
        from gomatching_tpu.engine.checkpoint import load_params

        loaded = load_params(args.weights)["params"]
        p = dict(predictor.params["params"])
        dev = jax.devices()[0]
        for k, v in loaded.items():
            p[k] = jax.device_put(v, dev)
        predictor.params = {"params": p}
        print(f"# merged weights from {args.weights}: {sorted(loaded)}")

    if args.image:
        import cv2

        frames = [cv2.imread(p) for p in args.image]
    else:
        h, w = (int(x) for x in args.size.split("x")) if args.size else (736, 992)
        frames = [np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8)]
        print("# WARNING: random calibration frame — pass --image for real stats")

    from gomatching_tpu.data.preprocess import compute_test_size, preprocess_frames

    batch, image_hw, _ = preprocess_frames(
        frames, cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD, cfg.INPUT.FORMAT,
        cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST, pad_multiple=32,
    )
    shapes = level_shapes(batch.shape[1], batch.shape[2], pad=1)
    print(f"# calibration {batch.shape[0]} frame(s) at {batch.shape[1]}x{batch.shape[2]}")

    _, inter = predictor.model.apply(
        predictor.params, jnp.asarray(batch), None,
        method=GoMatchingModel.spot, mutable=["intermediates"],
    )

    # collect (loc, attn) per encoder layer from the sown intermediates
    samples = []

    def walk(tree, path=""):
        if isinstance(tree, dict):
            if "sampling_loc" in tree:
                samples.append(
                    (path, tree["sampling_loc"][0], tree["sampling_attn"][0])
                )
            else:
                for k in sorted(tree):
                    walk(tree[k], f"{path}/{k}")

    walk(inter["intermediates"])
    enc = [(p, l, a) for p, l, a in samples if "encoder" in p or "enc" in p]
    if not enc:
        enc = samples
    print(f"# {len(enc)} encoder layers captured")

    halos = [int(x) for x in args.halos.split(",")]
    wh = np.asarray([[w2, h2] for h2, w2 in shapes], np.float32)
    print(f"{'layer':<34} " + " ".join(f"halo={h:<2}" for h in halos) + "   max|off| p99.9")
    worst = {h: 0.0 for h in halos}
    for path, loc, attn in enc:
        loc = np.asarray(loc, np.float32)
        attn = np.asarray(attn, np.float32)
        # offset magnitude in target cells (vs the query's own grid position)
        S = loc.shape[1]
        refs = []
        for h2, w2 in shapes:
            gy, gx = np.mgrid[0:h2, 0:w2].astype(np.float32)
            refs.append(np.stack([(gx.ravel() + 0.5) / w2, (gy.ravel() + 0.5) / h2], -1))
        ref = np.concatenate(refs, 0)[None, :, None, None, None, :]
        off_cells = np.abs(loc - ref) * wh[None, None, None, :, None, :]
        row = []
        for h in halos:
            d = float(deform_attn_dropped_mass(shapes, jnp.asarray(loc), jnp.asarray(attn), halo=h))
            worst[h] = max(worst[h], d)
            row.append(f"{d:8.2e}")
        print(f"{path[-34:]:<34} " + " ".join(row) +
              f"   {off_cells.max():6.2f} {np.percentile(off_cells, 99.9):6.2f}")
    ok = [h for h in halos if worst[h] <= args.budget]
    if ok:
        print(f"# smallest certified halo at budget {args.budget:g}: {min(ok)} "
              f"(worst layer dropped mass {worst[min(ok)]:.2e})")
    else:
        print(f"# NO halo in {halos} meets budget {args.budget:g}; "
              f"worst at halo={max(halos)}: {worst[max(halos)]:.2e} — use the exact "
              "'xla' sampler or raise TILED_HALO")


if __name__ == "__main__":
    main()
