#!/usr/bin/env python
"""Training-throughput benchmark on the real accelerator (VERDICT r3 #4).

Measures, at the flagship GoMatching ICDAR15 configuration:

  1. the TRACKER training step (the reference train_net.py recipe: frozen
     spotter forward -> host Hungarian/GT phase -> roi_heads loss+grad+update)
     on a synthetic TRAIN_LEN-frame clip at a production-ish resolution, and
  2. optionally (--pretrain) the image-spotter PRETRAINING step (full-model
     grads through the deformable attention) with the XLA 'tiled' sampler vs
     the fused 'vmem' kernels + custom-VJP backwards, A/B.

Prints sec/iter per phase bucket and the projected 30k-iter wall-clock
against the reference's ~3 h on one RTX 3090 (/root/reference/README.md:24).

Usage:
  python tools/bench_train.py [--iters 8] [--size 736] [--frames 4]
      [--pretrain] [--impl tiled|vmem|both] [--cpu] [--opts ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def synth_clip(rng, t, h, w, npts=25, n_inst=8):
    """Synthetic raw uint8 clip + GT targets shaped like the video mapper's
    (the production TRAIN_UPLOAD_UINT8 wire format — trainer normalizes
    in-graph)."""
    images = rng.randint(0, 256, (t, h, w, 3)).astype(np.uint8)
    gt_ctrl, gt_boxes, gt_ids, gt_texts = [], [], [], []
    for _ in range(t):
        n = n_inst
        cx = rng.uniform(0.15, 0.85, n)
        cy = rng.uniform(0.15, 0.85, n)
        bw = rng.uniform(0.05, 0.2, n)
        bh = rng.uniform(0.03, 0.08, n)
        boxes = np.stack([
            (cx - bw / 2) * w, (cy - bh / 2) * h,
            (cx + bw / 2) * w, (cy + bh / 2) * h,
        ], 1).astype(np.float32)
        tt = np.linspace(0, 1, npts, dtype=np.float32)
        ctrl = np.stack([
            (boxes[:, None, 0] + tt[None] * (boxes[:, 2] - boxes[:, 0])[:, None]),
            np.broadcast_to(((boxes[:, 1] + boxes[:, 3]) / 2)[:, None], (n, npts)),
        ], -1).astype(np.float32)
        gt_ctrl.append(ctrl)
        gt_boxes.append(boxes)
        gt_ids.append(np.arange(n, dtype=np.int64))
        gt_texts.append(["word"] * n)
    return images, {
        "gt_ctrl": [c / np.asarray([w, h], np.float32) for c in gt_ctrl],
        "gt_boxes": [b / np.asarray([w, h, w, h], np.float32) for b in gt_boxes],
        "gt_ids": gt_ids,
        "gt_texts": gt_texts,
    }


def bench_tracker(cfg, iters, frames, size, rng, overlap=False):
    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.engine.train import Trainer, fetch_metrics
    from gomatching_tpu.models.gomatching import build_model

    model = build_model(cfg)
    params = init_params(model)
    trainer = Trainer(cfg, model, params)
    h = w = size
    images, targets = synth_clip(
        rng, frames, h, w, npts=cfg.MODEL.TRANSFORMER.NUM_POINTS
    )
    if cfg.TPU.TRAIN_UPLOAD_FORMAT == "yuv420":
        from gomatching_tpu.engine.train import encode_train_clip

        images = encode_train_clip(images, cfg.INPUT.FORMAT)
    hw = np.tile(np.asarray([h, w], np.float32)[None], (frames, 1))

    import jax

    t0 = time.time()
    trainer.step(images, hw, targets)
    compile_s = time.time() - t0

    times, up_times, phases = [], [], []
    for _ in range(iters):
        t0 = time.time()
        # explicit timed upload so the wire cost is split out of the step
        dev = jax.block_until_ready(jax.device_put(images))
        t1 = time.time()
        m = trainer.step(dev, hw, targets)
        t2 = time.time()
        up_times.append(t1 - t0)
        times.append(t2 - t1)
        phases.append(dict(trainer.phase_t))
    sec = float(np.median([u + s for u, s in zip(up_times, times)]))
    total_h = sec * 30000 / 3600
    med = lambda k: float(np.median([p[k] for p in phases])) * 1e3
    print(f"# tracker step: compile {compile_s:.0f}s; median {sec * 1e3:.0f} ms/iter "
          f"(min {(min(up_times) + min(times)) * 1e3:.0f}, "
          f"max {(max(up_times) + max(times)) * 1e3:.0f}); "
          f"loss {m['total_loss']:.3f}")
    print(f"#   split: upload {float(np.median(up_times)) * 1e3:.0f} "
          f"({images.dtype}, {images.nbytes / 1e6:.0f} MB), "
          f"spot {med('spot'):.0f}, host {med('host'):.0f}, "
          f"update {med('update'):.0f} ms")
    print(f"# projected 30k iters: {total_h:.2f} h  "
          f"(reference: ~3 h on 1x RTX 3090, README.md:24)")
    if overlap:
        # steady-state of the train_net.py double-buffered loop (measured in
        # the SAME process so the compile above is reused): clip i+1's
        # upload rides the device's step-i compute, its spot forward is
        # dispatched by step_finish right after the update (spot-ahead), and
        # metrics are fetched one iter late as one stacked vector
        trainer.step_begin(trainer.put_clip(images), hw)
        pending, wall = None, []
        for _ in range(iters):
            t0 = time.time()
            dev_next = trainer.put_clip(images)
            if pending is not None:
                m = fetch_metrics(pending)
            pending = trainer.step_finish(targets, blocking=False,
                                          begin_next=(dev_next, hw))
            wall.append(time.time() - t0)
        m = fetch_metrics(pending)
        # the primed pipeline leaves one dispatched spot forward un-finished;
        # drain it so the process can exit cleanly
        trainer.step_finish(targets)
        sec = float(np.median(wall))
        print(f"# tracker step [overlap]: median {sec * 1e3:.0f} ms/iter "
              f"(min {min(wall) * 1e3:.0f}, max {max(wall) * 1e3:.0f}); "
              f"loss {m['total_loss']:.3f}")
        print(f"# projected 30k iters [overlap]: {sec * 30000 / 3600:.2f} h  "
              f"(reference: ~3 h on 1x RTX 3090, README.md:24)")
    return sec


def bench_pretrain(cfg_base, impls, iters, size, rng):
    from gomatching_tpu.config import setup_train_cfg
    from gomatching_tpu.engine.pretrain import SpotterPretrainer, build_spotter_targets
    from gomatching_tpu.models.gomatching import build_pretrain_model

    results = {}
    for impl in impls:
        cfg = cfg_base.clone()
        cfg.defrost()
        cfg.TPU.TRAIN_SAMPLING_IMPL = impl
        cfg.freeze()
        model = build_pretrain_model(cfg)
        trainer = SpotterPretrainer(cfg, model)
        img = rng.randn(1, size, size, 3).astype(np.float32)
        rec = {
            "height": size, "width": size,
            "annotations": [
                {"poly": [
                    0.1 * size, 0.2 * size, 0.5 * size, 0.2 * size,
                    0.5 * size, 0.3 * size, 0.1 * size, 0.3 * size,
                ], "bbox": [0.1 * size, 0.2 * size, 0.4 * size, 0.1 * size],
                 "texts": [3, 4, 5] + [cfg.MODEL.TRANSFORMER.VOC_SIZE] * 22}
                for _ in range(6)
            ],
        }
        targets = build_spotter_targets(
            rec, cfg.TPU.MAX_GT, cfg.MODEL.TRANSFORMER.NUM_POINTS,
            cfg.MODEL.TRANSFORMER.VOC_SIZE,
        )
        targets = {k: v[None] for k, v in targets.items()}
        t0 = time.time()
        trainer.step(img, targets)
        compile_s = time.time() - t0
        times = []
        for _ in range(iters):
            t0 = time.time()
            m = trainer.step(img, targets)
            times.append(time.time() - t0)
        sec = float(np.median(times))
        results[impl] = sec
        print(f"# pretrain step [{impl}]: compile {compile_s:.0f}s; median "
              f"{sec * 1e3:.0f} ms/iter (min {min(times) * 1e3:.0f}); "
              f"loss {m['total_loss']:.3f}")
    if len(results) == 2:
        a, b = results.get("tiled"), results.get("vmem")
        if a and b:
            print(f"# vmem/tiled pretrain speedup: {a / b:.2f}x")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--size", type=int, default=736,
                    help="square input size (flagship trains around "
                    "short-side 640-896, GoMatching_ICDAR15.yaml)")
    ap.add_argument("--frames", type=int, default=4,
                    help="clip length (INPUT.VIDEO.TRAIN_LEN default 4)")
    ap.add_argument("--overlap", action="store_true",
                    help="measure the double-buffered (train_net.py overlap) "
                    "loop steady state instead of the sequential step")
    ap.add_argument("--pretrain", action="store_true")
    ap.add_argument("--impl", default="both", choices=("tiled", "vmem", "both"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--config-file", default="configs/GoMatching_ICDAR15.yaml")
    ap.add_argument("--opts", default=[], nargs=argparse.REMAINDER)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from gomatching_tpu.config import setup_train_cfg

    cfg = setup_train_cfg(args.config_file, ["MODEL.WEIGHTS", "''"] + list(args.opts))
    rng = np.random.RandomState(0)

    if args.pretrain:
        impls = ("tiled", "vmem") if args.impl == "both" else (args.impl,)
        bench_pretrain(cfg, impls, args.iters, args.size, rng)
    else:
        bench_tracker(cfg, args.iters, args.frames, args.size, rng,
                      overlap=args.overlap)


if __name__ == "__main__":
    main()
