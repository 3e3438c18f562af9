#!/usr/bin/env python
"""Stage-2 bisect of the bf16 736px TPU worker fault (tools/
probe_train_bf16_fault.py found the enc/dec vmem kernels individually OK).

Runs progressively larger slices of the frozen-spotter program at the
736px training geometry in SEPARATE subprocesses:
  backbone   — ResNet-50 fwd, bf16, 736x736
  spotter    — DeepSoloSpotter (enc+dec+heads) on synthetic level features
  full       — build_model(cfg).spot path as the tracker trainer runs it

Usage: python tools/probe_spotter_bf16_736.py [stage dtype]  (child mode)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _cfg():
    from gomatching_tpu.config import setup_train_cfg

    return setup_train_cfg(
        "configs/GoMatching_ICDAR15.yaml", ["MODEL.WEIGHTS", "''"]
    )


def run_cell(stage: str, dtype_s: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    dtype = jnp.bfloat16 if dtype_s == "bf16" else jnp.float32
    cfg = _cfg()
    rng = np.random.RandomState(0)

    if stage == "backbone":
        from gomatching_tpu.models.resnet import ResNet

        bb = ResNet()
        x = jnp.asarray(rng.randn(1, 736, 736, 3), jnp.float32)
        params = bb.init(jax.random.PRNGKey(0), x)
        params = jax.tree.map(lambda a: a.astype(dtype), params)
        fn = jax.jit(lambda p, im: bb.apply(p, im.astype(dtype)))
        t0 = time.time()
        out = fn(params, x)
        leaf = np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1], np.float32)
        print(f"OK backbone {dtype_s}: {time.time() - t0:.0f}s "
              f"leaf={float(leaf.ravel()[0]):.4f}", flush=True)
        return

    if stage == "spotter":
        from gomatching_tpu.models.pos_encoding import position_encoding_2d
        from gomatching_tpu.models.spotter import DeepSoloSpotter

        t = cfg.MODEL.TRANSFORMER
        sp = DeepSoloSpotter(
            d_model=t.HIDDEN_DIM, n_heads=t.NHEADS,
            num_encoder_layers=t.ENC_LAYERS, num_decoder_layers=t.DEC_LAYERS,
            dim_feedforward=t.DIM_FEEDFORWARD, num_queries=t.NUM_QUERIES,
            num_points=t.NUM_POINTS, voc_size=t.VOC_SIZE,
            sampling_impl="vmem", tiled_halo=cfg.TPU.TILED_HALO,
        )
        shapes = [(92, 92), (46, 46), (23, 23)]
        chans = (512, 1024, 2048)
        feats = [jnp.asarray(rng.randn(1, h, w, c) * 0.1, jnp.float32)
                 for (h, w), c in zip(shapes, chans)]
        pos = [position_encoding_2d((1, h, w), t.HIDDEN_DIM // 2, 10000.0, None)
               for h, w in shapes]
        params = sp.init(jax.random.PRNGKey(0), feats, pos, None)
        params = jax.tree.map(lambda a: a.astype(dtype), params)
        fn = jax.jit(lambda p, f, q: sp.apply(p, f, q, None))
        feats = [f.astype(dtype) for f in feats]
        pos = [p.astype(dtype) for p in pos]
        t0 = time.time()
        out = fn(params, feats, pos)
        v = np.asarray(out["pred_logits"][:1, :1, :1, :1], np.float32)
        print(f"OK spotter {dtype_s}: {time.time() - t0:.0f}s "
              f"logit={float(v.ravel()[0]):.4f}", flush=True)
        return

    # full: the tracker trainer's frozen spot program
    from gomatching_tpu.engine.predictor import init_params
    from gomatching_tpu.engine.train import Trainer
    from gomatching_tpu.models.gomatching import build_model
    from tools.bench_train import synth_clip

    cfg.defrost()
    cfg.MODEL.PRECISION = "bfloat16" if dtype_s == "bf16" else "float32"
    cfg.freeze()
    model = build_model(cfg)
    params = init_params(model)
    trainer = Trainer(cfg, model, params)
    images, targets = synth_clip(rng, 2, 736, 736,
                                 npts=cfg.MODEL.TRANSFORMER.NUM_POINTS)
    hw = np.tile(np.asarray([736, 736], np.float32)[None], (2, 1))
    t0 = time.time()
    m = trainer.step(images, hw, targets)
    print(f"OK full {dtype_s}: {time.time() - t0:.0f}s "
          f"loss={float(m['total_loss']):.3f}", flush=True)


def main() -> None:
    if len(sys.argv) == 3:
        run_cell(sys.argv[1], sys.argv[2])
        return
    stages = sys.argv[1:] or ["backbone", "spotter", "full"]
    for stage in stages:
        for dtype_s in ("bf16",):
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), stage, dtype_s],
                capture_output=True, text=True, timeout=1800,
            )
            out = (r.stdout + r.stderr).strip().splitlines()
            ok = [ln for ln in out if ln.startswith("OK ")]
            msg = ok[-1] if ok else (out[-1] if out else "(no output)")
            print(f"[{stage} {dtype_s}] rc={r.returncode} "
                  f"({time.time() - t0:.0f}s): {msg[:220]}", flush=True)
            if r.returncode != 0:
                time.sleep(150)


if __name__ == "__main__":
    main()
