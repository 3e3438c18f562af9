"""Time the full spot jit (preprocess+backbone+spotter+detect) per step on TPU.

Usage: python tools/probe_spot.py [impl ...]   (default: vmem tiled)
Env: PROBE_BATCH (default 2), PROBE_ITERS (default 6).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    impls = sys.argv[1:] or ["vmem", "tiled"]
    batch = int(os.environ.get("PROBE_BATCH", "2"))
    iters = int(os.environ.get("PROBE_ITERS", "6"))

    import jax
    import jax.numpy as jnp

    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.data.preprocess import compute_test_size
    from gomatching_tpu.engine.predictor import VideoPredictor

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (batch, 720, 1280, 3), dtype=np.uint8)

    params = None
    for impl in impls:
        cfg = setup_eval_cfg(
            "configs/GoMatching_ICDAR15.yaml",
            ["MODEL.WEIGHTS", "''", "TPU.SPOT_BATCH", str(batch),
             "TPU.SAMPLING_IMPL", impl,
             "MODEL.PRECISION", os.environ.get("PROBE_PRECISION", "float32"),
             "TPU.TILED_HALO", os.environ.get("PROBE_HALO", "5")]
            + os.environ.get("PROBE_OPTS", "").split(),
        )
        pred = VideoPredictor(cfg, params=None)
        target_hw = compute_test_size(720, 1280, cfg.INPUT.MIN_SIZE_TEST,
                                      cfg.INPUT.MAX_SIZE_TEST)
        spot = pred._raw_spot_fn((720, 1280), target_hw)
        raw = jnp.asarray(frames)
        th = jnp.float32(0.4)
        t0 = time.time()
        out = spot(pred.params, raw, th)
        _ = np.asarray(out)
        print(f"{impl}: compile+first {time.time() - t0:.1f}s")
        for trial in range(2):
            t0 = time.time()
            outs = [spot(pred.params, raw, th) for _ in range(iters)]
            _ = np.asarray(outs[-1][..., :1])
            dt = (time.time() - t0) / iters
            print(f"{impl}: {dt * 1e3:8.1f} ms/step ({dt * 1e3 / batch:.1f} ms/frame)")


if __name__ == "__main__":
    main()
