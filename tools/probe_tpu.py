"""Quick TPU timing probe for the flagship spotter path (dev tool)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gomatching_tpu.config import setup_eval_cfg
from gomatching_tpu.engine.predictor import init_params
from gomatching_tpu.models.gomatching import GoMatchingModel, build_model


def main(batch=4, h=1000, w=1778, iters=5):
    cfg = setup_eval_cfg("configs/GoMatching_ICDAR15.yaml", ["MODEL.WEIGHTS", "''"])
    model = build_model(cfg)
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    params = init_params(model)
    print(f"init: {time.time() - t0:.1f}s", flush=True)
    n_par = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_par / 1e6:.2f}M", flush=True)

    fn = jax.jit(lambda p, x: model.apply(p, x, None, method=GoMatchingModel.spot_and_detect))
    x = jnp.asarray(np.random.RandomState(0).randn(batch, h, w, 3), jnp.float32)
    t0 = time.time()
    out = jax.block_until_ready(fn(params, x))
    print(f"compile+first run: {time.time() - t0:.1f}s", flush=True)
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = jax.block_until_ready(fn(params, x))
        times.append(time.time() - t0)
    dt = min(times)
    print(f"steady: {dt * 1000:.1f} ms/batch of {batch} -> {batch / dt:.2f} frames/s", flush=True)


if __name__ == "__main__":
    import sys

    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = int(v)
    main(**kw)
