#!/usr/bin/env python
"""Decompose the non-transformer part of the spot step on TPU.

Times, at production shapes (B=2, 720x1280 uint8 -> 1000x1778, bf16):
preprocess (I420 decode + resize + normalize), ResNet-50 features, and the
full backbone+detect step (ENC/DEC_LAYERS=0 config) for reference.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def sync(x):
    import numpy as _np

    return _np.asarray(x if not isinstance(x, (tuple, list, dict)) else
                       list(x.values())[0] if isinstance(x, dict) else x[0])[
        (0,) * 0
    ]


def timeit(fn, *args, iters=10, label=""):
    import numpy as _np

    out = fn(*args)
    leaf = out if not isinstance(out, dict) else list(out.values())[0]
    _ = _np.asarray(leaf)[:1]
    t0 = time.time()
    for _i in range(iters):
        out = fn(*args)
    leaf = out if not isinstance(out, dict) else list(out.values())[0]
    _ = _np.asarray(leaf).ravel()[:1]
    dt = (time.time() - t0) / iters * 1e3
    print(f"{label:32s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from gomatching_tpu.data.preprocess import device_preprocess
    from gomatching_tpu.models.resnet import ResNet

    B, H, W = 2, 720, 1280
    th, tw = 1000, 1778
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 255, (B, H, W, 3), np.uint8))

    mean = [103.53, 116.28, 123.675]
    std = [57.375, 57.12, 58.395]
    pre = jax.jit(lambda r: device_preprocess(r, (th, tw), mean, std, "BGR"))
    timeit(pre, raw, label="device_preprocess (u8->f32)")

    imgs = pre(raw).astype(jnp.bfloat16)
    # pad to 32 like the model
    hp, wp = -(-th // 32) * 32, -(-tw // 32) * 32
    imgs_p = jnp.pad(imgs, ((0, 0), (0, hp - th), (0, wp - tw), (0, 0)))
    net = ResNet(depth=50, out_features=("res3", "res4", "res5"))
    params = net.init(jax.random.PRNGKey(0), imgs_p)
    fwd = jax.jit(lambda p, x: net.apply(p, x)["res5"])
    timeit(fwd, params, imgs_p, label="ResNet-50 res3-5 (bf16)")


if __name__ == "__main__":
    main()
