#!/usr/bin/env python
"""Does a host->device transfer overlap with dispatched device compute over
the tunneled TPU? Decides whether double-buffering the training clip upload
(engine/train.py step) can hide the measured 502 ms wire cost (PERF_NOTES
round 5) behind the ~500 ms compute, or whether the worker serializes
transfer RPCs with execute RPCs.

Measures, with a ~0.5 s matmul chain C and a 13 MB uint8 upload U:
  a) U alone          (wire cost)
  b) C alone          (compute cost)
  c) dispatch C, then U, then block both   (overlap -> ~max(a, b))
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    n = 4096
    a = jnp.asarray(np.random.RandomState(0).randn(n, n), jnp.bfloat16)

    @jax.jit
    def chain(x):
        for _ in range(60):
            x = x @ x / jnp.float32(n)
        return x

    chain(a).block_until_ready()  # compile
    host = np.random.RandomState(1).randint(0, 256, (8, 736, 736, 3), np.uint8)

    # a) upload alone
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(host))
        ua = time.perf_counter() - t0
    print(f"upload alone:   {ua * 1e3:7.1f} ms ({host.nbytes / 1e6:.0f} MB)", flush=True)

    # b) compute alone
    for _ in range(2):
        t0 = time.perf_counter()
        chain(a).block_until_ready()
        ca = time.perf_counter() - t0
    print(f"compute alone:  {ca * 1e3:7.1f} ms", flush=True)

    # c) overlapped: dispatch compute, then upload, block both
    for _ in range(2):
        t0 = time.perf_counter()
        y = chain(a)
        u = jax.device_put(host)
        jax.block_until_ready((y, u))
        ov = time.perf_counter() - t0
    print(f"overlapped:     {ov * 1e3:7.1f} ms  "
          f"(serial would be {(ua + ca) * 1e3:.0f}, "
          f"full overlap {max(ua, ca) * 1e3:.0f})", flush=True)


if __name__ == "__main__":
    main()
