#!/usr/bin/env python
"""Does a host->device transfer overlap with dispatched device compute over
the tunneled TPU? Decides whether double-buffering the training clip upload
(engine/train.py step) can hide the measured 502 ms wire cost (PERF_NOTES
round 5) behind the ~500 ms compute, or whether the worker serializes
transfer RPCs with execute RPCs.

Caveat discovered on the first cut: on the axon client, device_put +
block_until_ready acks in ~10 ms for 13 MB and a 60-matmul chain "completes"
in 0.1 ms — readiness is client-side, not device-side. Every timing below
therefore forces completion by FETCHING a scalar that data-depends on the
work, and each upload ships a DIFFERENT host array (defeats any content
dedupe).

Measures, with a matmul chain C (~0.5 s) and 13 MB uint8 uploads U_k:
  a) U alone  (upload + consume + fetch)      -> wire cost
  b) C alone  (chain + fetch)                 -> compute cost
  c) dispatch C, then U, fetch both           -> overlap ~ max(a, b)
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
        y = x
        for _ in range(120):
            y = y @ x / jnp.bfloat16(n)
        return y.astype(jnp.float32).sum()  # scalar: fetch forces completion

    @jax.jit
    def consume(u):
        return u.astype(jnp.int32).sum()  # scalar fetch forces the wire

    rng = np.random.RandomState(1)
    hosts = [rng.randint(0, 256, (8, 736, 736, 3), np.uint8) for _ in range(6)]
    nbytes = hosts[0].nbytes

    float(chain(a))  # compile
    float(consume(jax.device_put(hosts[5])))  # compile

    # a) upload alone (fresh array each pass)
    ups = []
    for k in range(2):
        t0 = time.perf_counter()
        float(consume(jax.device_put(hosts[k])))
        ups.append(time.perf_counter() - t0)
    ua = min(ups)
    print(f"upload+consume: {ua * 1e3:7.1f} ms ({nbytes / 1e6:.0f} MB)", flush=True)

    # b) compute alone
    cs = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(chain(a))
        cs.append(time.perf_counter() - t0)
    ca = min(cs)
    print(f"compute+fetch:  {ca * 1e3:7.1f} ms", flush=True)

    # c) overlapped: dispatch compute, then upload, fetch both
    ovs = []
    for k in range(2, 4):
        t0 = time.perf_counter()
        y = chain(a)  # dispatch, no fetch
        u = consume(jax.device_put(hosts[k]))
        float(y)
        float(u)
        ovs.append(time.perf_counter() - t0)
    ov = min(ovs)
    print(f"overlapped:     {ov * 1e3:7.1f} ms  "
          f"(serial would be {(ua + ca) * 1e3:.0f}, "
          f"full overlap {max(ua, ca) * 1e3:.0f})", flush=True)


if __name__ == "__main__":
    main()
