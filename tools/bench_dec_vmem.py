#!/usr/bin/env python
"""Sweep query_block for the decoder full-level one-hot VMEM kernel on TPU.

Production decoder shapes: Lq = nq*npts = 2500 composite queries, 4 levels
padded from 1000x1778 input, M=8, D=32, P=4.

Usage: python tools/bench_dec_vmem.py [bf16|f32] [Qb ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    dtype_s = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    qbs = [int(v) for v in sys.argv[2:]] or [128, 256, 512]
    import jax
    import jax.numpy as jnp

    from gomatching_tpu.ops.deform_attn_dec_vmem import ms_deform_attn_queries_vmem

    dtype = jnp.bfloat16 if dtype_s == "bf16" else jnp.float32
    shapes = [(128, 224), (64, 112), (32, 56), (16, 28)]
    B, M, P, D, Lq = 2, 8, 4, 32, 2500
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, M, D), dtype)
    loc = jnp.asarray(rng.rand(B, Lq, M, L, P, 2), jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(B, Lq, M, L, P), jnp.float32).reshape(B, Lq, M, L * P),
        axis=-1,
    ).reshape(B, Lq, M, L, P)

    for qb in qbs:
        fn = jax.jit(lambda v, l, a, q=qb: ms_deform_attn_queries_vmem(
            v, shapes, l, a, query_block=q))
        try:
            t0 = time.time()
            _ = np.asarray(fn(value, loc, attn)[0, 0, :1])
            comp = time.time() - t0
            iters = 10
            t0 = time.time()
            for _ in range(iters):
                out = fn(value, loc, attn)
            _ = np.asarray(out[0, 0, :1])
            dt = (time.time() - t0) / iters * 1e3
            print(f"Qb={qb:4d} {dtype_s}: {dt:7.2f} ms/layer (compile {comp:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"Qb={qb}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
