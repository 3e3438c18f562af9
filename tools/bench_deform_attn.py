"""Micro-benchmark: deformable-attention formulations at real encoder scale on TPU.

Usage: python tools/bench_deform_attn.py [--batch B] [--halo H] [--size HxW]

Dispatches ITERS async calls and blocks once, so the ~24 ms tunnel RPC latency
amortizes (docs/PERF_NOTES.md). Prints ms/call per formulation.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h, w):
    shapes = []
    for s in (8, 16, 32, 64):
        shapes.append((-(-h // s), -(-w // s)))
    return shapes


def make_inputs(shapes, B, M=8, D=32, P=4, offset_cells=3.0, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.randn(B, S, M, D).astype(np.float32)
    refs = []
    for h, w in shapes:
        gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
        refs.append(np.stack([(gx.ravel() + 0.5) / w, (gy.ravel() + 0.5) / h], -1))
    ref = np.concatenate(refs, 0)
    ref = np.broadcast_to(ref[None, :, None, None, None, :], (B, S, M, L, P, 2))
    offs = rng.uniform(-offset_cells, offset_cells, (B, S, M, L, P, 2)).astype(np.float32)
    wh = np.array([[w, h] for h, w in shapes], np.float32)
    loc = (ref + offs / wh[None, None, None, :, None, :]).astype(np.float32)
    attn = rng.rand(B, S, M, L, P).astype(np.float32)
    attn = attn / attn.sum((-1, -2), keepdims=True)
    dev = jax.devices()[0]
    return (
        jax.device_put(jnp.asarray(value, dtype), dev),
        jax.device_put(jnp.asarray(loc, dtype=jnp.float32), dev),
        jax.device_put(jnp.asarray(attn, dtype), dev),
    )


def timeit(fn, args, iters=10, warmup=2):
    # block via a host fetch of one element: on the tunneled axon platform
    # block_until_ready returns early, so chain a scalar fetch instead
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(jnp.sum(out[..., :1]))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _ = np.asarray(jnp.sum(outs[-1][..., :1]))
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--halo", type=int, default=8)
    ap.add_argument("--size", default="1000x1778")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--impl", default="gather,tiled")
    args = ap.parse_args()

    h, w = (int(x) for x in args.size.split("x"))
    shapes = level_shapes(h, w)
    S = sum(a * b for a, b in shapes)
    print(f"levels={shapes} S={S} B={args.batch} halo={args.halo} dev={jax.devices()[0].platform}")

    value, loc, attn = make_inputs(shapes, args.batch)
    impls = args.impl.split(",")

    if "gather" in impls:
        from gomatching_tpu.ops.deform_attn import ms_deform_attn_core

        f = jax.jit(lambda v, l, a: ms_deform_attn_core(v, shapes, l, a, query_chunk=0))
        ms = timeit(f, (value, loc, attn), args.iters)
        print(f"gather core:  {ms:8.2f} ms/layer")

    if "vmem" in impls:
        from gomatching_tpu.ops.deform_attn_vmem import ms_deform_attn_encoder_vmem

        for hps in (0, 1):
            f = jax.jit(
                lambda v, l, a, hps=hps: ms_deform_attn_encoder_vmem(
                    v, shapes, l, a, halo=args.halo, heads_per_step=hps
                )
            )
            try:
                ms = timeit(f, (value, loc, attn), args.iters)
                print(f"vmem hps={hps}: {ms:8.2f} ms/layer")
            except Exception as e:
                print(f"vmem hps={hps}: FAILED {type(e).__name__}: {str(e)[:500]}")

    if "tiled" in impls:
        from gomatching_tpu.ops.deform_attn_tiled import ms_deform_attn_encoder_tiled

        for halo in {args.halo, 4, 8, 16} if args.halo < 0 else {args.halo}:
            f = jax.jit(
                lambda v, l, a, halo=halo: ms_deform_attn_encoder_tiled(
                    v, shapes, l, a, halo=halo
                )
            )
            ms = timeit(f, (value, loc, attn), args.iters)
            print(f"tiled halo={halo}: {ms:8.2f} ms/layer")


if __name__ == "__main__":
    main()
