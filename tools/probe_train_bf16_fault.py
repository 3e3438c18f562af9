#!/usr/bin/env python
"""Isolate the bf16 TPU worker fault at the 736px TRAINING geometry.

The tracker train step (tools/bench_train.py --size 736) runs the frozen
spotter forward through the production vmem samplers. f32 works (739 ms/iter,
PERF_NOTES round 5); MODEL.PRECISION=bfloat16 crashes the TPU worker
("kernel fault") at 736px while the SAME bf16 kernels at the 1000px eval
geometry run the e2e bench fine. Hypothesis: Mosaic tiles bf16 arrays
(16, 128) vs f32's (8, 128), so the footprint sublane dim Fw that
_v2_level_geometry rounds to %8 (the f32 constraint found in 4788db8) must
be %16 when the V grids are bf16 — 736px footprints hit %8-not-%16 sizes,
1000px ones are full-extent.

Runs each (kernel, dtype) in its OWN subprocess so a worker fault doesn't
kill the sweep. Usage:
  python tools/probe_train_bf16_fault.py            # sweep all cells
  python tools/probe_train_bf16_fault.py enc bf16   # one cell (child mode)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SHAPES = [(92, 92), (46, 46), (23, 23), (12, 12)]  # 736x736 training levels


def run_cell(kind: str, dtype_s: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    dtype = jnp.bfloat16 if dtype_s == "bf16" else jnp.float32
    B, M, P, D = 1, 8, 4, 32
    L = len(SHAPES)
    S = sum(h * w for h, w in SHAPES)
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, M, D), dtype)

    if kind == "enc":
        from gomatching_tpu.ops.deform_attn_vmem import (
            ms_deform_attn_encoder_vmem_v2,
            tile_major_perm,
        )

        perm, _ = tile_major_perm(SHAPES)
        S_tm = perm.shape[0]
        offT = jnp.asarray(rng.randn(B, 2 * L * M * P, S_tm) * 2, jnp.float32)
        a = jnp.asarray(rng.randn(B, L * M * P, S_tm), jnp.float32)
        attnT = jax.nn.softmax(a.reshape(B, L, M, P, S_tm), axis=(1, 3)).reshape(
            B, L * M * P, S_tm
        )
        fn = jax.jit(lambda v, o, at: ms_deform_attn_encoder_vmem_v2(
            v, SHAPES, o, at, halo=5, block=8))
        t0 = time.time()
        out = np.asarray(fn(value, offT, attnT)[0, :1, :1])
        print(f"OK enc {dtype_s}: compile+run {time.time() - t0:.0f}s "
              f"out[0,0,0]={float(out.ravel()[0]):.4f}", flush=True)
    else:
        from gomatching_tpu.ops.deform_attn_dec_vmem import (
            ms_deform_attn_queries_vmem,
        )

        Lq = 2500
        loc = jnp.asarray(rng.rand(B, Lq, M, L, P, 2), jnp.float32)
        attn = jax.nn.softmax(
            jnp.asarray(rng.randn(B, Lq, M, L, P), jnp.float32).reshape(
                B, Lq, M, L * P), axis=-1,
        ).reshape(B, Lq, M, L, P)
        fn = jax.jit(lambda v, l_, a_: ms_deform_attn_queries_vmem(
            v, SHAPES, l_, a_, query_block=256))
        t0 = time.time()
        out = np.asarray(fn(value, loc, attn)[0, :1, :1])
        print(f"OK dec {dtype_s}: compile+run {time.time() - t0:.0f}s "
              f"out[0,0,0]={float(out.ravel()[0]):.4f}", flush=True)


def main() -> None:
    if len(sys.argv) == 3:
        run_cell(sys.argv[1], sys.argv[2])
        return
    for kind in ("enc", "dec"):
        for dtype_s in ("f32", "bf16"):
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), kind, dtype_s],
                capture_output=True, text=True, timeout=900,
            )
            tail = (r.stdout + r.stderr).strip().splitlines()
            msg = tail[-1] if tail else "(no output)"
            print(f"[{kind} {dtype_s}] rc={r.returncode} "
                  f"({time.time() - t0:.0f}s): {msg[:200]}", flush=True)
            if r.returncode != 0:
                # give a crashed worker time to restart before the next cell
                time.sleep(120)


if __name__ == "__main__":
    main()
