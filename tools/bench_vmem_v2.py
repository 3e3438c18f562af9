#!/usr/bin/env python
"""Sweep query-tile shapes for the v2 projection-layout encoder kernel on TPU.

Per-token G-build work scales as (ty+2h+1)*ceil((tx+2h+1)/8)/(ty*tx) and the
per-grid-step overhead as 1/(ty*tx), so larger tiles amortize both — bounded
by VMEM (coarse-source tiles window huge fine-level footprints). This measures
the real trade on production ICDAR15 shapes (1000x1778 -> pad-32 levels).

Usage: python tools/bench_vmem_v2.py [bf16|f32] [halo]
Env: TILESETS="8x16,8x16,8x16,8x16;16x32,16x32,16x32,16x16" to override;
ABLATE="gbuild dot" to skip kernel stages (timing-only wrong numerics).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    dtype_s = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    halo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    import jax
    import jax.numpy as jnp

    from gomatching_tpu.ops.deform_attn_vmem import (
        ms_deform_attn_encoder_vmem_v2,
        ms_deform_attn_encoder_vmem_v3,
        tile_major_perm,
    )

    kernel = (
        ms_deform_attn_encoder_vmem_v3
        if os.environ.get("KERNEL", "v2") == "v3"
        else ms_deform_attn_encoder_vmem_v2
    )

    dtype = jnp.bfloat16 if dtype_s == "bf16" else jnp.float32
    shapes = [(128, 224), (64, 112), (32, 56), (16, 28)]
    B, M, P, D = 2, 8, 4, 32
    L = len(shapes)
    S = sum(h * w for h, w in shapes)

    default = "8x16,8x16,8x16,8x16;8x32,8x32,8x32,8x16;16x16,16x16,16x16,16x16;" \
              "16x32,16x32,16x32,16x16;16x32,16x32,16x16,16x16"
    tilesets = []
    for spec in os.environ.get("TILESETS", default).split(";"):
        tilesets.append(tuple(tuple(int(v) for v in t.split("x"))
                              for t in spec.split(",")))

    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, M, D), dtype)
    for tiles in tilesets:
        perm, _ = tile_major_perm(shapes, tiles)
        S_tm = perm.shape[0]
        offT = jnp.asarray(rng.randn(B, 2 * L * M * P, S_tm) * 2, jnp.float32)
        attnT = jax.nn.softmax(
            jnp.asarray(rng.randn(B, L * M * P, S_tm), jnp.float32), axis=1
        )
        ablate = frozenset(os.environ.get("ABLATE", "").split())
        fn = jax.jit(lambda v, o, a, ts=tiles: kernel(
            v, shapes, o, a, halo=halo, block=block, tile_sizes=ts,
            ablate=ablate))
        try:
            t0 = time.time()
            # sync via a tiny FETCH: block_until_ready is unreliable through
            # the axon tunnel (see tools/probe_spot.py)
            _ = np.asarray(fn(value, offT, attnT)[0, 0, :1])
            comp = time.time() - t0
            iters = 10
            t0 = time.time()
            for _ in range(iters):
                out = fn(value, offT, attnT)
            _ = np.asarray(out[0, 0, :1])
            dt = (time.time() - t0) / iters * 1e3
            print(f"tiles={tiles} halo={halo} block={block} {dtype_s}: "
                  f"{dt:7.2f} ms/layer (compile {comp:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 - sweep survives OOM configs
            print(f"tiles={tiles}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
