"""Decompose the VMEM fused deform-attn path: input prep vs pallas kernel.

Usage: python tools/bench_vmem_parts.py [B] [halo]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gomatching_tpu.ops import deform_attn_vmem as dv
from gomatching_tpu.ops.deform_attn_tiled import (
    _DEFAULT_TILES,
    _footprint_bounds,
    _level_starts,
    _pad_level_grids,
    _tile_queries,
)
from tools.bench_deform_attn import level_shapes, make_inputs, timeit

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
halo = int(sys.argv[2]) if len(sys.argv) > 2 else 7
block = 8
shapes = level_shapes(1000, 1778)
M, D, P, L = 8, 32, 4, 4
value, loc, attn = make_inputs(shapes, B)
out_dtype = value.dtype

full = jax.jit(
    lambda v, l, a: dv.ms_deform_attn_encoder_vmem(v, shapes, l, a, halo=halo)
)
print(f"full vmem: {timeit(full, (value, loc, attn)):8.2f} ms/layer")


def prep(value, loc, attn):
    """Everything the wrapper does before pallas_call, all source levels."""
    grids = _pad_level_grids(value, shapes, block)
    starts, _ = _level_starts(shapes)
    outs = []
    for l, (H1, W1) in enumerate(shapes):
        t = _DEFAULT_TILES[l]
        ty, tx = min(t, H1), min(t, W1)
        s = starts[l]
        loc_t, nty, ntx = _tile_queries(loc[:, s : s + H1 * W1], H1, W1, ty, tx)
        attn_t, _, _ = _tile_queries(attn[:, s : s + H1 * W1], H1, W1, ty, tx)
        T, _, Q = loc_t.shape[:3]
        for l2, (H2, W2) in enumerate(shapes):
            Hp2, Wp2 = grids[l2].shape[2], grids[l2].shape[3]
            oys, Fh = _footprint_bounds(H1, ty, nty, H2, Hp2, halo, block)
            oxs, Fw = _footprint_bounds(W1, tx, ntx, W2, Wp2, halo, block)
            oy_t = np.repeat(np.asarray(oys, np.float32), ntx)
            ox_t = np.tile(np.asarray(oxs, np.float32), nty)
            xg = loc_t[..., l2, :, 0].astype(jnp.float32) * W2 - 0.5
            yg = loc_t[..., l2, :, 1].astype(jnp.float32) * H2 - 0.5
            outs.append(
                jnp.transpose(xg - jnp.asarray(ox_t).reshape(T, 1, 1, 1, 1), (0, 1, 3, 4, 2))
            )
            outs.append(
                jnp.transpose(yg - jnp.asarray(oy_t).reshape(T, 1, 1, 1, 1), (0, 1, 3, 4, 2))
            )
            outs.append(jnp.transpose(attn_t[..., l2, :], (0, 1, 3, 4, 2)))
            if Fh == Hp2 and Fw == Wp2:
                outs.append(grids[l2].reshape(B, M, Fh * Fw, D).astype(out_dtype))
            else:
                rows = jnp.stack(
                    [jax.lax.slice_in_dim(grids[l2], int(oy), int(oy) + Fh, axis=2) for oy in oys]
                )
                outs.append(
                    jnp.stack(
                        [jax.lax.slice_in_dim(rows, int(ox), int(ox) + Fw, axis=4) for ox in oxs],
                        axis=1,
                    ).reshape(T, B, M, Fh * Fw, D).astype(out_dtype)
                )
    return outs


prep_j = jax.jit(prep)
print(f"prep (all src, fp+xya): {timeit(lambda *a: prep_j(*a)[-1], (value, loc, attn)):8.2f} ms")


def prep_fp_only(value):
    grids = _pad_level_grids(value, shapes, block)
    outs = []
    for l, (H1, W1) in enumerate(shapes):
        t = _DEFAULT_TILES[l]
        ty, tx = min(t, H1), min(t, W1)
        nty, ntx = -(-H1 // ty), -(-W1 // tx)
        T = nty * ntx
        for l2, (H2, W2) in enumerate(shapes):
            Hp2, Wp2 = grids[l2].shape[2], grids[l2].shape[3]
            oys, Fh = _footprint_bounds(H1, ty, nty, H2, Hp2, halo, block)
            oxs, Fw = _footprint_bounds(W1, tx, ntx, W2, Wp2, halo, block)
            if Fh == Hp2 and Fw == Wp2:
                continue
            rows = jnp.stack(
                [jax.lax.slice_in_dim(grids[l2], int(oy), int(oy) + Fh, axis=2) for oy in oys]
            )
            outs.append(
                jnp.stack(
                    [jax.lax.slice_in_dim(rows, int(ox), int(ox) + Fw, axis=4) for ox in oxs],
                    axis=1,
                ).reshape(T, B, M, Fh * Fw, D).astype(out_dtype)
            )
    return outs


fp_j = jax.jit(prep_fp_only)
print(f"prep fp only (all src): {timeit(lambda v: fp_j(v)[-1], (value,)):8.2f} ms")

# kernel only: prebuild inputs for src level 0, time the pallas_call alone.
# Reuse the wrapper but feed it a no-op? Simplest: time full minus prep is the
# kernel estimate; additionally time a wrapper variant fed from device-resident
# prebuilt arrays via closure (donate nothing).
pre = prep_j(value, loc, attn)
pre = [jax.device_put(x) for x in pre]


def kernel_only():
    # rebuild the pallas calls with the prebuilt arrays by calling the wrapper
    # on the same inputs; XLA CSEs the prep against constants? Not reliable —
    # report full-minus-prep instead.
    pass


print("kernel-only estimate = full - prep")
