"""Decompose tiled deform-attn cost: footprint extraction vs G build vs matmul."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gomatching_tpu.ops.deform_attn_tiled import (
    _footprint_bounds,
    _level_starts,
    _pad_level_grids,
    _round_up,
    _tile_queries,
    _axis_onehot,
    _DEFAULT_TILES,
)
from tools.bench_deform_attn import level_shapes, make_inputs, timeit

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
halo = 8
block = 8
shapes = level_shapes(1000, 1778)
M, D, P, L = 8, 32, 4, 4
value, loc, attn = make_inputs(shapes, B)
dt = jnp.bfloat16

# --- report static geometry + FLOPs ---
tiles = list(_DEFAULT_TILES)
tot_flops = 0
tot_g_bytes = 0
for l, (H1, W1) in enumerate(shapes):
    t = tiles[l]
    ty, tx = min(t, H1), min(t, W1)
    nty, ntx = -(-H1 // ty), -(-W1 // tx)
    T, Q = nty * ntx, ty * tx
    fs = []
    for l2, (H2, W2) in enumerate(shapes):
        Hp2, Wp2 = _round_up(H2, block), _round_up(W2, block)
        _, Fh = _footprint_bounds(H1, ty, nty, H2, Hp2, halo, block)
        _, Fw = _footprint_bounds(W1, tx, ntx, W2, Wp2, halo, block)
        fs.append(Fh * Fw)
        tot_flops += 2 * T * Q * M * Fh * Fw * D * B
        tot_g_bytes += 2 * T * Q * M * Fh * Fw * B
    print(f"src{l}: T={T} Q={Q} F={fs}")
print(f"matmul GFLOP/layer={tot_flops/1e9:.1f}  G GB/layer={tot_g_bytes/1e9:.2f}")

# --- piece timings at the src-0 scale ---
l = 0
H1, W1 = shapes[l]
ty = tx = 16
nty, ntx = -(-H1 // ty), -(-W1 // tx)
T, Q = nty * ntx, ty * tx


def fp_extract(v):
    grids = _pad_level_grids(v, shapes, block)
    outs = []
    for l2, (H2, W2) in enumerate(shapes):
        Hp2, Wp2 = grids[l2].shape[2], grids[l2].shape[3]
        oys, Fh = _footprint_bounds(H1, ty, nty, H2, Hp2, halo, block)
        oxs, Fw = _footprint_bounds(W1, tx, ntx, W2, Wp2, halo, block)
        rows = jnp.stack([jax.lax.slice_in_dim(grids[l2], oy, oy + Fh, axis=2) for oy in oys])
        fp = jnp.stack([jax.lax.slice_in_dim(rows, ox, ox + Fw, axis=4) for ox in oxs], axis=1)
        outs.append(fp.reshape(T, B, M, Fh * Fw, D))
    return outs


f = jax.jit(fp_extract)
print(f"fp extract (src0, all tgts): {timeit(lambda v: f(v)[0], (value,)):8.2f} ms")

# G build for src0 -> tgt0
s = _level_starts(shapes)[0][l]
loc_l = loc[:, s : s + H1 * W1]
attn_l = attn[:, s : s + H1 * W1]
loc_t, _, _ = _tile_queries(loc_l, H1, W1, ty, tx)
attn_t, _, _ = _tile_queries(attn_l, H1, W1, ty, tx)
Hp2, Wp2 = _round_up(H1, block), _round_up(W1, block)
oys, Fh = _footprint_bounds(H1, ty, nty, H1, Hp2, halo, block)
oxs, Fw = _footprint_bounds(W1, tx, ntx, W1, Wp2, halo, block)
oy_t = jnp.asarray(np.repeat(np.asarray(oys, np.int32), ntx)).reshape(T, 1, 1, 1, 1)
ox_t = jnp.asarray(np.tile(np.asarray(oxs, np.int32), nty)).reshape(T, 1, 1, 1, 1)


def g_build(loc_t, attn_t):
    x = loc_t[..., 0, :, 0] * W1 - 0.5
    y = loc_t[..., 0, :, 1] * H1 - 0.5
    x0, y0 = jnp.floor(x), jnp.floor(y)
    Yw = _axis_onehot(y0, y - y0, oy_t, Fh) * attn_t[..., 0, :, None]
    Xw = _axis_onehot(x0, x - x0, ox_t, Fw)
    G = jnp.einsum("tbqmph,tbqmpw->tbmqhw", Yw, Xw, preferred_element_type=jnp.float32)
    return G.reshape(T, B, M, Q, Fh * Fw).astype(dt)


g = jax.jit(g_build)
print(f"G build (src0->tgt0, F={Fh*Fw}): {timeit(g, (loc_t, attn_t)):8.2f} ms")

# matmul with prebuilt G
G0 = g(loc_t, attn_t)
V0 = jnp.asarray(np.random.RandomState(0).randn(T, B, M, Fh * Fw, D), dt)
mm = jax.jit(
    lambda G, V: jnp.einsum("tbmqf,tbmfd->tbmqd", G, V, preferred_element_type=jnp.float32)
)
print(f"G@V matmul (src0->tgt0): {timeit(mm, (G0, V0)):8.2f} ms")

# G build alternative: direct one-hot product without einsum-over-p
def g_build2(loc_t, attn_t):
    x = loc_t[..., 0, :, 0] * W1 - 0.5
    y = loc_t[..., 0, :, 1] * H1 - 0.5
    x0, y0 = jnp.floor(x), jnp.floor(y)
    Yw = (_axis_onehot(y0, y - y0, oy_t, Fh) * attn_t[..., 0, :, None]).astype(dt)
    Xw = _axis_onehot(x0, x - x0, ox_t, Fw).astype(dt)
    G = jnp.sum(Yw[..., :, None] * Xw[..., None, :], axis=4)  # over P
    G = jnp.moveaxis(G, 3, 2)  # (T,B,Q,M,...) -> (T,B,M?,...)
    return G


g2 = jax.jit(g_build2)
print(f"G build v2 (bf16 outer+sum): {timeit(g2, (loc_t, attn_t)):8.2f} ms")
