"""Compare XLA gather formulations for bilinear sampling (dev tool)."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=6):
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    ts = []
    for _i in range(n):
        t0 = time.time()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    return min(ts)


def main():
    rng = np.random.RandomState(0)
    H, W, D = 125, 223, 32
    BM = 8  # batch*heads slices doing the same pattern
    N = 111484 * 4  # samples per (b,m) for level 0 (Lq*P)

    img = jnp.asarray(rng.randn(BM, H, W, D), jnp.float32)
    ys = jnp.asarray(rng.randint(0, H - 1, (BM, N)), jnp.int32)
    xs = jnp.asarray(rng.randint(0, W - 1, (BM, N)), jnp.int32)

    # form A: flat row take x4 corners
    flat = img.reshape(BM, H * W, D)

    def form_a(flat, ys, xs):
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                idx = (ys + dy) * W + (xs + dx)
                g = jax.vmap(lambda v, i: jnp.take(v, i, axis=0))(flat, idx)
                out = out + g
        return out.sum()

    t = timeit(jax.jit(form_a), flat, ys, xs)
    print(f"A flat-take x4corners: {t * 1000:.1f} ms ({4 * BM * N / t / 1e6:.0f}M rows/s)", flush=True)

    # form B: one gather with 2x2xD slices from (H, W, D)
    def form_b(img, ys, xs):
        starts = jnp.stack([ys, xs], -1)  # (BM, N, 2)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4),
            collapsed_slice_dims=(),
            start_index_map=(1, 2),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        )
        g = jax.lax.gather(
            img,
            starts,
            dnums,
            slice_sizes=(1, 2, 2, D),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (BM, N, 2, 2, D)
        return g.sum()

    t = timeit(jax.jit(form_b), img, ys, xs)
    print(f"B 2x2xD-slice gather: {t * 1000:.1f} ms ({BM * N / t / 1e6:.0f}M idx/s)", flush=True)

    # form C: bf16 flat take
    flat16 = flat.astype(jnp.bfloat16)
    t = timeit(jax.jit(form_a), flat16, ys, xs)
    print(f"C bf16 flat-take x4: {t * 1000:.1f} ms", flush=True)

    # form D: 2-row slice gather (y, y+1) then lane select
    def form_d(img, ys, xs):
        starts = jnp.stack([ys, xs], -1)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4),
            collapsed_slice_dims=(),
            start_index_map=(1, 2),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        )
        g = jax.lax.gather(
            img, starts, dnums, slice_sizes=(1, 2, 1, D), mode=jax.lax.GatherScatterMode.CLIP
        )
        return g.sum()

    t = timeit(jax.jit(form_d), img, ys, xs)
    print(f"D 2x1xD-slice gather: {t * 1000:.1f} ms", flush=True)

    # form E: single-row take but 128-wide rows (4 heads share fetches; head select after)
    img128 = jnp.asarray(rng.randn(2, H * W, 128), jnp.float32)
    ys2 = ys[:2]
    xs2 = xs[:2]

    def form_e(flat, ys, xs):
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                idx = (ys + dy) * W + (xs + dx)
                g = jax.vmap(lambda v, i: jnp.take(v, i, axis=0))(flat, idx)
                out = out + g
        return out.sum()

    t = timeit(jax.jit(form_e), img128, ys2, xs2)
    print(f"E 128-wide take x4 (2 slices): {t * 1000:.1f} ms ({4 * 2 * N / t / 1e6:.0f}M rows/s)", flush=True)


if __name__ == "__main__":
    main()
