"""Feasibility/rate test of Mosaic's dynamic_gather for deformable attention.

Mosaic lowers jnp.take_along_axis(table (R,C), idx (R,C), axis=0) -> tpu.dynamic_gather
with the constraint out.shape == table.shape. Strategy: chunk the flat sample-index
list to length R and broadcast indices across lanes. This probes compile + rate.
Outputs are reduced to scalars IN-JIT so the ~50MB/s host relay doesn't pollute
timings.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=8):
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    ts = []
    for _i in range(n):
        t0 = time.time()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    return min(ts)


def try_strategy(name, builder):
    try:
        t = builder()
        print(f"{name}: OK {t * 1000:.2f} ms", flush=True)
        return t
    except Exception as e:
        msg = str(e).replace("\n", " ")[:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None


def main():
    rng = np.random.RandomState(0)

    for R, C, n_gathers in ((8192, 32, 16), (8192, 128, 16), (32768, 32, 64)):
        v = jnp.asarray(rng.randn(R, C), jnp.float32)
        idx = jnp.asarray(rng.randint(0, R, (n_gathers, R)), jnp.int32)

        def kernel(v_ref, i_ref, o_ref):
            acc = jnp.zeros((R, C), jnp.float32)
            for g in range(n_gathers):
                ib = jax.lax.broadcast_in_dim(i_ref[g], (R, C), (0,))
                acc = acc + jnp.take_along_axis(v_ref[:], ib, axis=0)
            o_ref[0, 0] = jnp.sum(acc)

        def build():
            f = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )
            jf = jax.jit(lambda a, b: f(a, b))
            t = timeit(jf, v, idx)
            rows = n_gathers * R
            print(
                f"    -> {rows / t / 1e6:.0f}M rows/s, {rows * C * 4 / t / 1e9:.1f} GB/s",
                flush=True,
            )
            return t

        try_strategy(f"dynamic_gather R={R} C={C} x{n_gathers}", build)

    # bf16 table
    R, C, n_gathers = 32768, 32, 64
    vb = jnp.asarray(rng.randn(R, C), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, R, (n_gathers, R)), jnp.int32)

    def kernel_b(v_ref, i_ref, o_ref):
        acc = jnp.zeros((R, C), jnp.float32)
        for g in range(n_gathers):
            ib = jax.lax.broadcast_in_dim(i_ref[g], (R, C), (0,))
            acc = acc + jnp.take_along_axis(v_ref[:], ib, axis=0).astype(jnp.float32)
        o_ref[0, 0] = jnp.sum(acc)

    def build_b():
        f = pl.pallas_call(
            kernel_b,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        jf = jax.jit(lambda a, b: f(a, b))
        t = timeit(jf, vb, idx)
        rows = n_gathers * R
        print(f"    -> {rows / t / 1e6:.0f}M rows/s", flush=True)
        return t

    try_strategy("dynamic_gather bf16 R=32768 C=32 x64", build_b)

    # XLA baseline with scalar-reduced output (honest comparison)
    v = jnp.asarray(rng.randn(R, C), jnp.float32)
    flat_idx = jnp.asarray(rng.randint(0, R, (n_gathers * R,)), jnp.int32)
    t = timeit(jax.jit(lambda a, b: jnp.take(a, b, axis=0).sum()), v, flat_idx)
    print(
        f"XLA take scalar-out: {t * 1000:.2f} ms -> {n_gathers * R / t / 1e6:.0f}M rows/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
