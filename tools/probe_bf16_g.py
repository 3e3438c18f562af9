#!/usr/bin/env python
"""Probe: does the current Mosaic rev lower a bf16 one-hot G build?

PERF_NOTES rounds 2-3 buried the packed-bf16 G lever on two Mosaic
constraints observed then: minor-dim inserts (the (P, Fh, Q) ->
(P, Fh, 1, Q) reshape inside ``_accum_onehot_g``) lowered only in f32, and
the G scratch accumulation assumed f32. If a runtime update ever lifts
that, the encoder's ~37 ms/step VPU-floor G build could halve (VERDICT r4
missing #8: "spend or bury with a PERF_NOTES entry each").

This probe runs three standalone kernels at a production-ish shape
(P=8, Fh=Fw=32, Q=256) on whatever backend is live:

  1. f32 G build (the production formulation) — baseline;
  2. bf16 G build: coords/weights computed in bf16, bf16 minor-dim insert,
     bf16 scratch accumulation;
  3. mixed: f32 one-hot arithmetic, bf16 scratch store (halves scratch
     traffic only).

Each variant compiles in its own try/except so a Mosaic lowering failure is
reported per-variant instead of killing the probe. Prints ms/call medians.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

P, FH, FW, Q = 8, 32, 32, 256


def _g_kernel(x_ref, y_ref, a_ref, out_ref, *, dtype):
    import jax
    import jax.numpy as jnp

    one = jnp.asarray(1.0, dtype)
    x = x_ref[...].astype(dtype)  # (P, Q)
    y = y_ref[...].astype(dtype)
    a = a_ref[...].astype(dtype)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0).reshape(P, 1, Q)
    dy = (y - y0).reshape(P, 1, Q)
    xi = x0.astype(jnp.int32).reshape(P, 1, Q)
    yi = y0.astype(jnp.int32).reshape(P, 1, Q)
    ix = jax.lax.broadcasted_iota(jnp.int32, (P, FW, Q), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (P, FH, Q), 1)
    zero = jnp.asarray(0.0, dtype)
    xw = jnp.where(ix == xi, one - dx, zero) + jnp.where(ix == xi + 1, dx, zero)
    yw = jnp.where(iy == yi, one - dy, zero) + jnp.where(iy == yi + 1, dy, zero)
    yw = yw * a.reshape(P, 1, Q)
    yw4 = yw.reshape(P, FH, 1, Q)  # THE minor-dim insert under test
    acc = None
    for p in range(P):
        term = yw4[p] * xw[p].reshape(1, FW, Q)
        acc = term if acc is None else acc + term
    out_ref[...] = acc.astype(out_ref.dtype)


def run(name, dtype, out_dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    fn = pl.pallas_call(
        functools.partial(_g_kernel, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((FH, FW, Q), out_dtype),
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(2, FW - 3, (P, Q)), jnp.float32)
    y = jnp.asarray(rng.uniform(2, FH - 3, (P, Q)), jnp.float32)
    a = jnp.asarray(rng.uniform(0, 1, (P, Q)), jnp.float32)
    try:
        t0 = time.time()
        out = jax.block_until_ready(jax.jit(fn)(x, y, a))
        compile_s = time.time() - t0
    except Exception as e:  # noqa: BLE001
        print(f"# {name}: LOWERING FAILED — {type(e).__name__}: {str(e)[:200]}")
        return None, None
    times = []
    for _ in range(30):
        t0 = time.time()
        jax.block_until_ready(jax.jit(fn)(x, y, a))
        times.append(time.time() - t0)
    ms = float(np.median(times)) * 1e3
    print(f"# {name}: compile {compile_s:.1f}s, median {ms:.3f} ms/call")
    return ms, np.asarray(out, np.float32)


def main():
    import jax
    import jax.numpy as jnp

    print(f"# backend: {jax.devices()[0].platform}")
    f32_ms, f32_out = run("f32 G build (production)", jnp.float32, jnp.float32)
    bf16_ms, bf16_out = run("bf16 G build", jnp.bfloat16, jnp.bfloat16)
    mix_ms, _ = run("f32 arith, bf16 store", jnp.float32, jnp.bfloat16)
    if f32_ms and bf16_ms and bf16_out is not None:
        err = float(np.abs(bf16_out - f32_out).max())
        print(f"# bf16/f32 speed ratio: {f32_ms / bf16_ms:.2f}x; max |err| {err:.4f}")
    if f32_ms and mix_ms:
        print(f"# mixed/f32 speed ratio: {f32_ms / mix_ms:.2f}x")


if __name__ == "__main__":
    main()
