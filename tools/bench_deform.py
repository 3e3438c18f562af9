"""Micro-benchmarks of deformable-attention building blocks on the TPU (dev tool)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [(125, 223), (63, 112), (32, 56), (16, 28)]
S = sum(h * w for h, w in SHAPES)
M, D, L, P = 8, 32, 4, 4


def timeit(fn, *args, n=5):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])  # full host fetch = hard sync
    ts = []
    for _i in range(n):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.time() - t0)
    return min(ts)


def main():
    rng = np.random.RandomState(0)
    print(f"S={S} tokens, M={M} heads, D={D}, {L}x{P} samples/query", flush=True)
    Lq = S

    value = jnp.asarray(rng.randn(1, S, M, D), jnp.float32)
    loc = jnp.asarray(rng.uniform(0.05, 0.95, (1, Lq, M, L, P, 2)), jnp.float32)
    w = rng.rand(1, Lq, M, L * P).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    w = jnp.asarray(w.reshape(1, Lq, M, L, P))

    from gomatching_tpu.ops.deform_attn import ms_deform_attn_core

    for chunk in (2048, 8192, 37171):
        f = jax.jit(lambda v, l, a: ms_deform_attn_core(v, SHAPES, l, a, query_chunk=chunk))
        t = timeit(f, value, loc, w)
        print(f"core fp32 chunk={chunk}: {t * 1000:.1f} ms", flush=True)

    f = jax.jit(lambda v, l, a: ms_deform_attn_core(v, SHAPES, l, a, query_chunk=8192))
    t = timeit(f, value.astype(jnp.bfloat16), loc, w)
    print(f"core bf16 value chunk=8192: {t * 1000:.1f} ms", flush=True)

    # raw gather cost: the 4-corner row gather in isolation
    idx = jnp.asarray(rng.randint(0, S, (M, Lq * L * P)), jnp.int32)
    vbm = jnp.asarray(rng.randn(M, S, D), jnp.float32)

    def raw_gather(v, i):
        return jax.vmap(lambda vv, ii: jnp.take(vv, ii, axis=0))(v, i).sum(axis=1)

    t = timeit(jax.jit(raw_gather), vbm, idx)
    print(f"raw row-gather fp32 ({M}x{Lq * L * P} rows of {D}): {t * 1000:.1f} ms", flush=True)
    t = timeit(jax.jit(raw_gather), vbm.astype(jnp.bfloat16), idx)
    print(f"raw row-gather bf16: {t * 1000:.1f} ms", flush=True)

    # gather with 128-wide rows (lane-aligned) for comparison
    vb128 = jnp.asarray(rng.randn(M, S, 128), jnp.float32)
    idx16 = jnp.asarray(rng.randint(0, S, (M, Lq * L * P // 4)), jnp.int32)
    t = timeit(jax.jit(raw_gather), vb128, idx16)
    print(f"row-gather 128-wide fp32 ({M}x{Lq * L * P // 4} rows): {t * 1000:.1f} ms", flush=True)

    # matmul reference point: encoder FFN cost
    x = jnp.asarray(rng.randn(S, 256), jnp.float32)
    w1 = jnp.asarray(rng.randn(256, 1024), jnp.float32)
    w2 = jnp.asarray(rng.randn(1024, 256), jnp.float32)
    t = timeit(jax.jit(lambda x, a, b: (x @ a) @ b), x, w1, w2)
    print(f"FFN matmul fp32: {t * 1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
