"""XLA gather microbenchmarks at deformable-encoder geometry.

ms_deform_attn measured 10 GB/s effective (48 ms/frame/layer) — this probe
determines whether TPU gather is DESCRIPTOR-rate bound or BYTE bound, and
times layout variants:

  w32   windowed (2,2,32) per head (current layout)
  w256  windowed (2,2,256) all heads per descriptor (8x bytes, 1/8 desc —
        only useful if descriptor-bound AND heads could share locations)
  flat  (2, 64) windows on an (H, W*D) flattened value (fewer dims)
  rows  4 separate (1, 32) row takes (more desc, smaller slices)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

H, W, D, M = 92, 160, 32, 8
K = int(os.environ.get("BM_K", str(92 * 160 * 4)))  # descriptors per head
REPEATS = int(os.environ.get("BM_REPEATS", "10"))


def timeit(name, jfn, args, desc, bytes_per):
    np.asarray(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(jfn(*args))
    dt = (time.perf_counter() - t0) / 3 / REPEATS
    print(f"{name:28s} {dt*1e3:9.2f} ms  {desc/dt/1e6:8.1f} Mdesc/s "
          f"{bytes_per/dt/1e9:7.1f} GB/s", flush=True)


def chained(once, x):
    def run(x):
        def body(i, acc):
            xp = x + (acc * 1e-38).astype(x.dtype)
            return once(xp).astype(jnp.float32)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((), jnp.float32))
    return jax.jit(run), (x,)


def main():
    key = jax.random.PRNGKey(0)
    value = jax.random.normal(key, (M, H, W, D), jnp.bfloat16)
    ys = jax.random.randint(key, (M, K), 0, H - 2)
    xs = jax.random.randint(jax.random.PRNGKey(1), (M, K), 0, W - 2)
    starts = jnp.stack([ys, xs], -1)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1))

    def g_w32(v):
        f = lambda vm, s: jax.lax.gather(vm, s, dn, slice_sizes=(2, 2, D),
                                         mode="promise_in_bounds")
        return jax.vmap(f)(v, starts).astype(jnp.float32).sum()
    timeit("w32  (2,2,32) per head", *chained(g_w32, value),
           desc=M * K, bytes_per=M * K * 2 * 2 * D * 2)

    vall = value.transpose(1, 2, 0, 3).reshape(H, W, M * D)

    def g_w256(v):
        out = jax.lax.gather(v, starts[0], dn, slice_sizes=(2, 2, M * D),
                             mode="promise_in_bounds")
        return out.astype(jnp.float32).sum()
    timeit("w256 (2,2,256) shared", *chained(g_w256, vall),
           desc=K, bytes_per=K * 2 * 2 * M * D * 2)

    vflat = value.reshape(M, H, W * D)
    dn2 = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1))
    starts2 = jnp.stack([ys, xs * D], -1)

    def g_flat(v):
        f = lambda vm, s: jax.lax.gather(vm, s, dn2, slice_sizes=(2, 2 * D),
                                         mode="promise_in_bounds")
        return jax.vmap(f)(v, starts2).astype(jnp.float32).sum()
    timeit("flat (2, 64) on (H, W*D)", *chained(g_flat, vflat),
           desc=M * K, bytes_per=M * K * 2 * 2 * D * 2)

    vrows = value.reshape(M, H * W, D)
    flat_idx = ys * W + xs  # (M, K)

    def g_rows(v):
        def f(vm, idx):
            return jnp.take(vm, idx, axis=0)  # (K, D) row gather
        out = jax.vmap(f)(v, flat_idx)
        return out.astype(jnp.float32).sum()
    timeit("rows jnp.take (1,32)", *chained(g_rows, vrows),
           desc=M * K, bytes_per=M * K * D * 2)


if __name__ == "__main__":
    main()
