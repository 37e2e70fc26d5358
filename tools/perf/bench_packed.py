"""Packed-int8/int4 weight streaming: defeat the element-rate limit on narrow loads.

bench_w8a16.py showed this chip streams bf16 at ~665 GB/s but int8 at only
~340 GB/s of int8 bytes — loads are ELEMENT-rate limited (~330 Gelem/s), so
narrow types waste the bus. Fix: pack 4 int8 (or 8 int4) into one int32
element, DMA at the 32-bit element rate, unpack with 32-bit VPU shifts
in-kernel (Mosaic doesn't legalize 16-bit shifts, hence int32 not int16).

Pack layout (row-slab split keeps x slices contiguous):
  int8: packed[r, n] packs rows {r, r+K/4, r+K/2, r+3K/4}, byte i = slab i
  int4: packed[r, n] packs rows {r + i*K/8}, nibble i = slab i

Measures streaming GB/s (logical quantized bytes) + matmul correctness.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmor_tpu.ops.quantized_matmul import quantize_weights

L = 8
M = int(os.environ.get("BM_M", "16"))
K = 4096
N = 11264  # ~7B ffn width, rounded to a block_n=512 multiple for the microbench
REPEATS = int(os.environ.get("BM_REPEATS", "30"))


def pack4_int8(w_q: jax.Array) -> jax.Array:
    """(K, N) int8 -> (K/4, N) int32; byte i holds rows [i*K/4, (i+1)*K/4)."""
    k = w_q.shape[0]
    q = k // 4
    out = jnp.zeros((q, w_q.shape[1]), jnp.int32)
    for i in range(4):
        slab = (w_q[i * q : (i + 1) * q].astype(jnp.int32) & 0xFF) << (8 * i)
        out = out | slab
    return out


def pack8_int4(w_q4: jax.Array) -> jax.Array:
    """(K, N) int4-valued int8 -> (K/8, N) int32 nibbles."""
    k = w_q4.shape[0]
    q = k // 8
    out = jnp.zeros((q, w_q4.shape[1]), jnp.int32)
    for i in range(8):
        slab = (w_q4[i * q : (i + 1) * q].astype(jnp.int32) & 0xF) << (4 * i)
        out = out | slab
    return out


def make_wp_kernel(n_k: int, parts: int, bits: int):
    """parts=4/bits=8 (int8) or parts=8/bits=4 (int4)."""

    def kernel(*refs):
        xs = refs[:parts]
        w_ref, scale_ref, o_ref, acc_ref = refs[parts:]
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w32 = w_ref[...]
        dims = (((1,), (0,)), ((), ()))
        for i in range(parts):
            # sign-extended slab i via 32-bit shifts (16-bit shifts don't
            # legalize in Mosaic)
            slab = ((w32 << (32 - bits * (i + 1))) >> (32 - bits)).astype(jnp.bfloat16)
            acc_ref[...] += jax.lax.dot_general(
                xs[i][...], slab, dims, preferred_element_type=jnp.float32
            )

        @pl.when(ki == n_k - 1)
        def _finish():
            o_ref[...] = (
                acc_ref[...] * scale_ref[0].astype(jnp.float32)
            ).astype(o_ref.dtype)

    return kernel


def wp_matmul(x, w_packed, scale, *, parts, bits,
              block_m=None, block_kp=512, block_n=512):
    """x: (M, K); w_packed: (K/parts, N) int32; scale: (N,)."""
    m, k = x.shape
    kp, n = w_packed.shape
    assert kp * parts == k
    if block_m is None:
        block_m = max(16, -(-m // 16) * 16)
    block_kp = min(block_kp, kp)
    block_n = min(block_n, n)
    assert kp % block_kp == 0 and n % block_n == 0, "pad upstream"
    xs = [x[:, i * kp : (i + 1) * kp].astype(jnp.bfloat16) for i in range(parts)]
    if m % block_m:
        pad = block_m - m % block_m
        xs = [jnp.pad(xi, ((0, pad), (0, 0))) for xi in xs]
    m_pad = xs[0].shape[0]
    grid = (m_pad // block_m, n // block_n, kp // block_kp)
    xspec = pl.BlockSpec((block_m, block_kp), lambda i, j, kk: (i, kk))
    out = pl.pallas_call(
        make_wp_kernel(grid[2], parts, bits),
        grid=grid,
        in_specs=[xspec] * parts + [
            pl.BlockSpec((block_kp, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*xs, w_packed, scale[None, :])
    return out[:m].astype(x.dtype)


def run(name, fn, args, weight_bytes, iters=3):
    def repeated(*a):
        def body(i, acc):
            return acc + fn(*a)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((), jnp.float32))

    jfn = jax.jit(repeated)
    np.asarray(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jfn(*args))
    dt = (time.perf_counter() - t0) / iters / REPEATS
    gbps = weight_bytes / dt / 1e9
    print(f"{name:12s}  {dt*1e3:8.3f} ms/scan  {gbps:7.1f} GB/s (logical weight bytes)",
          flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w = jax.random.normal(kw, (L, K, N), jnp.float32) * 0.02
    w_q, scale = jax.jit(jax.vmap(quantize_weights))(w)
    w_p8 = jax.jit(jax.vmap(pack4_int8))(w_q)

    amax = jnp.max(jnp.abs(w), axis=1)
    s4 = jnp.where(amax > 0, amax / 7.0, 1.0)
    w_q4 = jnp.clip(jnp.round(w / s4[:, None, :]), -8, 7).astype(jnp.int8)
    w_p4 = jax.jit(jax.vmap(pack8_int4))(w_q4)

    for a in (x, w_q, scale, w_p8, w_p4, s4):
        np.asarray(jax.device_put(a)[..., :1])

    print(f"M={M} K={K} N={N} L={L}", flush=True)

    ref = np.asarray(x.astype(jnp.float32)) @ (
        np.asarray(w_q[0], np.float32) * np.asarray(scale[0])[None, :]
    )
    got8 = np.asarray(wp_matmul(x, w_p8[0], scale[0], parts=4, bits=8), np.float32)
    err8 = np.abs(ref - got8).max() / (np.abs(ref).max() + 1e-6)
    ref4 = np.asarray(x.astype(jnp.float32)) @ (
        np.asarray(w_q4[0], np.float32) * np.asarray(s4[0])[None, :]
    )
    got4 = np.asarray(
        wp_matmul(x, w_p4[0], s4[0].astype(jnp.float32), parts=8, bits=4), np.float32
    )
    err4 = np.abs(ref4 - got4).max() / (np.abs(ref4).max() + 1e-6)
    print(f"w8p rel err {err8:.4e}   w4p rel err {err4:.4e}", flush=True)

    def scanned(fn):
        def outer(x, ws, ss):
            def body(acc, args):
                wl, sl = args
                return acc + fn(x, wl, sl).astype(jnp.float32).sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (ws, ss))
            return acc
        return outer

    int8_bytes = L * K * N
    int4_bytes = L * K * N // 2
    bf16_bytes = L * K * N * 2

    t8 = run("w8p", scanned(functools.partial(wp_matmul, parts=4, bits=8)),
             (x, w_p8, scale), int8_bytes)
    t4 = run("w4p", scanned(functools.partial(wp_matmul, parts=8, bits=4)),
             (x, w_p4, s4.astype(jnp.float32)), int4_bytes)

    def scanned_bf16(x, w_bf):
        def body(acc, wl):
            return acc + (x @ wl).astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), w_bf)
        return acc

    w_bf = w.astype(jnp.bfloat16)
    tb = run("xla_bf16", scanned_bf16, (x, w_bf), bf16_bytes)
    print(f"decode speedup vs bf16: w8p={tb/t8:.2f}x  w4p={tb/t4:.2f}x", flush=True)


if __name__ == "__main__":
    main()
