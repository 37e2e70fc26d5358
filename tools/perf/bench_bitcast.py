"""Bitcast-unpack int8 weight streaming: int32 DMA + in-register reinterpret.

Pack 4 consecutive N-columns into one int32 (little-endian), DMA at the
32-bit element rate (the chip's DMA is element-rate-limited at ~170 Gelem/s),
then bitcast the (bk, bn4) int32 tile to (bk, 4*bn4) int8 — a vreg relayout,
not per-element shifts — and feed the MXU:

  w8b_bf16: int8 -> bf16 convert (1 VPU op/elem) + bf16 MXU
  w8b_mxu8: int8 MXU directly with per-row-quantized int8 activations

Column packing means x is untouched and scales stay per-output-channel.
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

M = int(os.environ.get("BM_M", "16"))
K = 4096
N = 11264
L = 8
REPEATS = int(os.environ.get("BM_REPEATS", "20"))


def pack_rows_int8(w_q: jax.Array) -> jax.Array:
    """(K, N) int8 -> (K/4, N) int32, byte b of word r = row 4r+b.

    pltpu.bitcast(int32 (bk, bn) -> int8) yields (4*bk, bn) with row
    4r+b = byte b (little-endian) of source row r — this packing makes the
    in-kernel bitcast reproduce the original int8 tile exactly."""
    k, n = w_q.shape
    w = w_q.reshape(k // 4, 4, n).astype(jnp.int32) & 0xFF
    return (w[:, 0] | (w[:, 1] << 8) | (w[:, 2] << 16) | (w[:, 3] << 24))


def _kernel(x_ref, w_ref, scale_ref, o_ref, acc_ref, *, n_k, mode):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w32 = w_ref[...]  # (bk/4, bn) int32
    w8 = pltpu.bitcast(w32, jnp.int8)  # (bk, bn): row-unpacked relayout
    dims = (((1,), (0,)), ((), ()))
    if mode == "bf16":
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], w8.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
        )
    else:
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], w8, dims, preferred_element_type=jnp.int32
        ).astype(jnp.float32)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * scale_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def w8b_matmul(x, w_packed, scale, *, mode="bf16",
               block_m=None, block_k=1024, block_n=512):
    """x: (M, K); w_packed: (K/4, N) int32; scale: (N,)."""
    m, k = x.shape
    k4, n = w_packed.shape
    assert k4 * 4 == k
    if block_m is None:
        block_m = max(32 if mode == "mxu8" else 16, -(-m // 16) * 16)
    block_k = min(block_k, k)
    block_n = min(block_n, n)
    assert k % block_k == 0 and n % block_n == 0
    if mode == "mxu8":
        xf = x.astype(jnp.float32)
        ramax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        rscale = jnp.where(ramax > 0, ramax / 127.0, 1.0)
        xq = jnp.clip(jnp.round(xf / rscale), -127, 127).astype(jnp.int8)
    else:
        xq = x.astype(jnp.bfloat16)
        rscale = None
    if m % block_m:
        xq = jnp.pad(xq, ((0, block_m - m % block_m), (0, 0)))
    m_pad = xq.shape[0]
    grid = (m_pad // block_m, n // block_n, k // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel, n_k=grid[2], mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k // 4, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(xq, w_packed, scale[None, :])
    out = out[:m]
    if rscale is not None:
        out = out * rscale
    return out.astype(x.dtype)


def chained(scan_fn):
    def outer(x, *ws):
        def body(i, acc):
            xp = x * (1.0 + acc * 1e-38).astype(x.dtype)
            return scan_fn(xp, *ws).astype(jnp.float32)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((), jnp.float32))
    return jax.jit(outer)


def timeit(name, jfn, args, weight_bytes, iters=3):
    np.asarray(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jfn(*args))
    dt = (time.perf_counter() - t0) / iters / REPEATS
    gbps = weight_bytes / dt / 1e9
    print(f"{name:12s}  {dt*1e3:8.3f} ms/scan  {gbps:7.1f} GB/s", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w = jax.random.normal(kw, (L, K, N), jnp.float32) * 0.02
    w_q, scale = jax.jit(jax.vmap(quantize_weights))(w)
    w_pc = jax.jit(jax.vmap(pack_rows_int8))(w_q)
    w_bf = w.astype(jnp.bfloat16)
    for a in (x, w_q, scale, w_pc, w_bf):
        np.asarray(jax.device_put(a)[..., :1])

    print(f"M={M} K={K} N={N} L={L}", flush=True)

    ref = np.asarray(x.astype(jnp.float32)) @ (
        np.asarray(w_q[0], np.float32) * np.asarray(scale[0])[None, :]
    )
    for mode in ("bf16", "mxu8"):
        got = np.asarray(w8b_matmul(x, w_pc[0], scale[0], mode=mode), np.float32)
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
        print(f"w8b_{mode} rel err {err:.4e}", flush=True)

    def mk(fn):
        def scan_fn(x, ws, ss):
            def body(acc, args):
                return acc + fn(x, args[0], args[1]).astype(jnp.float32).sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (ws, ss))
            return acc
        return scan_fn

    def scan_bf16(x, w_bf):
        def body(acc, wl):
            return acc + (x @ wl).astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), w_bf)
        return acc

    int8_bytes = L * K * N
    tb = timeit("xla_bf16", chained(scan_bf16), (x, w_bf), L * K * N * 2)
    t1 = timeit("w8b_bf16", chained(mk(functools.partial(w8b_matmul, mode="bf16"))),
                (x, w_pc, scale), int8_bytes)
    t2 = timeit("w8b_mxu8", chained(mk(functools.partial(w8b_matmul, mode="mxu8"))),
                (x, w_pc, scale), int8_bytes)
    print(f"per-token speedup vs bf16: w8b_bf16={tb/t1:.2f}x w8b_mxu8={tb/t2:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
