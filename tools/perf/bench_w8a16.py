"""Microbench: int8-weight matmul variants for weight-streaming-bound decode.

Question: can we stream int8 weights at the bf16 byte rate (~223 GB/s on the
tunnel chip) by dequantizing in VMEM and doing bf16 MXU math (W8A16), instead
of the current W8A8 int8-MXU kernel (117 GB/s)?

Measures, on scanned (L, K, N) stacked weights (decode-realistic: every layer
streamed once per token, no reuse):
  - xla_bf16:   plain bf16 dot (the 223 GB/s anchor, bf16 bytes)
  - w8a8:       existing Pallas int8xint8 kernel
  - w8a16:      new Pallas kernel, int8 tile -> bf16 convert in VMEM -> bf16 MXU
  - xla_mixed:  XLA dot_general with int8 rhs upcast (lazy astype baseline)

Prints GB/s of *weight bytes actually transferred* (int8 = 1 B/param,
bf16 = 2 B/param) and the implied tokens/s speedup factor for a 7B decode.
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

from mmor_tpu.ops.quantized_matmul import int8_matmul, quantize_weights

L = 8          # stacked layers to stream (distinct weights, like scanned decode)
M = int(os.environ.get("BM_M", "16"))   # decode batch
K = 4096
N = 11008      # 7B ffn width: the biggest single stream


def _w8a16_kernel(x_ref, w_ref, scale_ref, o_ref, acc_ref, *, n_k: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(jnp.bfloat16)  # int8 -> bf16 on the VPU, in VMEM
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == n_k - 1)
    def _finish():
        o_ref[...] = (acc_ref[...] * scale_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def w8a16_matmul(x, w_q, scale, *, block_m=None, block_k=2048, block_n=512):
    m, k = x.shape
    _, n = w_q.shape
    if block_m is None:
        block_m = max(16, -(-m // 16) * 16)
    block_k = min(block_k, k)
    block_n = min(block_n, n)
    m_pad = -(-m // block_m) * block_m
    k_pad = -(-k // block_k) * block_k
    n_pad = -(-n // block_n) * block_n
    xb = x.astype(jnp.bfloat16)
    if m_pad != m or k_pad != k:
        xb = jnp.pad(xb, ((0, m_pad - m), (0, k_pad - k)))
    if k_pad != k or n_pad != n:
        w_q = jnp.pad(w_q, ((0, k_pad - k), (0, n_pad - n)))
    if n_pad != n:
        scale = jnp.pad(scale, (0, n_pad - n))
    grid = (m_pad // block_m, n_pad // block_n, k_pad // block_k)
    out = pl.pallas_call(
        functools.partial(_w8a16_kernel, n_k=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(xb, w_q, scale[None, :])
    return out[:m, :n].astype(x.dtype)


REPEATS = int(os.environ.get("BM_REPEATS", "30"))  # amortize ~30ms tunnel RTT


def run(name, fn, args, weight_bytes, iters=3):
    # repeat the whole scan REPEATS times inside one jit call so device time
    # dominates the ~30ms tunnel round trip
    def repeated(*a):
        def body(i, acc):
            return acc + fn(*a)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((), jnp.float32))

    jfn = jax.jit(repeated)
    np.asarray(jfn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(jfn(*args))
    dt = (time.perf_counter() - t0) / iters / REPEATS
    gbps = weight_bytes / dt / 1e9
    print(f"{name:12s}  {dt*1e3:8.3f} ms/scan  {gbps:7.1f} GB/s (weight bytes)", flush=True)
    return gbps


def main():
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w = jax.random.normal(kw, (L, K, N), jnp.float32) * 0.02
    w_bf = jax.device_put(w.astype(jnp.bfloat16))
    w_q, scale = jax.jit(jax.vmap(quantize_weights))(w)
    w_q = jax.device_put(w_q)
    scale = jax.device_put(scale)
    np.asarray(w_q[0, 0, :4]); np.asarray(w_bf[0, 0, :4])

    bf16_bytes = L * K * N * 2
    int8_bytes = L * K * N * 1

    print(f"M={M} K={K} N={N} L={L}", flush=True)

    # correctness spot check for the new kernel
    ref = np.asarray(x.astype(jnp.float32) @ (w_q[0].astype(jnp.float32) * scale[0][None, :]))
    got = np.asarray(w8a16_matmul(x, w_q[0], scale[0]).astype(jnp.float32))
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
    print(f"w8a16 rel err vs dequant ref: {err:.4e}", flush=True)

    def scanned_bf16(x, w_bf):
        def body(acc, wl):
            return acc + (x @ wl).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros((M, N), jnp.float32), w_bf)
        return acc.sum()

    def scanned_w8a8(x, w_q, scale):
        def body(acc, ws):
            wl, sl = ws
            return acc + int8_matmul(x, wl, sl).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros((M, N), jnp.float32), (w_q, scale))
        return acc.sum()

    def scanned_w8a16(x, w_q, scale):
        def body(acc, ws):
            wl, sl = ws
            return acc + w8a16_matmul(x, wl, sl).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros((M, N), jnp.float32), (w_q, scale))
        return acc.sum()

    def scanned_xla_mixed(x, w_q, scale):
        def body(acc, ws):
            wl, sl = ws
            wd = wl.astype(jnp.bfloat16) * sl[None, :].astype(jnp.bfloat16)
            return acc + (x @ wd).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros((M, N), jnp.float32), (w_q, scale))
        return acc.sum()

    r = {}
    r["xla_bf16"] = run("xla_bf16", scanned_bf16, (x, w_bf), bf16_bytes)
    r["w8a8"] = run("w8a8", scanned_w8a8, (x, w_q, scale), int8_bytes)
    r["w8a16"] = run("w8a16", scanned_w8a16, (x, w_q, scale), int8_bytes)
    r["xla_mixed"] = run("xla_mixed", scanned_xla_mixed, (x, w_q, scale), int8_bytes)

    # tokens/s factor vs bf16 for a weight-bound decode: time ratio per layer
    base = bf16_bytes / r["xla_bf16"]
    for k in ("w8a8", "w8a16", "xla_mixed"):
        t = int8_bytes / r[k]
        print(f"{k}: decode speedup vs bf16 = {base / t:.2f}x", flush=True)


if __name__ == "__main__":
    main()
