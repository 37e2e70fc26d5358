"""Weight-streaming rate probes with RTT-proof timing.

Timing rule learned the hard way: a fori_loop whose body recomputes the same
pure expression gets CSE-hoisted by XLA — you measure tunnel RTT/REPEATS, not
device time. Every loop here carries a data dependency into the next
iteration (x is perturbed by acc * 1e-38, which bf16 rounds away numerically
but the compiler cannot elide).

Ground truth from real decode runs (round 1): bf16 weights stream ~600 GB/s
during while_loop decode; the W8A8 int8 kernel streamed only ~117 GB/s.
Candidates to close the gap:
  w8a8   — int8 DMA, int8 MXU (current kernel)
  w8a16  — int8 DMA, VPU int8->bf16 convert, bf16 MXU
  w8p    — int32-packed DMA (4 int8/elem), VPU shift-unpack, bf16 MXU
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

from tools.perf.bench_packed import pack4_int8, wp_matmul
from tools.perf.bench_w8a16 import w8a16_matmul
from mmor_tpu.ops.quantized_matmul import int8_matmul, quantize_weights

M = int(os.environ.get("BM_M", "16"))
K = 4096
N = 11264
L = 8
REPEATS = int(os.environ.get("BM_REPEATS", "20"))


def chained(scan_fn):
    """scan_fn(x, *weights) -> scalar. Chain REPEATS evaluations through a
    perturbation of x so XLA cannot hoist the body out of the loop."""

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
    total = (time.perf_counter() - t0) / iters
    dt = total / REPEATS  # per scan; RTT contributes RTT/REPEATS ~ 1.5us noise... no:
    # RTT ~30ms / REPEATS=20 = 1.5ms — still visible. Report both.
    gbps = weight_bytes / dt / 1e9
    print(f"{name:12s}  {dt*1e3:8.3f} ms/scan  {gbps:7.1f} GB/s "
          f"(call total {total*1e3:.1f} ms)", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (M, K), jnp.bfloat16)
    w = jax.random.normal(kw, (L, K, N), jnp.float32) * 0.02
    w_bf = jax.device_put(w.astype(jnp.bfloat16))
    w_q, scale = jax.jit(jax.vmap(quantize_weights))(w)
    w_p8 = jax.jit(jax.vmap(pack4_int8))(w_q)
    for a in (x, w_bf, w_q, scale, w_p8):
        np.asarray(jax.device_put(a)[..., :1])

    print(f"M={M} K={K} N={N} L={L} REPEATS={REPEATS}", flush=True)

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

    bf16_bytes = L * K * N * 2
    int8_bytes = L * K * N

    tb = timeit("xla_bf16", chained(scan_bf16), (x, w_bf), bf16_bytes)
    t88 = timeit("w8a8", chained(mk(int8_matmul)), (x, w_q, scale), int8_bytes)
    t816 = timeit("w8a16", chained(mk(w8a16_matmul)), (x, w_q, scale), int8_bytes)
    t8p = timeit("w8p", chained(mk(functools.partial(
        wp_matmul, parts=4, bits=8, block_kp=1024, block_n=512))),
        (x, w_p8, scale), int8_bytes)
    print(f"per-token speedup vs bf16: w8a8={tb/t88:.2f}x w8a16={tb/t816:.2f}x "
          f"w8p={tb/t8p:.2f}x", flush=True)


if __name__ == "__main__":
    main()
