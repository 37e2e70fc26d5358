"""Prefill matmul throughput at serving shapes: is the int8/int4 MXU path
actually faster than bf16 on this chip?

Round-4 measurement: b40 prefill (new_tokens=1 pinned bench) is ~6.0 s —
exactly the bf16-MXU estimate for 397 TFLOP of LLaMA prefill — while the
roofline assumed the int8-MXU QuantDense path would run it ~2x faster.
This probe times the three weight paths on one (M, K, N) prefill-shaped
matmul so the prefill lever is chosen from data:

  BM_M rows (default 7040 = b40 x 176-token chunk), K=4096, N=11264.

Run: PYTHONPATH=.:$PYTHONPATH python tools/perf/bench_prefill_matmul.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.ops.quantized_matmul import (
    int4_matmul_packed,
    int8_matmul_packed,
    pack_int4_rows,
    pack_int8_rows,
    quantize_weights,
    quantize_weights_int4,
)

M = int(os.environ.get("BM_M", "7040"))
K = int(os.environ.get("BM_K", "4096"))
N = int(os.environ.get("BM_N", "11264"))
REPEATS = int(os.environ.get("BM_REPEATS", "8"))
FLOPS = 2.0 * M * K * N


def timeit(name, fn, *args):
    try:
        # reduce to a SCALAR inside jit: np.asarray on the raw (M, N)
        # product would pull ~160 MB through the tunnel inside the timed
        # region and dominate the measurement (first probe run measured
        # "0.9 TFLOP/s" bf16 that way, vs ~66 TFLOP/s on the real prefill)
        jitted = jax.jit(
            lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        np.asarray(jitted(*args))  # compile+warm; asarray forces sync (tunnel)
        t0 = time.perf_counter()
        for _ in range(REPEATS):
            out = jitted(*args)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / REPEATS
        print(f"{name}: {dt * 1e3:8.2f} ms  {FLOPS / dt / 1e12:6.1f} TFLOP/s")
        return dt
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}"[:300].replace("\n", " "))
        return None


def main():
    print(f"devices: {jax.devices()}  M={M} K={K} N={N} "
          f"({FLOPS / 1e12:.2f} TFLOP per matmul)")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 1), (K, N), jnp.float32) * 0.02

    wb = w.astype(jnp.bfloat16)
    timeit("bf16 dot          ", lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16), x, wb)

    q8, s8 = quantize_weights(w)
    wp8 = pack_int8_rows(q8)
    timeit("int8 packed mxu=T ", lambda a, p, s: int8_matmul_packed(
        a, p, s, int8_mxu=True), x, wp8, s8)
    timeit("int8 packed mxu=F ", lambda a, p, s: int8_matmul_packed(
        a, p, s, int8_mxu=False), x, wp8, s8)

    q4, s4 = quantize_weights_int4(w, group=1024)
    wp4 = pack_int4_rows(q4, block=1024)
    timeit("int4 packed mxu=T ", lambda a, p, s: int4_matmul_packed(
        a, p, s, group=1024, int8_mxu=True), x, wp4, s4)
    timeit("int4 packed mxu=F ", lambda a, p, s: int4_matmul_packed(
        a, p, s, group=1024, int8_mxu=False), x, wp4, s4)

    # raw XLA int8 dot for the MXU int8 peak (no dequant epilogue)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * 8), -127, 127).astype(jnp.int8)
    w8 = q8
    timeit("xla int8 dot      ", lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32), x8, w8)


if __name__ == "__main__":
    main()
