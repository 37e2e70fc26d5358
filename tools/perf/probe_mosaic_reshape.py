"""Probe which Mosaic ops the sampler kernel needs are legal on this chip.

The round-4 on-chip run showed the Pallas deformable sampler failing with
`infer-vector-layout: unsupported shape cast`. The kernel contains two
reshapes and one lane-dim matmul; this script compiles each in isolation so
the fix targets the actual offender instead of a guess:

  a. value reshape (TQ, WH, WW) -> (TQ, WH*WW)   [lane-dim merge]
  b. value reshape (WH, WW, D) -> (WH*WW, D)     [leading+sublane merge]
  c. dot_general ((0,),(0,)) transposed-lhs       [S^T (K, TQ) path]
  d. 2-contracting-dim dot_general                [no-reshape path]

Run: PYTHONPATH=.:$PYTHONPATH python tools/perf/probe_mosaic_reshape.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TQ, WH, WW, D = 256, 32, 40, 32
K = WH * WW


def probe(name, kernel, out_shape, *args):
    try:
        fn = pl.pallas_call(kernel, out_shape=out_shape)
        res = np.asarray(jax.jit(fn)(*args))
        print(f"[OK ] {name}: out_sum={res.sum():.3f}")
        return True
    except Exception as e:
        msg = f"{type(e).__name__}: {e}".replace("\n", " ")[:180]
        print(f"[FAIL] {name}: {msg}")
        return False


def main():
    print("devices:", jax.devices())
    s3 = jnp.ones((TQ, WH, WW), jnp.float32)
    win = jnp.ones((WH, WW, D), jnp.float32)

    def k_a(s_ref, o_ref):
        o_ref[...] = s_ref[...].reshape(TQ, K)

    probe("a. (TQ,WH,WW)->(TQ,K) lane merge", k_a,
          jax.ShapeDtypeStruct((TQ, K), jnp.float32), s3)

    def k_b(w_ref, o_ref):
        o_ref[...] = w_ref[...].reshape(K, D)

    probe("b. (WH,WW,D)->(K,D) sublane merge", k_b,
          jax.ShapeDtypeStruct((K, D), jnp.float32), win)

    st = jnp.ones((K, TQ), jnp.float32)
    v2 = jnp.ones((K, D), jnp.float32)

    def k_c(s_ref, v_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            s_ref[...], v_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    probe("c. dot_general lhs-transposed (K,TQ)x(K,D)", k_c,
          jax.ShapeDtypeStruct((TQ, D), jnp.float32), st, v2)

    def k_d(s_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            s_ref[...], w_ref[...], (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)

    probe("d. dot_general 2 contracting dims", k_d,
          jax.ShapeDtypeStruct((TQ, D), jnp.float32), s3, win)

    # e. the transposed factorized build end-to-end: build S^T in-kernel
    # from (WH,1,TQ)/(1,WW,TQ) one-hot factors, collapse leading dims, then
    # the transposed matmul — the full shape of the planned sampler fix
    def k_e(w_ref, o_ref):
        ity = jax.lax.broadcasted_iota(jnp.int32, (WH, 1, TQ), 0)
        itx = jax.lax.broadcasted_iota(jnp.int32, (1, WW, TQ), 1)
        wy = jnp.where(ity == 3, 1.0, 0.0)
        wx = jnp.where(itx == 5, 0.5, 0.0)
        s_t = (wy * wx).reshape(K, TQ)
        o_ref[...] = jax.lax.dot_general(
            s_t, w_ref[...].reshape(K, D), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    probe("e. full transposed-S build", k_e,
          jax.ShapeDtypeStruct((TQ, D), jnp.float32), win)


if __name__ == "__main__":
    main()
