"""Int8-weight matmul: Pallas kernel with in-VMEM dequantization.

Serving-time weight quantization for the MM2SG decoder. Greedy decode is
HBM-bandwidth bound (weights stream once per token), so storing kernels as
int8 + per-output-channel scales halves the bytes — the kernel loads int8
tiles into VMEM, converts in-register, and accumulates in f32, so the bf16
weights never materialize in HBM (a plain ``astype`` dequant would).

The reference reaches for bitsandbytes NF4 for GPU memory (train.py:1098-1114);
on TPU quantization is purely a bandwidth/throughput lever.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weights(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(K, N) float -> (int8 (K, N), scale (N,) f32), symmetric per-channel."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _kernel(x_ref, w_ref, scale_ref, o_ref, acc_ref, *, n_k: int):
    """W8A8: int8 activations x int8 weights on the MXU, int32 accumulation.

    The weight tensor (the big, bandwidth-bound side) never converts on the
    VPU — the MXU consumes int8 directly; only the final (M, N) tile rescales
    by the per-channel weight scale (the per-row activation scale applies
    outside, fused by XLA into the surrounding elementwise ops).
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(ki == n_k - 1)
    def _finish():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * scale_ref[0].astype(jnp.float32)
        ).astype(o_ref.dtype)


def int8_matmul(
    x: jax.Array,  # (M, K) bf16/f32
    w_q: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (N,) f32
    *,
    block_m: int = 128,
    block_k: int = 2048,  # best measured on v5e-class HW (CLAUDE.md perf notes)
    block_n: int = 1024,
) -> jax.Array:
    """x @ dequant(w_q) with per-channel scales -> (M, N) in x.dtype.

    W8A8 on TPU: activations quantize dynamically per row (symmetric int8),
    the MXU multiplies int8 x int8 into int32, and the result rescales by
    (row_scale x channel_scale). Off-TPU falls back to float dequant.
    """
    m, k = x.shape
    _, n = w_q.shape
    if jax.devices()[0].platform != "tpu":
        w = w_q.astype(jnp.float32) * scale[None, :]
        return jnp.dot(x.astype(jnp.float32), w).astype(x.dtype)

    # dynamic per-row activation quantization (x is small: tokens x K)
    xf = x.astype(jnp.float32)
    row_amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    row_scale = jnp.where(row_amax > 0, row_amax / 127.0, 1.0)
    x_q = jnp.clip(jnp.round(xf / row_scale), -127, 127).astype(jnp.int8)

    block_m = min(block_m, max(32, -(-m // 32) * 32))  # int8 sublane tile is 32
    block_k = min(block_k, k)
    block_n = min(block_n, n)
    m_pad = -(-m // block_m) * block_m
    k_pad = -(-k // block_k) * block_k
    n_pad = -(-n // block_n) * block_n
    if m_pad != m:
        x_q = jnp.pad(x_q, ((0, m_pad - m), (0, 0)))
    if k_pad != k:
        x_q = jnp.pad(x_q, ((0, 0), (0, k_pad - k)))
        w_q = jnp.pad(w_q, ((0, k_pad - k), (0, 0)))
    if n_pad != n:
        w_q = jnp.pad(w_q, ((0, 0), (0, n_pad - n)))
        scale = jnp.pad(scale, (0, n_pad - n))

    grid = (m_pad // block_m, n_pad // block_n, k_pad // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel, n_k=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x_q, w_q, scale[None, :])
    # per-row activation rescale (fused by XLA into consumers)
    return (out[:m, :n] * row_scale).astype(x.dtype)


def quantize_param_tree(params, path_predicate) -> tuple[dict, dict]:
    """Split a flax param tree: kernels selected by ``path_predicate`` are
    quantized into a side table {path: (w_q, scale)}; the original leaves are
    replaced with int8 placeholders to free memory.

    Returns (new_params, quant_table)."""
    import jax.tree_util as jtu

    quant = {}

    def visit(path, leaf):
        ps = "/".join(str(getattr(k, "key", k)) for k in path)
        if path_predicate(ps, leaf):
            q, s = quantize_weights(leaf)
            quant[ps] = {"w_q": q, "scale": s}
            return q  # placeholder keeps tree structure; unused at runtime
        return leaf

    new_params = jtu.tree_map_with_path(visit, params)
    return new_params, quant
