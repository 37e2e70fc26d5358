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


def pack_int8_rows(w_q: jax.Array) -> jax.Array:
    """(K, N) int8 -> (K/4, N) int32; byte b of word r = row 4r+b.

    The chip's DMA is element-rate limited (~170 Gelem/s measured on the
    tunnel chip), so int8 tensors stream at only half the bf16 BYTE rate.
    Packing 4 weights per int32 element restores the full byte rate;
    ``pltpu.bitcast(int32 (r, n) -> int8)`` unpacks to (4r, n) with row
    4r+b = byte b (little-endian), i.e. exactly the original tile — a vreg
    relayout, not per-element ALU work.
    """
    k, n = w_q.shape
    assert k % 4 == 0, "pad K to a multiple of 4 before packing"
    w = w_q.reshape(k // 4, 4, n).astype(jnp.int32) & 0xFF
    return w[:, 0] | (w[:, 1] << 8) | (w[:, 2] << 16) | (w[:, 3] << 24)


def unpack_int8_rows(w_p: jax.Array) -> jax.Array:
    """Inverse of ``pack_int8_rows`` in plain XLA (host/CPU fallback)."""
    kp, n = w_p.shape
    parts = [((w_p << (24 - 8 * b)) >> 24).astype(jnp.int8) for b in range(4)]
    return jnp.stack(parts, axis=1).reshape(kp * 4, n)


def _largest_divisor(x: int, cap: int, multiple: int) -> int:
    for cand in range(min(cap, x), 0, -1):
        if cand % multiple == 0 and x % cand == 0:
            return cand
    return multiple


def _packed_kernel(*refs, n_k: int, int8_mxu: bool, has_rs: bool):
    from jax.experimental.pallas import tpu as _pltpu

    if has_rs:
        x_ref, w_ref, scale_ref, rs_ref, o_ref, acc_ref = refs
    else:
        x_ref, w_ref, scale_ref, o_ref, acc_ref = refs
        rs_ref = None
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w8 = _pltpu.bitcast(w_ref[...], jnp.int8)  # (block_k, block_n) relayout
    dims = (((1,), (0,)), ((), ()))
    if int8_mxu:
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], w8, dims, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
    else:
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], w8.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == n_k - 1)
    def _finish():
        out = acc_ref[...] * scale_ref[0].astype(jnp.float32)
        if rs_ref is not None:
            out = out * rs_ref[...].astype(jnp.float32)
        # store in the caller dtype: an f32 output materialized a 1.41 GB
        # activation temp per prefill matmul at b24
        o_ref[...] = out.astype(o_ref.dtype)


def int8_matmul_packed(
    x: jax.Array,  # (M, K) bf16/f32
    w_p: jax.Array,  # (K/4, N) int32 packed int8
    scale: jax.Array,  # (N,) f32 per-channel
    *,
    int8_mxu: bool = True,
    block_m: int = 256,
) -> jax.Array:
    """x @ dequant(unpack(w_p)) -> (M, N) in x.dtype.

    int8 weights stored packed 4-per-int32 stream at the full DMA byte rate
    (the narrow-dtype path caps at half, see ``pack_int8_rows``). With
    ``int8_mxu`` activations quantize per-row to int8 and the MXU runs
    int8 x int8 -> int32; otherwise weights convert to bf16 in VMEM (one VPU
    op/element) and the MXU runs bf16.
    """
    m, k = x.shape
    kp, n = w_p.shape
    assert kp * 4 == k, (k, kp)
    if jax.devices()[0].platform not in ("tpu", "axon"):
        w = unpack_int8_rows(w_p).astype(jnp.float32) * scale[None, :]
        return jnp.dot(x.astype(jnp.float32), w).astype(x.dtype)

    if int8_mxu:
        # quantize in the input dtype: an f32 (M, K) intermediate materializes
        # otherwise (713 MB per prefill matmul at b24); bf16 is exact for the
        # int range and adds <0.4% on top of the int8 rounding
        row_amax = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32)
        row_scale = jnp.where(row_amax > 0, row_amax / 127.0, 1.0)
        inv = (1.0 / row_scale).astype(x.dtype)
        xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
        min_m = 32  # int8 sublane tile
    else:
        xq = x.astype(jnp.bfloat16)
        row_scale = None
        min_m = 16

    block_m = min(block_m, max(min_m, -(-m // min_m) * min_m))
    # block_kp * 4 is the x-block lane dim -> must be a 128-multiple.
    # Prefer FEW LARGE blocks: each grid step costs ~4-6 us of DMA latency
    # on this chip, so tiny tiles (e.g. 344 steps for an 11008-K matmul)
    # dominate decode. Caps keep a weight block <= 8 MB of VMEM.
    block_kp = _largest_divisor(kp, 512, 32)
    # weight block <= 3 MB: Mosaic's scoped-vmem stack limit is 16 MB and
    # holds the double-buffered weight block + accumulator + x/out tiles
    block_n = _largest_divisor(n, max(128, (3 << 20) // (block_kp * 4)), 128)
    if m % block_m:
        xq = jnp.pad(xq, ((0, block_m - m % block_m), (0, 0)))
    m_pad = xq.shape[0]

    grid = (m_pad // block_m, n // block_n, kp // block_kp)
    in_specs = [
        pl.BlockSpec((block_m, block_kp * 4), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((block_kp, block_n), lambda i, j, kk: (kk, j)),
        pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
    ]
    operands = [xq, w_p, scale[None, :]]
    if row_scale is not None:
        rs = row_scale.astype(jnp.float32)
        if m % block_m:
            rs = jnp.pad(rs, ((0, block_m - m % block_m), (0, 0)))
        in_specs.append(pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0)))
        operands.append(rs)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, n_k=grid[2], int8_mxu=int8_mxu,
                          has_rs=row_scale is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*operands)
    return out[:m, :n]


# ------------------------------------------------------------------ #
# int4: 8 weights per int32 word, per-(K-group, channel) scales
# ------------------------------------------------------------------ #


def quantize_weights_int4(w: jax.Array, group: int = 1024
                          ) -> tuple[jax.Array, jax.Array]:
    """(K, N) float -> (int4 values in an int8 carrier (K, N),
    scales (K/group, N) f32). Symmetric round-to-nearest per
    (K-group, output channel); range [-7, 7] keeps the grid symmetric.

    group defaults to the decode kernels' K-chunk (ck) so the per-chunk
    scale folds into the accumulation step for free."""
    k, n = w.shape
    assert k % group == 0, (k, group)
    wf = jnp.asarray(w, jnp.float32).reshape(k // group, group, n)
    amax = jnp.max(jnp.abs(wf), axis=1)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)  # (K/group, N)
    q = jnp.clip(jnp.round(wf / scale[:, None, :]), -7, 7)
    return q.reshape(k, n).astype(jnp.int8), scale.astype(jnp.float32)


def pack_int4_rows(w_q: jax.Array, block: int | None = None) -> jax.Array:
    """int4 values (K, N) int8-carried -> (K/8, N) int32, BIASED nibbles.

    Nibbles store q + 8 (q in [-7, 7] -> 1..15, always non-negative), so
    in-kernel unpacking is mask + bitcast with NO sign extension — the -8
    bias folds algebraically into the matmul as a rank-1 correction:
    dot(x, U - 8) = dot(x, U) - 8 * rowsum(x). (Per-byte sign extension
    inside an int32 word needs borrow-prone SWAR tricks Mosaic has no
    primitives for.)

    Within each K-``block`` (default: all of K), byte b of word r carries
    rows (4r+b) [lo nibble] and (block/2 + 4r+b) [hi nibble]: masking with
    0x0F0F0F0F and bitcasting to int8 yields ``pack_int8_rows``-ordered
    rows 0..block/2-1 of the block; ``>> 4`` yields rows block/2..block-1
    — two contiguous halves, so the dot is two half-K matmuls on
    statically sliced activations. ``block`` must equal the consuming
    kernel's K-block."""
    k, n = w_q.shape
    assert k % 8 == 0
    if block is None:
        block = k
    assert k % block == 0 and block % 8 == 0
    wq = (w_q.astype(jnp.int32) + 8) & 0xF
    wb = wq.astype(jnp.int8).reshape(k // block, block, n)
    half = block // 2
    lo = jax.vmap(lambda b: pack_int8_rows(b[:half]))(wb)
    hi = jax.vmap(lambda b: pack_int8_rows(b[half:]))(wb)
    return (lo | (hi << 4)).reshape(k // 8, n)


def unpack_int4_rows(w_p: jax.Array, block: int | None = None) -> jax.Array:
    """Inverse of pack_int4_rows in plain XLA -> int4 values in int8."""
    kp, n = w_p.shape
    if block is None:
        block = kp * 8
    wb = w_p.reshape(kp * 8 // block, block // 8, n)
    lo = jax.vmap(unpack_int8_rows)(wb & 0x0F0F0F0F)
    hi = jax.vmap(unpack_int8_rows)((wb >> 4) & 0x0F0F0F0F)
    u = jnp.concatenate([lo, hi], axis=1).reshape(kp * 8, n)
    return (u.astype(jnp.int32) - 8).astype(jnp.int8)


def _packed4_kernel(x_ref, w_ref, scale_ref, rs_ref, o_ref, acc_ref,
                    *, n_k: int, int8_mxu: bool):
    """W4A8 matmul step: int32 words -> two contiguous int8 row-halves via
    nibble sign-extension (3 int32 VPU ops per 4 weights) + bitcast; the
    per-(K-block, channel) weight scale folds into this step's rescale so
    grouped int4 costs one extra (M, N) multiply per K-block."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w32 = w_ref[...]
    lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)        # biased u = q+8
    hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)
    bk4 = lo.shape[0]  # block_k // 2
    dims = (((1,), (0,)), ((), ()))
    x = x_ref[...]
    if int8_mxu:
        part = (jax.lax.dot_general(x[:, :bk4], lo, dims,
                                    preferred_element_type=jnp.int32)
                + jax.lax.dot_general(x[:, bk4:], hi, dims,
                                      preferred_element_type=jnp.int32)
                ).astype(jnp.float32)
        rowsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    else:
        part = (jax.lax.dot_general(x[:, :bk4], lo.astype(jnp.bfloat16),
                                    dims, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(x[:, bk4:], hi.astype(jnp.bfloat16),
                                      dims, preferred_element_type=jnp.float32))
        rowsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    # fold the -8 nibble bias: dot(x, U-8) = dot(x, U) - 8*rowsum(x)
    acc_ref[...] += (part - 8.0 * rowsum) * scale_ref[0].astype(jnp.float32)

    @pl.when(ki == n_k - 1)
    def _finish():
        out = acc_ref[...]
        if rs_ref is not None:
            out = out * rs_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


def int4_matmul_packed(
    x: jax.Array,  # (M, K) bf16/f32
    w_p: jax.Array,  # (K/8, N) int32 packed int4 (pack_int4_rows)
    scale: jax.Array,  # (K/group, N) f32 per-(K-group, channel)
    *,
    group: int = 1024,
    int8_mxu: bool = True,
    block_m: int = 256,
) -> jax.Array:
    """x @ dequant(unpack4(w_p)) -> (M, N) in x.dtype.

    Same contract as ``int8_matmul_packed`` at half the weight bytes; the
    K-block is pinned to the scale group so each accumulation step applies
    its group's scale exactly."""
    m, k = x.shape
    kp, n = w_p.shape
    assert kp * 8 == k, (k, kp)
    assert k % group == 0 and scale.shape == (k // group, n)
    if jax.devices()[0].platform not in ("tpu", "axon"):
        wv = unpack_int4_rows(w_p, block=group).astype(jnp.float32)
        wv = wv.reshape(k // group, group, n) * scale[:, None, :]
        return jnp.dot(x.astype(jnp.float32),
                       wv.reshape(k, n)).astype(x.dtype)

    if int8_mxu:
        row_amax = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32)
        row_scale = jnp.where(row_amax > 0, row_amax / 127.0, 1.0)
        inv = (1.0 / row_scale).astype(x.dtype)
        xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
        min_m = 32
    else:
        xq = x.astype(jnp.bfloat16)
        row_scale = None
        min_m = 16

    block_m = min(block_m, max(min_m, -(-m // min_m) * min_m))
    block_k = group  # one scale row per K-block
    # cap by weight-block bytes AND the f32 accumulator (block_m x block_n):
    # n=12288 with the weight-only cap chose 6144 -> 6.3 MB acc, busting the
    # 16 MB scoped-vmem stack
    block_n = _largest_divisor(
        n, max(128, min((3 << 20) // (block_k // 2), 2048)), 128)
    if m % block_m:
        xq = jnp.pad(xq, ((0, block_m - m % block_m), (0, 0)))
    m_pad = xq.shape[0]

    grid = (m_pad // block_m, n // block_n, k // block_k)
    # x halves must pair with the in-block row halves: rows of block kk are
    # [kk*bk, kk*bk + bk) in order (pack_int4_rows halves are block-local
    # when the packing is done per K-block) — pack per group upstream.
    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((block_k // 8, block_n), lambda i, j, kk: (kk, j)),
        # (K/group, 1, N): a (1, 1, bn) block keeps the sublane dim equal
        # to the full middle axis (Mosaic tiling rule for sub-8 blocks)
        pl.BlockSpec((1, 1, block_n), lambda i, j, kk: (kk, 0, j)),
    ]
    operands = [xq, w_p, scale[:, None, :]]
    if row_scale is not None:
        rs = row_scale.astype(jnp.float32)
        if m % block_m:
            rs = jnp.pad(rs, ((0, block_m - m % block_m), (0, 0)))
        in_specs.append(pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0)))
        operands.append(rs)
        kern = functools.partial(_packed4_kernel, n_k=grid[2],
                                 int8_mxu=int8_mxu)
    else:
        def kern(x_ref, w_ref, s_ref, o_ref, acc_ref):
            return _packed4_kernel(x_ref, w_ref, s_ref, None, o_ref, acc_ref,
                                   n_k=grid[2], int8_mxu=int8_mxu)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*operands)
    return out[:m, :n]


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
