"""Fused o-projection + MLP kernel for the decode hot path.

Decode on this chip is per-kernel-overhead bound (~0.14 ms fixed per
pallas/XLA matmul call; grid steps are nearly free — CLAUDE.md perf notes),
so the lever is fewer kernels per layer, not faster streaming. This kernel
collapses the block's tail — o_proj, attention residual, RMSNorm, gate_up,
SiLU·mul, down_proj, MLP residual — into ONE pallas call with three matmul
phases over a 1-D grid:

  phase 1 (o):       x2 = x_res + attn @ Wo            -> VMEM scratch
                     h  = rms_norm(x2) * scale          (end of phase)
  phase 2 (gate_up): gu = h @ Wgu                      -> VMEM scratch
                     m  = silu(gu[:, :F]) * gu[:, F:]   (end of phase)
  phase 3 (down):    out = x2 + m @ Wd                 -> output

Weights are the packed int8-in-int32 layout (4 per element,
``pack_int8_rows``) dequantized to bf16 in VMEM; operands outside their
phase park on block (0, 0) so Mosaic re-uses the resident tile (no DMA).

Reference equivalence: this is exactly `LlamaBlock`'s post-attention tail
(models/llama.py); numerics tested against the unfused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmor_tpu.ops.quantized_matmul import _largest_divisor, unpack_int8_rows


def _kernel(attn_ref, res_ref, nscale_ref,
            wo_ref, wos_ref, wgu_ref, wgus_ref, wd_ref, wds_ref,
            o_ref,
            x2_ref, h_ref, gu_ref, m_ref, acc_ref,
            *, s1, s2, s3, k1, k2, k3, bn1, bn2, bn3, bk2, bk3,
            d, eps):
    s = pl.program_id(0)
    dims = (((1,), (0,)), ((), ()))

    def mm(x, w_ref):
        w8 = pltpu.bitcast(w_ref[...], jnp.int8)
        return jax.lax.dot_general(
            x, w8.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)

    in_p1 = s < s1
    in_p2 = jnp.logical_and(s >= s1, s < s1 + s2)
    in_p3 = s >= s1 + s2

    @pl.when(jnp.logical_and(in_p1, (s % k1) == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(in_p1)
    def _():  # o_proj: attn K-slice @ Wo-block
        kk = s % k1
        x = attn_ref[:, pl.dslice(kk * wo_ref.shape[0] * 4,
                                  wo_ref.shape[0] * 4)]
        acc_ref[:, pl.dslice(0, bn1)] += mm(x, wo_ref)

    @pl.when(jnp.logical_and(in_p1, (s % k1) == k1 - 1))
    def _():  # finish an o n-block: residual add into x2 scratch
        j = s // k1
        out = (acc_ref[:, pl.dslice(0, bn1)]
               * wos_ref[0].astype(jnp.float32))
        x2_ref[:, pl.dslice(j * bn1, bn1)] = (
            res_ref[:, pl.dslice(j * bn1, bn1)].astype(jnp.float32) + out)

    @pl.when(s == s1)
    def _():  # RMSNorm of x2 -> h (bf16)
        x2 = x2_ref[...]
        var = jnp.mean(x2 * x2, axis=-1, keepdims=True)
        h = x2 * jax.lax.rsqrt(var + eps) * nscale_ref[0].astype(jnp.float32)
        h_ref[...] = h.astype(jnp.bfloat16)

    @pl.when(jnp.logical_and(in_p2, ((s - s1) % k2) == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(in_p2)
    def _():  # gate_up: h-slice @ Wgu-block
        kk = (s - s1) % k2
        x = h_ref[:, pl.dslice(kk * bk2 * 4, bk2 * 4)]
        acc_ref[:, pl.dslice(0, bn2)] += mm(x, wgu_ref)

    @pl.when(jnp.logical_and(in_p2, ((s - s1) % k2) == k2 - 1))
    def _():
        j = (s - s1) // k2
        gu_ref[:, pl.dslice(j * bn2, bn2)] = (
            acc_ref[:, pl.dslice(0, bn2)]
            * wgus_ref[0, pl.dslice(0, bn2)].astype(jnp.float32))

    @pl.when(s == s1 + s2)
    def _():  # silu(gate) * up -> m (bf16)
        f = gu_ref.shape[1] // 2
        gate = gu_ref[:, pl.dslice(0, f)]
        up = gu_ref[:, pl.dslice(f, f)]
        m_ref[...] = ((gate * jax.nn.sigmoid(gate)) * up).astype(jnp.bfloat16)

    @pl.when(jnp.logical_and(in_p3, ((s - s1 - s2) % k3) == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(in_p3)
    def _():  # down: m-slice @ Wd-block
        kk = (s - s1 - s2) % k3
        x = m_ref[:, pl.dslice(kk * bk3 * 4, bk3 * 4)]
        acc_ref[:, pl.dslice(0, bn3)] += mm(x, wd_ref)

    @pl.when(jnp.logical_and(in_p3, ((s - s1 - s2) % k3) == k3 - 1))
    def _():  # finish: MLP residual onto x2, write output block
        j = (s - s1 - s2) // k3
        out = (acc_ref[:, pl.dslice(0, bn3)]
               * wds_ref[0, pl.dslice(0, bn3)].astype(jnp.float32))
        o_ref[...] = (x2_ref[:, pl.dslice(j * bn3, bn3)] + out
                      ).astype(o_ref.dtype)


def fused_o_mlp(
    attn: jax.Array,  # (B, Dq) attention output (heads already flattened)
    x_res: jax.Array,  # (B, D) pre-attention residual stream
    norm_scale: jax.Array,  # (D,) mlp_norm scale
    wo_p, wo_s,  # packed o_proj (Dq/4, D) + (D,)
    wgu_p, wgu_s,  # packed gate_up (D/4, 2F) + (2F,)
    wd_p, wd_s,  # packed down (F/4, D) + (D,)
    *,
    norm_eps: float = 1e-5,
) -> jax.Array:
    """One-call o_proj + residual + RMSNorm + SwiGLU MLP + residual."""
    b, dq = attn.shape
    d = x_res.shape[1]
    f2 = wgu_p.shape[1]
    f = f2 // 2

    if jax.devices()[0].platform not in ("tpu", "axon"):
        wo = unpack_int8_rows(wo_p).astype(jnp.float32) * wo_s[None]
        wgu = unpack_int8_rows(wgu_p).astype(jnp.float32) * wgu_s[None]
        wd = unpack_int8_rows(wd_p).astype(jnp.float32) * wd_s[None]
        x2 = x_res.astype(jnp.float32) + attn.astype(jnp.float32) @ wo
        var = jnp.mean(x2 * x2, axis=-1, keepdims=True)
        h = x2 * jax.lax.rsqrt(var + norm_eps) * norm_scale.astype(jnp.float32)
        gu = h @ wgu
        m = jax.nn.silu(gu[:, :f]) * gu[:, f:]
        return (x2 + m @ wd).astype(x_res.dtype)

    block_m = max(16, -(-b // 16) * 16)
    attn_b = attn.astype(jnp.bfloat16)
    res_b = x_res
    if b % block_m:
        pad = block_m - b % block_m
        attn_b = jnp.pad(attn_b, ((0, pad), (0, 0)))
        res_b = jnp.pad(res_b, ((0, pad), (0, 0)))
    m_pad = attn_b.shape[0]

    bk1 = _largest_divisor(dq // 4, 512, 32)
    bn1 = _largest_divisor(d, 512, 128)
    bk2 = _largest_divisor(d // 4, 512, 32)
    bn2 = _largest_divisor(f2, 512, 128)
    bk3 = _largest_divisor(f // 4, 512, 32)
    bn3 = _largest_divisor(d, 512, 128)
    k1, n1 = (dq // 4) // bk1, d // bn1
    k2, n2 = (d // 4) // bk2, f2 // bn2
    k3, n3 = (f // 4) // bk3, d // bn3
    s1, s2, s3 = n1 * k1, n2 * k2, n3 * k3
    bn_acc = max(bn1, bn2, bn3)

    def park(lo, hi, f_idx):
        # block index map active in [lo, hi), parked at block 0 otherwise
        def index(s):
            inside = jnp.logical_and(s >= lo, s < hi)
            r, c = f_idx(s - lo)
            return (jnp.where(inside, r, 0), jnp.where(inside, c, 0))
        return index

    grid = (s1 + s2 + s3,)
    kernel = functools.partial(
        _kernel, s1=s1, s2=s2, s3=s3, k1=k1, k2=k2, k3=k3,
        bn1=bn1, bn2=bn2, bn3=bn3, bk2=bk2, bk3=bk3,
        d=d, eps=norm_eps)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, dq), lambda s: (0, 0)),  # attn, resident
            pl.BlockSpec((m_pad, d), lambda s: (0, 0)),   # residual
            pl.BlockSpec((1, d), lambda s: (0, 0)),       # norm scale
            pl.BlockSpec((bk1, bn1),
                         park(0, s1, lambda t: (t % k1, t // k1))),
            pl.BlockSpec((1, bn1),
                         park(0, s1, lambda t: (0, t // k1))),
            pl.BlockSpec((bk2, bn2),
                         park(s1, s1 + s2, lambda t: (t % k2, t // k2))),
            pl.BlockSpec((1, bn2),
                         park(s1, s1 + s2, lambda t: (0, t // k2))),
            pl.BlockSpec((bk3, bn3),
                         park(s1 + s2, s1 + s2 + s3,
                              lambda t: (t % k3, t // k3))),
            pl.BlockSpec((1, bn3),
                         park(s1 + s2, s1 + s2 + s3, lambda t: (0, t // k3))),
        ],
        out_specs=pl.BlockSpec(
            (m_pad, bn3),
            park(s1 + s2, s1 + s2 + s3, lambda t: (0, t // k3))),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x_res.dtype),
        scratch_shapes=[
            pltpu.VMEM((m_pad, d), jnp.float32),      # x2
            pltpu.VMEM((m_pad, d), jnp.bfloat16),     # h
            pltpu.VMEM((m_pad, f2), jnp.float32),     # gu
            pltpu.VMEM((m_pad, f), jnp.bfloat16),     # m
            pltpu.VMEM((m_pad, bn_acc), jnp.float32), # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(attn_b, res_b, norm_scale[None, :], wo_p, wo_s[None, :],
      wgu_p, wgu_s[None, :], wd_p, wd_s[None, :])
    return out[:b]
