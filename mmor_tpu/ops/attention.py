"""Attention ops: Pallas TPU flash attention + XLA reference, KV-cache decode step.

TPU-native replacement for the reference's CUDA flash-attn usage
(`LLaVA/llava/train/llama_flash_attn_monkey_patch.py`, PTv3
`SerializedAttention`, `pointtransformerv3.py:322-493`). The Pallas kernel
follows the online-softmax tiling strategy (one pass over KV blocks with
running max / sum / accumulator in VMEM scratch).

Conventions: activations are (batch, num_heads, seq, head_dim); segment ids
are (batch, seq) int32 — attention is masked to equal segments, which covers
both padding (segment 0 vs 1) and PTv3's variable-length patch attention.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    sm_scale: float | None = None,
) -> jax.Array:
    """Plain XLA attention; the numerics oracle for the Pallas kernel.

    Also the CPU fallback and (for now) the recompute backward for training.
    """
    *_, sq, head_dim = q.shape
    sk = k.shape[-2]
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(head_dim)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    mask = None
    if causal:
        mask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)[None, None]
    if segment_ids is not None:
        kv_seg = segment_ids if kv_segment_ids is None else kv_segment_ids
        seg_mask = segment_ids[:, None, :, None] == kv_seg[:, None, None, :]
        mask = seg_mask if mask is None else (mask & seg_mask)
    if mask is not None:
        logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)


def _flash_kernel(
    q_ref,
    k_ref,
    v_ref,
    q_seg_ref,
    kv_seg_ref,
    o_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_kv: int,
    kv_len: int,
):
    """One (batch*head, q_block, kv_block) grid step of online-softmax attention."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        # m/l live lane-replicated in (block_q, 128) f32 scratch for tiling.
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    should_run = True
    if causal:
        # Skip fully-masked kv blocks above the diagonal.
        should_run = ki * block_kv <= qi * block_q + block_q - 1

    @pl.when(should_run)
    def _run():
        q = q_ref[0].astype(jnp.float32)  # (block_q, d)
        k = k_ref[0].astype(jnp.float32)  # (block_kv, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # (block_q, block_kv)

        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 0
        )
        kv_pos = ki * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 1
        )
        mask = kv_pos < kv_len
        if causal:
            mask &= kv_pos <= q_pos
        q_seg = q_seg_ref[0, 0]  # (block_q,)
        kv_seg = kv_seg_ref[0, 0]  # (block_kv,)
        mask &= q_seg[:, None] == kv_seg[None, :]
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[:, 0:1]  # (block_q, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)  # (block_q, 1)
        p = jnp.exp(s - m_new)  # (block_q, block_kv)
        l_new = alpha * l_scratch[:, 0:1] + jnp.sum(p, axis=1, keepdims=True)
        acc_scratch[...] = acc_scratch[...] * alpha + jax.lax.dot_general(
            p,
            v_ref[0].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        lanes = m_scratch.shape[1]
        m_scratch[...] = jnp.broadcast_to(m_new, (m_new.shape[0], lanes))
        l_scratch[...] = jnp.broadcast_to(l_new, (l_new.shape[0], lanes))

    @pl.when(ki == pl.num_programs(2) - 1)
    def _finish():
        # Rows whose every key was masked (e.g. padding queries) get zeros.
        l = l_scratch[:, 0:1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[...] / safe_l).astype(o_ref.dtype)


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_segment_ids: jax.Array,
    kv_segment_ids: jax.Array,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_kv: int,
) -> jax.Array:
    batch, heads, sq, head_dim = q.shape
    sk = k.shape[-2]
    block_q = min(block_q, sq)
    block_kv = min(block_kv, sk)
    sq_pad = pl.cdiv(sq, block_q) * block_q
    sk_pad = pl.cdiv(sk, block_kv) * block_kv
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
        q_segment_ids = jnp.pad(
            q_segment_ids, ((0, 0), (0, sq_pad - sq)), constant_values=-1
        )
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        kv_segment_ids = jnp.pad(
            kv_segment_ids, ((0, 0), (0, sk_pad - sk)), constant_values=-2
        )

    bh = batch * heads
    q = q.reshape(bh, sq_pad, head_dim)
    k = k.reshape(bh, sk_pad, head_dim)
    v = v.reshape(bh, sk_pad, head_dim)
    # (bh, 1, S) so the block's trailing dims are lane-aligned for Mosaic.
    q_seg = jnp.repeat(q_segment_ids, heads, axis=0)[:, None, :]
    kv_seg = jnp.repeat(kv_segment_ids, heads, axis=0)[:, None, :]

    grid = (bh, sq_pad // block_q, sk_pad // block_kv)
    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        sm_scale=sm_scale,
        block_q=block_q,
        block_kv=block_kv,
        kv_len=sk,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, head_dim), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, block_kv), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, head_dim), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, head_dim), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, q_seg, kv_seg)
    return out.reshape(batch, heads, sq_pad, head_dim)[:, :, :sq]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def _flash_attention_core(q, k, v, q_seg, kv_seg, causal, sm_scale, block_q, block_kv):
    return _flash_forward(q, k, v, q_seg, kv_seg, causal, sm_scale, block_q, block_kv)


def _flash_fwd(q, k, v, q_seg, kv_seg, causal, sm_scale, block_q, block_kv):
    out = _flash_forward(q, k, v, q_seg, kv_seg, causal, sm_scale, block_q, block_kv)
    return out, (q, k, v, q_seg, kv_seg)


def _flash_bwd(causal, sm_scale, block_q, block_kv, residuals, g):
    # Recompute backward through the XLA reference — correct and fusion-friendly;
    # a dedicated Pallas backward kernel is a later optimization.
    q, k, v, q_seg, kv_seg = residuals
    def f(q, k, v):
        return mha_reference(
            q, k, v, causal=causal, segment_ids=q_seg, kv_segment_ids=kv_seg,
            sm_scale=sm_scale,
        )
    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash_attention_core.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    sm_scale: float | None = None,
    block_q: int = 512,
    block_kv: int = 512,
) -> jax.Array:
    """Flash attention. Pallas kernel on TPU, XLA reference elsewhere.

    q: (B, H, Sq, D); k/v: (B, H, Sk, D); segment_ids: (B, Sq) int32 (queries)
    and optionally (B, Sk) for keys — attention only flows within equal
    segments. ``causal`` composes with segments.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        return mha_reference(
            q, k, v, causal=causal, segment_ids=segment_ids,
            kv_segment_ids=kv_segment_ids, sm_scale=sm_scale,
        )
    batch, _, sq, _ = q.shape
    sk = k.shape[-2]
    q_seg = (
        segment_ids
        if segment_ids is not None
        else jnp.zeros((batch, sq), dtype=jnp.int32)
    )
    kv_seg = (
        kv_segment_ids
        if kv_segment_ids is not None
        else (q_seg if segment_ids is not None and sq == sk
              else jnp.zeros((batch, sk), dtype=jnp.int32))
    )
    return _flash_attention_core(
        q, k, v, q_seg, kv_seg, causal, sm_scale, block_q, block_kv
    )


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    kv_mask: jax.Array,
    *,
    sm_scale: float | None = None,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
) -> jax.Array:
    """Single-position attention against a KV cache.

    q: (B, H, 1, D); caches: (B, H, T_max, D); kv_mask: (B, T_max) nonzero on
    valid cache slots (left padding stays masked for the whole decode). With
    ``k_scale``/``v_scale`` (B, H, T_max, 1) the caches are int8 and
    dequantize inside the contraction. A matvec per head — XLA handles this
    well; kept as a distinct op so a Pallas paged/decode kernel can slot in
    behind the same API.
    """
    head_dim = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(head_dim)
    k = k_cache if k_scale is None else k_cache.astype(q.dtype)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if k_scale is not None:
        logits = logits * k_scale[..., 0][:, :, None, :]
    mask = kv_mask[:, None, None, :] != 0
    logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    weights = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        weights = weights * v_scale[..., 0][:, :, None, :]
        v = v_cache.astype(q.dtype)
    else:
        v = v_cache
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)
