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
    # clamp to the 128-padded seq (not raw seq): blocks stay lane/sublane
    # aligned and a 708-row q still runs as one 768-row block
    pad128 = lambda s: -(-s // 128) * 128
    block_q = min(block_q, pad128(sq))
    block_kv = min(block_kv, pad128(sk))
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
    block_q: int | None = None,
    block_kv: int | None = None,
) -> jax.Array:
    """Flash attention. Pallas kernel on TPU, XLA reference elsewhere.

    q: (B, H, Sq, D); k/v: (B, H, Sk, D); segment_ids: (B, Sq) int32 (queries)
    and optionally (B, Sk) for keys — attention only flows within equal
    segments. ``causal`` composes with segments.

    ``block_q``/``block_kv`` default to AUTO: short sequences (<= 1024) run
    as ONE 128-padded block per (batch, head) — the per-grid-step fixed cost
    dominates small blocks on this chip (CLIP's (280x16, 577) attention at
    block 128 was a 112k-step grid running at 4.8 TFLOP/s, ~77% of the
    tower; one 640-block per head is a 4.5k-step grid) — and longer ones
    tile at 512, which also minimizes tail padding vs. a fixed 512 when
    Sq % 512 is small (LLaMA b40 prefill: 708 pads to 768, not 1024).
    """
    sq, sk = q.shape[-2], k.shape[-2]
    pad128 = lambda s: -(-s // 128) * 128
    if block_q is None:
        block_q = pad128(sq) if sq <= 1024 else 512
    if block_kv is None:
        block_kv = pad128(sk) if sk <= 1024 else 512
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


# ---------------------------------------------------------------------------
# Packed-int8 KV cache decode attention (int32-packed, fused dequant)
# ---------------------------------------------------------------------------
#
# The tunnel chip's DMA streams narrow dtypes at the ELEMENT rate, so an int8
# KV cache reads at half the bf16 byte rate, and XLA materializes the
# ``astype`` dequant besides (CLAUDE.md measured dead ends). This layout
# fixes both:
#
# - caches live as (B, H, D/4, T) int32 — 4 int8 values packed per element
#   along the head dim, T in lanes. Streaming runs at the full byte rate and
#   ``pltpu.bitcast(int32 (D/4, t) -> int8)`` unpacks to (D, t) as a vreg
#   relayout (row 4r+b = byte b of packed row r), not per-element shifts;
# - writing decode position t touches one lane column -> a plain
#   dynamic_update_slice, no read-modify-write of packed words;
# - per-position scales are (B, H, T) and fold into the logits / weights.


def pack_kv_heads(x_q: jax.Array) -> jax.Array:
    """int8 (..., T, D) -> packed int32 (..., D/4, T).

    Word r packs head-dim indices {4r, 4r+1, 4r+2, 4r+3} (little-endian), so
    the in-kernel bitcast reproduces rows in natural D order.
    """
    *lead, t, d = x_q.shape
    x = jnp.swapaxes(x_q, -1, -2)  # (..., D, T)
    x = x.reshape(*lead, d // 4, 4, t).astype(jnp.int32) & 0xFF
    return (x[..., 0, :] | (x[..., 1, :] << 8)
            | (x[..., 2, :] << 16) | (x[..., 3, :] << 24))


def unpack_kv_heads(x_p: jax.Array) -> jax.Array:
    """Inverse of ``pack_kv_heads`` in plain XLA: (..., D/4, T) -> (..., T, D)."""
    *lead, d4, t = x_p.shape
    parts = [((x_p << (24 - 8 * b)) >> 24).astype(jnp.int8) for b in range(4)]
    stacked = jnp.stack(parts, axis=-2)  # (..., D/4, 4, T)
    return jnp.swapaxes(stacked.reshape(*lead, d4 * 4, t), -1, -2)


def _packed_decode_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, mask_ref,
                          o_ref, *, sm_scale: float):
    q = q_ref[0]  # (1, D) bf16
    k8 = pltpu.bitcast(k_ref[0], jnp.int8)  # (D, T)
    v8 = pltpu.bitcast(v_ref[0], jnp.int8)  # (D, T)
    k = k8.astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        q, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (1, T)
    s = s * sm_scale * ks_ref[0].astype(jnp.float32)  # per-position k scale
    s = jnp.where(mask_ref[0] != 0, s, DEFAULT_MASK_VALUE)
    w = jax.nn.softmax(s, axis=-1)  # (1, T) f32
    w = w * vs_ref[0].astype(jnp.float32)  # fold v scale into weights, f32
    v = v8.astype(jnp.float32)
    # weighted sum over T as mul + lane reduction ((1,T)-rhs dot_general trips
    # a Mosaic verifier bug)
    out = jnp.sum(v * w, axis=1, keepdims=True)  # (D, 1) f32
    o_ref[0] = out


def decode_attention_packed(
    q: jax.Array,  # (B, H, 1, D) bf16
    k_packed: jax.Array,  # (B, H, D/4, T) int32
    v_packed: jax.Array,  # (B, H, D/4, T) int32
    k_scale: jax.Array,  # (B, H, T) f32
    v_scale: jax.Array,  # (B, H, T) f32
    kv_mask: jax.Array,  # (B, T) nonzero on valid slots
    *,
    sm_scale: float | None = None,
) -> jax.Array:
    """Single-position attention against the packed int8 KV cache.

    One fused kernel: bitcast-unpack + dequant + masked softmax + weighted
    sum, streaming each cache element exactly once at the full DMA byte rate.
    Returns (B, H, 1, D) in q.dtype.
    """
    b, h, _, d = q.shape
    t = k_packed.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)

    if jax.devices()[0].platform not in ("tpu", "axon"):
        k8 = unpack_kv_heads(k_packed)  # (B, H, T, D)
        v8 = unpack_kv_heads(v_packed)
        return decode_attention(
            q, k8, v8, kv_mask,
            sm_scale=scale,
            k_scale=k_scale[..., None], v_scale=v_scale[..., None],
        )

    bh = b * h
    qf = q.reshape(bh, 1, d).astype(jnp.bfloat16)
    kf = k_packed.reshape(bh, d // 4, t)
    vf = v_packed.reshape(bh, d // 4, t)
    ksf = k_scale.reshape(bh, 1, t)
    vsf = v_scale.reshape(bh, 1, t)
    maskf = kv_mask.astype(jnp.int32).reshape(b, 1, t)

    out = pl.pallas_call(
        functools.partial(_packed_decode_kernel, sm_scale=scale),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d // 4, t), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d // 4, t), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i: (i // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, 1), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, d, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(qf, kf, vf, ksf, vsf, maskf)
    return out.reshape(b, h, d)[:, :, None, :].astype(q.dtype)


def _packed_decode_stack_kernel(idx_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                                mask_ref, o_ref, *, sm_scale: float,
                                heads: int):
    del idx_ref  # consumed by the index maps (scalar prefetch)
    k8 = pltpu.bitcast(k_ref[...], jnp.int8)  # (G, D, T)
    v8 = pltpu.bitcast(v_ref[...], jnp.int8)
    mask = mask_ref[0]  # (1, T)
    for g in range(heads):  # unrolled: per-head matvec over the shared tiles
        q = q_ref[g]  # (1, D)
        s = jax.lax.dot_general(
            q, k8[g].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, T)
        s = s * sm_scale * ks_ref[g].astype(jnp.float32)
        s = jnp.where(mask != 0, s, DEFAULT_MASK_VALUE)
        w = jax.nn.softmax(s, axis=-1) * vs_ref[g].astype(jnp.float32)
        o_ref[g] = jnp.sum(v8[g].astype(jnp.float32) * w, axis=1,
                           keepdims=True)  # (D, 1)


def decode_attention_packed_stack(
    q: jax.Array,  # (B, H, 1, D) bf16
    k_stack: jax.Array,  # (L, B, H, D/4, T) int32 — FULL layer stack
    v_stack: jax.Array,  # (L, B, H, D/4, T) int32
    ks_stack: jax.Array,  # (L, B, H, T) f32
    vs_stack: jax.Array,  # (L, B, H, T) f32
    kv_mask: jax.Array,  # (B, T)
    layer_idx: jax.Array,  # () int32
    *,
    sm_scale: float | None = None,
    head_group: int = 16,
) -> jax.Array:
    """Packed decode attention reading layer ``layer_idx`` straight out of
    the full cache stack via scalar-prefetch index maps.

    Keeping the stacks as a scan CARRY and slicing inside the kernel avoids
    both the per-layer dynamic-slice copy (2 x 82 MB/layer at b24) and the
    scan xs/ys cache buffers that OOM'd the step program (2.62 GB HLO temp).
    ``head_group`` heads share one grid program — each grid program costs
    ~5 us of DMA latency, so at B*H programs the launch latency dominated;
    grouped programs move ~4 MB each and are bandwidth-bound. 16 is the
    largest group fitting Mosaic's 16 MB scoped-vmem stack (2 x int32 cache
    blocks, double-buffered).
    """
    b, h, _, d = q.shape
    l = k_stack.shape[0]
    t = k_stack.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)

    if jax.devices()[0].platform not in ("tpu", "axon"):
        take = lambda s: jax.lax.dynamic_index_in_dim(s, layer_idx, keepdims=False)
        return decode_attention_packed(
            q, take(k_stack), take(v_stack), take(ks_stack), take(vs_stack),
            kv_mask, sm_scale=scale,
        )

    bh = b * h
    g = head_group
    while h % g:
        g //= 2  # fall back to a divisor of H
    n_grid = bh // g
    qf = q.reshape(bh, 1, d).astype(jnp.bfloat16)
    kf = k_stack.reshape(l * bh, d // 4, t)
    vf = v_stack.reshape(l * bh, d // 4, t)
    ksf = ks_stack.reshape(l * bh, 1, t)
    vsf = vs_stack.reshape(l * bh, 1, t)
    maskf = kv_mask.astype(jnp.int32).reshape(b, 1, t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_grid,),
        in_specs=[
            pl.BlockSpec((g, 1, d), lambda i, idx: (i, 0, 0)),
            pl.BlockSpec((g, d // 4, t), lambda i, idx: (idx[0] * n_grid + i, 0, 0)),
            pl.BlockSpec((g, d // 4, t), lambda i, idx: (idx[0] * n_grid + i, 0, 0)),
            pl.BlockSpec((g, 1, t), lambda i, idx: (idx[0] * n_grid + i, 0, 0)),
            pl.BlockSpec((g, 1, t), lambda i, idx: (idx[0] * n_grid + i, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda i, idx: (i * g // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, d, 1), lambda i, idx: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_packed_decode_stack_kernel, sm_scale=scale,
                          heads=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, d, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), qf, kf, vf, ksf, vsf, maskf)
    return out.reshape(b, h, d)[:, :, None, :].astype(q.dtype)
