"""Llama-family decoder: RMSNorm + RoPE + SwiGLU, scanned blocks, KV cache.

TPU-native replacement for the reference's HF ``LlamaForCausalLM`` + CUDA
flash-attn monkey patches (`LLaVA/llava/model/language_model/llava_llama.py`,
`llava/train/llama_flash_attn_monkey_patch.py`). Design choices:

- blocks are stacked with ``nn.scan`` (params have a leading layer axis) for
  fast compilation and natural pipeline sharding;
- prefill runs the Pallas flash-attention kernel (causal + padding segments);
- decode is a fixed-shape single-position step against a static-capacity KV
  cache (left-padded prompts keep the write position batch-uniform);
- rotary embedding follows the HF half-rotation layout so converted
  checkpoints load without permutation.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.config import LlamaConfig
from mmor_tpu.ops.attention import (
    decode_attention,
    decode_attention_packed_stack,
    flash_attention,
    pack_kv_heads,
)
from mmor_tpu.ops.quantized_matmul import (
    int4_matmul_packed,
    int8_matmul_packed,
    pack_int8_rows,
    quantize_weights,
)

KVCache = dict[str, Any]


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-position symmetric int8 KV quantization over the head dim.

    x: (..., T, D) -> (packed int32 (..., D/4, T), scale (..., T) f32).
    Halves the KV cache's HBM footprint so larger decode batches fit, and the
    int32 packing (see ops/attention.pack_kv_heads) keeps decode streaming at
    the full DMA byte rate — a plain int8 cache reads at half rate and XLA
    materializes the ``astype`` dequant besides. Accuracy loss is negligible
    for 128-wide heads.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    # bf16 scales: 0.4% extra quantization error, half the scale-table HBM
    # (f32 scales were 2 x 0.8 GB at b24 — real batch-ceiling pressure)
    return pack_kv_heads(q), scale[..., 0].astype(jnp.bfloat16)


class QuantDense(nn.Module):
    """Dense with int8 weights packed 4-per-int32 + per-channel scales
    (``bits=8``), or int4 packed 8-per-int32 + per-(K-group, channel)
    scales (``bits=4``), served by the Pallas packed dequant-matmul
    kernels (weights rest packed in HBM so decode streams them at the full
    DMA byte rate — narrow int8 tensors cap at half, see
    ops/quantized_matmul.pack_int8_rows).
    Parameter tree: {w_p int32 (in/4 or in/8, out), scale ((out,) or
    (in/group, out))}; populate via ``quantize_llama_params`` — init
    values are placeholders."""

    features: int
    int8_mxu: bool = True
    bits: int = 8
    group: int = 1024

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = x.shape[-1]
        flat = x.reshape(-1, k)
        if self.bits == 4:
            w_p = self.param("w_p", nn.initializers.zeros,
                             (k // 8, self.features), jnp.int32)
            scale = self.param("scale", nn.initializers.ones,
                               (k // self.group, self.features), jnp.float32)
            out = int4_matmul_packed(flat, w_p, scale, group=self.group,
                                     int8_mxu=self.int8_mxu)
        else:
            w_p = self.param("w_p", nn.initializers.zeros,
                             (k // 4, self.features), jnp.int32)
            scale = self.param("scale", nn.initializers.ones,
                               (self.features,), jnp.float32)
            out = int8_matmul_packed(flat, w_p, scale,
                                     int8_mxu=self.int8_mxu)
        return out.reshape(*x.shape[:-1], self.features)


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + self.eps)
        return (normed * scale.astype(jnp.float32)).astype(self.dtype)


def apply_rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """HF-convention rotary embedding. x: (B, H, T, Dh); positions: (B, T)."""
    head_dim = x.shape[-1]
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions.astype(jnp.float32)[:, :, None] * inv_freq[None, None, :]
    cos = jnp.concatenate([jnp.cos(angles)] * 2, axis=-1)[:, None]  # (B,1,T,Dh)
    sin = jnp.concatenate([jnp.sin(angles)] * 2, axis=-1)[:, None]
    rotated = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(x.dtype)


class LlamaBlock(nn.Module):
    """One decoder block inside the layer scan.

    ``carry = (x, caches, layer_idx)``: ``caches is None`` selects prefill
    (flash attention over the full sequence, per-layer KV emitted as scan
    outputs); otherwise a single-position decode step against the FULL cache
    stacks carried through the scan — updates are in-place
    dynamic_update_slices on the carry and the attention kernel reads its
    layer via scalar-prefetch index maps, so no per-layer cache slices or
    scan xs/ys cache buffers ever materialize (those OOM'd the b24 step
    program). The mode check is python-level, so one scanned module serves
    both modes with one parameter tree."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, carry, positions, segment_ids, kv_mask, write_pos):
        x, caches, layer_idx = carry
        cfg = self.cfg
        # prefill passes segment_ids; decode never does. Prefill may ALSO
        # carry preallocated full-capacity cache stacks (kv_quant serving
        # path) — each layer writes its slice in place, so neither the bf16
        # KV stack nor a scan-ys mirror of the cache ever materializes
        # (the ys temp alone was 5.46 GB at b20).
        decode = segment_ids is None
        if cfg.weight_quant:
            dense = lambda feats, name: QuantDense(
                feats, int8_mxu=cfg.quant_int8_mxu, bits=cfg.weight_bits,
                group=cfg.weight_group, name=name)
        else:
            dense = lambda feats, name: nn.Dense(
                feats, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                name=name,
            )
        batch, seq, _ = x.shape
        h = RMSNorm(cfg.norm_eps, cfg.dtype, cfg.param_dtype, name="attn_norm")(x)
        q_width = cfg.n_heads * cfg.head_dim
        kv_width = cfg.n_kv_heads * cfg.head_dim
        ffn = cfg.ffn_dim + cfg.ffn_pad  # zero-padded channels, exact (config.py)
        if cfg.fused_qkv:
            # one weight stream instead of three — matvec decode is
            # bandwidth-bound, and fewer/larger reads pipeline better
            qkv = dense(q_width + 2 * kv_width, "qkv_proj")(h)
            S = cfg.tp_segments
            if S > 1:
                # segment-ordered layout [q_0 k_0 v_0 | q_1 k_1 v_1 | ...]:
                # a `model`-axis shard of the output dim lands on whole
                # segments, so each chip's slice is its own heads' q/k/v and
                # the reshape below stays shard-local under GSPMD.
                qw, kw = q_width // S, kv_width // S
                seg = qkv.reshape(batch, seq, S, qw + 2 * kw)
                q = seg[..., :qw].reshape(batch, seq, q_width)
                k = seg[..., qw : qw + kw].reshape(batch, seq, kv_width)
                v = seg[..., qw + kw :].reshape(batch, seq, kv_width)
            else:
                q = qkv[..., :q_width]
                k = qkv[..., q_width : q_width + kv_width]
                v = qkv[..., q_width + kv_width :]
        else:
            q = dense(q_width, "q_proj")(h)
            k = dense(kv_width, "k_proj")(h)
            v = dense(kv_width, "v_proj")(h)
        q = q.reshape(batch, seq, cfg.n_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(batch, seq, cfg.n_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(batch, seq, cfg.n_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        q = apply_rope(q, positions, cfg.rope_theta)
        k = apply_rope(k, positions, cfg.rope_theta)

        if cfg.n_kv_heads != cfg.n_heads:
            reps = cfg.n_heads // cfg.n_kv_heads
            k = jnp.repeat(k, reps, axis=1)
            v = jnp.repeat(v, reps, axis=1)

        per_layer_out = None
        if not decode:
            attn = flash_attention(q, k, v, causal=True, segment_ids=segment_ids)
            if caches is not None:
                # serving path: write this layer's quantized+packed KV into
                # the preallocated capacity stacks carried through the scan
                k_stack, ks_stack, v_stack, vs_stack = caches
                if cfg.mega_decode and cfg.kv_bits == 4:
                    # int4 mega cache: T-halved nibble layouts span the
                    # full capacity, so quantize+pack against it directly
                    # (int-domain pad; masked positions are never read)
                    from mmor_tpu.ops.mega_decode import (quantize_k_int4,
                                                          quantize_v_int4)

                    t_cap = k_stack.shape[-1] * 2
                    k_q, k_s = quantize_k_int4(k, t_cap)
                    v_q, v_s = quantize_v_int4(v, t_cap)
                elif cfg.mega_decode:
                    # megakernel cache: V is T-packed ((T/4, Dh) words) so
                    # decode's weighted sum is a native (1,T)x(T,Dh) matvec
                    from mmor_tpu.ops.mega_decode import quantize_kv_tmajor

                    k_q, k_s = quantize_kv(k)
                    v_q, v_s = quantize_kv_tmajor(v)
                else:
                    k_q, k_s = quantize_kv(k)
                    v_q, v_s = quantize_kv(v)
                at = lambda c, u: jax.lax.dynamic_update_slice(
                    c, u[None], (layer_idx, 0, 0, 0, 0))
                if cfg.mega_decode:
                    # mega cache scales live (L, H, B, T) so the decode
                    # kernel's scale blocks are (1, 1, 8, T)-legal
                    at_s = lambda c, u: jax.lax.dynamic_update_slice(
                        c, u.transpose(1, 0, 2)[None].astype(c.dtype),
                        (layer_idx, 0, 0, 0))
                else:
                    at_s = lambda c, u: jax.lax.dynamic_update_slice(
                        c, u[None].astype(c.dtype), (layer_idx, 0, 0, 0))
                caches = (at(k_stack, k_q), at_s(ks_stack, k_s),
                          at(v_stack, v_q), at_s(vs_stack, v_s))
            elif cfg.kv_quant:
                # No capacity stacks (plain scoring forward, or model.init's
                # shape trace): emit int8-format per-layer stacks. int4-mega
                # SERVING always lands in the capacity branch above (both
                # make_prefill's donated buffers and the in-program
                # prefill_pad_to fallback allocate int4-shaped stacks);
                # build_cache rejects this int8-format output for int4-mega
                # rather than mis-building a cache from it.
                k_q, k_s = quantize_kv(k)
                if cfg.mega_decode:
                    from mmor_tpu.ops.mega_decode import quantize_kv_tmajor

                    v_q, v_s = quantize_kv_tmajor(v)
                else:
                    v_q, v_s = quantize_kv(v)
                per_layer_out = (k_q, k_s, v_q, v_s)
            else:
                per_layer_out = (k, v)
        elif cfg.kv_quant:
            # stacks: (L, B, H, D/4, T) int32 caches + (L, B, H, T) scales
            assert not cfg.mega_decode, (
                "mega_decode serves decode through ops/mega_decode."
                "make_mega_decode_step, not the scanned block")
            k_stack, ks_stack, v_stack, vs_stack = caches
            k_q, k_s = quantize_kv(k)  # (B, H, D/4, 1), (B, H, 1)
            v_q, v_s = quantize_kv(v)
            at = lambda c, u: jax.lax.dynamic_update_slice(
                c, u[None], (layer_idx, 0, 0, 0, write_pos))
            at_s = lambda c, u: jax.lax.dynamic_update_slice(
                c, u[None], (layer_idx, 0, 0, write_pos))
            k_stack, ks_stack = at(k_stack, k_q), at_s(ks_stack, k_s)
            v_stack, vs_stack = at(v_stack, v_q), at_s(vs_stack, v_s)
            attn = decode_attention_packed_stack(
                q, k_stack, v_stack, ks_stack, vs_stack, kv_mask, layer_idx
            )
            caches = (k_stack, ks_stack, v_stack, vs_stack)
        else:
            k_stack, v_stack = caches  # (L, B, H, T, Dh)
            k_stack = jax.lax.dynamic_update_slice(
                k_stack, k[None], (layer_idx, 0, 0, write_pos, 0))
            v_stack = jax.lax.dynamic_update_slice(
                v_stack, v[None], (layer_idx, 0, 0, write_pos, 0))
            take = lambda s: jax.lax.dynamic_index_in_dim(s, layer_idx,
                                                          keepdims=False)
            attn = decode_attention(q, take(k_stack), take(v_stack), kv_mask)
            caches = (k_stack, v_stack)

        attn = attn.transpose(0, 2, 1, 3).reshape(batch, seq, cfg.n_heads * cfg.head_dim)
        x = x + dense(cfg.dim, "o_proj")(attn)

        h = RMSNorm(cfg.norm_eps, cfg.dtype, cfg.param_dtype, name="mlp_norm")(x)
        if cfg.fused_qkv:
            gate_up = dense(2 * ffn, "gate_up_proj")(h)
            S = cfg.tp_segments
            if S > 1:
                fw = ffn // S
                seg = gate_up.reshape(batch, seq, S, 2 * fw)
                gate = seg[..., :fw].reshape(batch, seq, ffn)
                up = seg[..., fw:].reshape(batch, seq, ffn)
            else:
                gate, up = gate_up[..., :ffn], gate_up[..., ffn:]
        else:
            gate = dense(ffn, "gate_proj")(h)
            up = dense(ffn, "up_proj")(h)
        x = x + dense(cfg.dim, "down_proj")(nn.silu(gate) * up)
        return (x, caches, layer_idx + 1), per_layer_out


class LlamaModel(nn.Module):
    """Decoder-only LM. Two modes share one parameter tree:

    - prefill (``cache=None``): full-sequence causal attention; returns
      ``(logits, (k, v))`` with per-layer keys/values stacked on a leading
      layer axis, ready for ``build_cache``;
    - decode (``cache`` given): single position; returns updated cache.
    """

    cfg: LlamaConfig

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(
            cfg.vocab_size, cfg.dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="embed_tokens",
        )
        block = nn.remat(LlamaBlock) if cfg.remat else LlamaBlock
        # carry = (x, caches, layer_idx); all other args broadcast. Prefill
        # emits per-layer KV as stacked scan outputs; decode threads the full
        # cache stacks through the carry (in-place updates, no xs/ys buffers).
        self.blocks = nn.scan(
            block,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,) * 4,
            out_axes=0,
            length=cfg.n_layers,
        )(cfg, name="blocks")
        self.final_norm = RMSNorm(cfg.norm_eps, cfg.dtype, cfg.param_dtype, name="final_norm")
        if cfg.weight_quant:
            self.lm_head = QuantDense(cfg.vocab_size,
                                      int8_mxu=cfg.quant_int8_mxu,
                                      name="lm_head")
        else:
            self.lm_head = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=cfg.dtype,
                param_dtype=cfg.param_dtype, name="lm_head",
            )

    def embed_tokens(self, input_ids: jax.Array) -> jax.Array:
        return self.embed(input_ids)

    def __call__(
        self,
        *,
        input_ids: jax.Array | None = None,
        input_embeds: jax.Array | None = None,
        attention_mask: jax.Array,
        positions: jax.Array | None = None,
        cache: KVCache | None = None,
        last_logit_only: bool = False,
        prefill_pad_to: int | None = None,
        prefill_cache_buffers=None,
    ):
        cfg = self.cfg
        if input_embeds is None:
            input_embeds = self.embed_tokens(input_ids)
        x = input_embeds.astype(cfg.dtype)
        batch, seq, _ = x.shape
        decode = cache is not None

        if positions is None:
            # left-pad aware positions: first real token gets position 0
            positions = jnp.maximum(jnp.cumsum(attention_mask, axis=-1) - 1, 0)

        idx0 = jnp.asarray(0, jnp.int32)
        if not decode:
            segment_ids = attention_mask.astype(jnp.int32)
            init_caches = prefill_cache_buffers
            if (init_caches is None and cfg.kv_quant
                    and prefill_pad_to is not None):
                # capacity stacks allocated in-program (works, but the final
                # carry cannot alias the program output — a cache-sized HLO
                # temp appears; pass DONATED prefill_cache_buffers from the
                # engine to avoid it, see make_prefill)
                d4 = cfg.head_dim // 4
                if cfg.mega_decode and cfg.kv_bits == 4:
                    # T-halved nibble layouts, mirrors mm2sg.alloc_cache_buffers
                    shape = (cfg.n_layers, batch, cfg.n_heads, d4,
                             prefill_pad_to // 2)
                    vshape = (cfg.n_layers, batch, cfg.n_heads,
                              prefill_pad_to // 8, cfg.head_dim)
                else:
                    shape = (cfg.n_layers, batch, cfg.n_heads, d4,
                             prefill_pad_to)
                    vshape = ((cfg.n_layers, batch, cfg.n_heads,
                               prefill_pad_to // 4, cfg.head_dim)
                              if cfg.mega_decode else shape)
                sshape = ((cfg.n_layers, cfg.n_heads, batch, prefill_pad_to)
                          if cfg.mega_decode
                          else (cfg.n_layers, batch, cfg.n_heads,
                                prefill_pad_to))
                init_caches = (
                    jnp.zeros(shape, jnp.int32), jnp.ones(sshape, jnp.bfloat16),
                    jnp.zeros(vshape, jnp.int32), jnp.ones(sshape, jnp.bfloat16),
                )
            (x, filled, _), stacked_kv = self.blocks(
                (x, init_caches, idx0), positions, segment_ids, None, None)
            new_cache = filled if filled is not None else stacked_kv
        else:
            # mark the current slot valid before attention so the new token
            # attends to itself
            kv_mask = jax.lax.dynamic_update_slice(
                cache["kv_mask"],
                jnp.ones((batch, seq), dtype=cache["kv_mask"].dtype),
                (0, cache["write_pos"]),
            )
            if cfg.kv_quant:
                cache_kv = (cache["k"], cache["k_s"], cache["v"], cache["v_s"])
            else:
                cache_kv = (cache["k"], cache["v"])
            (x, new_kv, _), _ = self.blocks(
                (x, cache_kv, idx0),
                positions,
                None,
                kv_mask,
                cache["write_pos"],
            )
            new_cache = dict(
                kv_mask=kv_mask,
                write_pos=cache["write_pos"] + seq,
                tok_pos=cache["tok_pos"] + seq,
            )
            if cfg.kv_quant:
                new_cache.update(k=new_kv[0], k_s=new_kv[1],
                                 v=new_kv[2], v_s=new_kv[3])
            else:
                new_cache.update(k=new_kv[0], v=new_kv[1])

        if last_logit_only:
            x = x[:, -1:]
        x = self.final_norm(x)
        logits = self.lm_head(x)
        return logits.astype(jnp.float32), new_cache


def build_cache(
    cfg: LlamaConfig,
    prefill_kv: tuple[jax.Array, jax.Array],
    attention_mask: jax.Array,
    max_len: int,
) -> KVCache:
    """Assemble a static-capacity KV cache from prefill keys/values.

    ``attention_mask`` is the (left-padded) prompt mask; padded key slots stay
    masked out for the whole decode. With ``cfg.kv_quant``, ``prefill_kv`` is
    the packed 4-tuple the prefill scan emits (int8-in-int32 caches +
    per-position scales, half the HBM footprint). When the prefill ran with
    ``prefill_pad_to=max_len`` the stacks are already at capacity and no
    copy happens here (padding the full stacks holds old+new buffers at once
    — ~8 GB transient at b18, the serving-path OOM).
    """
    seq = attention_mask.shape[1]
    cur = prefill_kv[0].shape[-1] if cfg.kv_quant else prefill_kv[0].shape[3]
    if cfg.kv_quant and cfg.mega_decode and cfg.kv_bits == 4:
        # int4 K stacks are T-HALVED (dh/4, T/2) words and always arrive at
        # capacity (the prefill packs against it) -> pad must resolve to 0
        if (prefill_kv[0].shape[-1] * 2 != max_len
                or prefill_kv[2].shape[3] * 8 != max_len):
            raise ValueError(
                "int4 mega caches pack against the full capacity during "
                "prefill — run with prefill_pad_to=max_len (generate_stepwise "
                "/ make_prefill do this); got non-capacity stacks "
                f"{prefill_kv[0].shape} for max_len={max_len}")
        cur *= 2
    pad = max_len - cur
    kv_mask = jnp.pad(attention_mask.astype(jnp.int32),
                      ((0, 0), (0, max_len - seq)))
    cache = dict(
        kv_mask=kv_mask,
        write_pos=jnp.array(seq, dtype=jnp.int32),
        tok_pos=jnp.sum(attention_mask, axis=-1).astype(jnp.int32),
    )
    if cfg.kv_quant:
        # packed caches (L, B, H, D/4, T) int32 + (L, B, H, T) scales;
        # T is the last axis in both, so padding to capacity is a tail pad.
        # mega_decode stores V T-packed: (L, B, H, T/4, Dh) — pad axis 3.
        k_q, k_s, v_q, v_s = prefill_kv
        if cfg.mega_decode and pad:
            # per-layer scan outputs are (L, B, H, T); mega wants (L, H, B, T)
            # (capacity buffers arrive at pad == 0 and are already head-major
            # — the prefill wrote them transposed)
            k_s = k_s.transpose(0, 2, 1, 3)
            v_s = v_s.transpose(0, 2, 1, 3)
        if pad:
            pad_last = ((0, 0),) * 4 + ((0, pad),)
            pad_s = ((0, 0),) * 3 + ((0, pad),)
            k_q, k_s = jnp.pad(k_q, pad_last), jnp.pad(k_s, pad_s)
            if cfg.mega_decode:
                assert pad % 4 == 0
                v_q = jnp.pad(v_q, ((0, 0),) * 3 + ((0, pad // 4), (0, 0)))
            else:
                v_q = jnp.pad(v_q, pad_last)
            v_s = jnp.pad(v_s, pad_s)
        cache.update(k=k_q, k_s=k_s, v=v_q, v_s=v_s)
    else:
        k, v = prefill_kv  # (L, B, H, T, Dh)
        if pad:
            pad_t = ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))
            k, v = jnp.pad(k, pad_t), jnp.pad(v, pad_t)
        cache.update(k=k, v=v)
    return cache


def greedy_decode(
    model: LlamaModel,
    params,
    prompt_logits: jax.Array,
    cache: KVCache,
    max_new_tokens: int,
    *,
    eos_token_id: int,
    embed_fn=None,
) -> jax.Array:
    """Greedy autoregressive decode with a jit-friendly ``lax.while_loop``.

    ``prompt_logits`` is the prefill output (B, T, V); decoding starts from its
    last position. Returns (B, max_new_tokens) token ids, padded with EOS after
    the stop token. ``embed_fn(ids)`` defaults to the model's token embedding.
    """
    batch = prompt_logits.shape[0]
    first = jnp.argmax(prompt_logits[:, -1, :], axis=-1).astype(jnp.int32)

    if embed_fn is None:
        embed_fn = lambda ids: model.apply(
            params, ids, method=LlamaModel.embed_tokens
        )

    def step_fn(carry):
        i, tokens, cache, done = carry
        cur = tokens[:, i]
        embeds = embed_fn(cur[:, None])
        positions = cache["tok_pos"][:, None]
        logits, cache = model.apply(
            params,
            input_embeds=embeds,
            attention_mask=jnp.ones((batch, 1), jnp.int32),
            positions=positions,
            cache=cache,
        )
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        done = done | (cur == eos_token_id)
        nxt = jnp.where(done, eos_token_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))
        return i + 1, tokens, cache, done

    def cond_fn(carry):
        i, _tokens, _cache, done = carry
        return (i < max_new_tokens - 1) & ~jnp.all(done)

    tokens = jnp.full((batch, max_new_tokens), eos_token_id, dtype=jnp.int32)
    tokens = tokens.at[:, 0].set(first)
    done = jnp.zeros((batch,), dtype=bool)
    _, tokens, _, _ = jax.lax.while_loop(
        cond_fn, step_fn, (jnp.array(0, jnp.int32), tokens, cache, done)
    )
    return tokens


def make_decode_step(model: LlamaModel, *, donate: bool = True):
    """Jitted single-token decode step with the KV cache DONATED.

    The axon AOT compile does not alias the decode while_loop's cache carry
    (CLAUDE.md round-1 analysis: the cache is double-counted in program
    memory AND copied every iteration — measured ~65 ms/token at b14, ~4
    full-cache copies of traffic). Donating the cache argument across
    host-driven step calls makes the update genuinely in-place. Dispatch is
    async, so a python token loop pipelines without per-token host syncs.

    Returns step(params, cache, tok (B,1) int32) -> (nxt (B,) int32, cache).
    """

    def step(params, cache, tok):
        embeds = model.apply(params, tok, method=LlamaModel.embed_tokens)
        logits, cache = model.apply(
            params,
            input_embeds=embeds,
            attention_mask=jnp.ones(tok.shape, jnp.int32),
            positions=cache["tok_pos"][:, None],
            cache=cache,
        )
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return nxt, cache

    return jax.jit(step, donate_argnums=(1,) if donate else ())


def greedy_decode_hostloop(
    model: LlamaModel,
    params,
    prompt_logits: jax.Array,
    cache: KVCache,
    max_new_tokens: int,
    *,
    eos_token_id: int,
    step_fn=None,
) -> jax.Array:
    """Greedy decode as a host-driven loop over donated-cache steps.

    Semantics match ``greedy_decode`` (EOS padding applied post-hoc) minus
    early-exit — every sequence runs the full budget, as the serving bench
    does anyway. Returns ((B, max_new_tokens) int32 on host, final cache —
    whose packed stacks can be recycled as the next generation's donated
    prefill buffers).
    """
    batch = prompt_logits.shape[0]
    if step_fn is None:
        step_fn = make_decode_step(model)
    tok = jnp.argmax(prompt_logits[:, -1, :], axis=-1).astype(jnp.int32)
    toks = [tok]
    for i in range(max_new_tokens - 1):
        tok, cache = step_fn(params, cache, tok[:, None])
        toks.append(tok)
        # periodic host sync: stop once every sequence hit EOS (serving
        # outputs are usually far shorter than the budget); the sync also
        # bounds the async in-flight queue
        if eos_token_id >= 0 and (i + 1) % 64 == 0:
            if bool(np.all(np.asarray(tok) == eos_token_id)):
                break
    out = np.asarray(jnp.stack(toks, axis=1))
    if out.shape[1] < max_new_tokens:  # early stop: pad with EOS
        out = np.pad(out, ((0, 0), (0, max_new_tokens - out.shape[1])),
                     constant_values=eos_token_id)
    # post-hoc EOS padding (greedy_decode's in-loop `done` semantics)
    for b in range(batch):
        hits = np.nonzero(out[b] == eos_token_id)[0]
        if hits.size:
            out[b, hits[0]:] = eos_token_id
    return jnp.asarray(out), cache


def _segment_concat(kernels: list[jax.Array], segments: int) -> jax.Array:
    """Concatenate (L, D, N_i) kernels along the output dim in
    ``segments`` interleaved groups: [a_0 b_0 c_0 | a_1 b_1 c_1 | ...].
    With segments=1 this is a plain concat."""
    if segments == 1:
        return jnp.concatenate(kernels, axis=-1)
    parts = []
    for s in range(segments):
        for kern in kernels:
            n = kern.shape[-1]
            assert n % segments == 0, (n, segments)
            c = n // segments
            parts.append(kern[..., s * c : (s + 1) * c])
    return jnp.concatenate(parts, axis=-1)


def fuse_llama_params(params: dict, tp_segments: int = 1) -> dict:
    """Fuse q/k/v -> qkv_proj and gate/up -> gate_up_proj kernels (for
    ``fused_qkv=True``). With ``tp_segments`` > 1, output columns are laid
    out in segment groups (see ``LlamaConfig.tp_segments``) so a `model`-axis
    shard of the fused dim holds whole per-shard q|k|v / gate|up slices."""
    tree = jax.tree.map(lambda x: x, params)
    inner = tree["params"] if "params" in tree else tree
    blocks = inner["blocks"]
    qkv = _segment_concat(
        [blocks.pop(n)["kernel"] for n in ("q_proj", "k_proj", "v_proj")],
        tp_segments,
    )
    blocks["qkv_proj"] = {"kernel": qkv}
    gate_up = _segment_concat(
        [blocks.pop(n)["kernel"] for n in ("gate_proj", "up_proj")],
        tp_segments,
    )
    blocks["gate_up_proj"] = {"kernel": gate_up}
    return tree


def quantize_llama_params(params: dict, ffn_pad: int = 0,
                          tp_segments: int = 1, bits: int = 8,
                          group: int = 1024) -> dict:
    """bf16/f32 LlamaModel params -> packed-int8/int4 tree for
    weight_quant=True.

    Blocks' stacked (L, in, out) kernels quantize per layer and pack
    4 int8 rows per int32 (full-rate HBM streaming, see
    ops/quantized_matmul.pack_int8_rows) — or, with ``bits=4``, 8 biased
    nibbles per int32 with per-(K-``group``, channel) scales
    (pack_int4_rows). lm_head quantizes to int8 either way (quality-
    critical, and a minority of decode bytes); embeddings and norms stay
    as-is. Handles both the split and the fused (qkv_proj / gate_up_proj)
    projection layouts; ``tp_segments`` must match the value the fused
    kernels were built with (``fuse_llama_params``) so the ffn
    zero-padding lands inside each segment's gate/up chunk.
    """
    from mmor_tpu.ops.quantized_matmul import (pack_int4_rows,
                                               quantize_weights_int4)

    tree = jax.tree.map(lambda x: x, params)  # shallow copy
    inner = tree["params"] if "params" in tree else tree
    blocks = inner["blocks"]
    proj_names = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                  "up_proj", "down_proj", "qkv_proj", "gate_up_proj")
    for name in proj_names:
        if name not in blocks:
            continue
        kernel = blocks[name].pop("kernel")
        if ffn_pad:
            # zero-pad ffn channels for clean tiling (LlamaConfig.ffn_pad)
            if name in ("gate_proj", "up_proj"):
                kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, ffn_pad)))
            elif name == "gate_up_proj":
                l, d, f2 = kernel.shape
                S = tp_segments
                assert f2 % (2 * S) == 0 and ffn_pad % S == 0
                kernel = jnp.pad(
                    kernel.reshape(l, d, 2 * S, f2 // (2 * S)),
                    ((0, 0), (0, 0), (0, 0), (0, ffn_pad // S)),
                ).reshape(l, d, f2 + 2 * ffn_pad)
            elif name == "down_proj":
                kernel = jnp.pad(kernel, ((0, 0), (0, ffn_pad), (0, 0)))
        if bits == 4:
            w_q, scale = jax.vmap(
                functools.partial(quantize_weights_int4, group=group))(kernel)
            blocks[name] = {
                "w_p": jax.vmap(
                    functools.partial(pack_int4_rows, block=group))(w_q),
                "scale": scale,
            }
        else:
            w_q, scale = jax.vmap(quantize_weights)(kernel)
            blocks[name] = {"w_p": jax.vmap(pack_int8_rows)(w_q),
                            "scale": scale}
    head = inner["lm_head"].pop("kernel")
    w_q, scale = quantize_weights(head)
    inner["lm_head"] = {"w_p": pack_int8_rows(w_q), "scale": scale}
    return tree
