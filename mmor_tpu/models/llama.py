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

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmor_tpu.config import LlamaConfig
from mmor_tpu.ops.attention import decode_attention, flash_attention
from mmor_tpu.ops.quantized_matmul import int8_matmul, quantize_weights

KVCache = dict[str, Any]


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-position symmetric int8 KV quantization over the head dim.

    x: (..., D) -> (int8 (..., D), scale (..., 1) f32). Halves the KV cache's
    HBM footprint so larger decode batches fit (the throughput lever on
    weight-streaming-bound chips); accuracy loss is negligible for 128-wide
    heads.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


class QuantDense(nn.Module):
    """Dense with int8 weights + per-channel scales, served by the Pallas
    dequant-matmul kernel. Parameter tree: {w_q int8 (in, out), scale (out,)};
    populate via ``quantize_llama_params`` — init values are placeholders."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = x.shape[-1]
        w_q = self.param("w_q", nn.initializers.zeros, (k, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        flat = x.reshape(-1, k)
        out = int8_matmul(flat, w_q, scale)
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
    """One decoder block. ``cache_kv is None`` selects prefill (flash attention
    over the full sequence); otherwise a single-position KV-cache decode step.
    The mode check is python-level, so one scanned module serves both modes
    with one parameter tree."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, cache_kv, positions, segment_ids, kv_mask, write_pos):
        cfg = self.cfg
        decode = cache_kv is not None
        if cfg.weight_quant:
            dense = lambda feats, name: QuantDense(feats, name=name)
        else:
            dense = lambda feats, name: nn.Dense(
                feats, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                name=name,
            )
        batch, seq, _ = x.shape
        h = RMSNorm(cfg.norm_eps, cfg.dtype, cfg.param_dtype, name="attn_norm")(x)
        q_width = cfg.n_heads * cfg.head_dim
        kv_width = cfg.n_kv_heads * cfg.head_dim
        if cfg.fused_qkv:
            # one weight stream instead of three — matvec decode is
            # bandwidth-bound, and fewer/larger reads pipeline better
            qkv = dense(q_width + 2 * kv_width, "qkv_proj")(h)
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

        if not decode:
            attn = flash_attention(q, k, v, causal=True, segment_ids=segment_ids)
            new_cache = (k, v)
        elif cfg.kv_quant:
            k_cache, k_scale, v_cache, v_scale = cache_kv
            k_q, k_s = quantize_kv(k)
            v_q, v_s = quantize_kv(v)
            at = lambda c, x: jax.lax.dynamic_update_slice(c, x, (0, 0, write_pos, 0))
            k_cache, k_scale = at(k_cache, k_q), at(k_scale, k_s)
            v_cache, v_scale = at(v_cache, v_q), at(v_scale, v_s)
            attn = decode_attention(
                q, k_cache, v_cache, kv_mask, k_scale=k_scale, v_scale=v_scale
            )
            new_cache = (k_cache, k_scale, v_cache, v_scale)
        else:
            k_cache, v_cache = cache_kv
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k, (0, 0, write_pos, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v, (0, 0, write_pos, 0)
            )
            attn = decode_attention(q, k_cache, v_cache, kv_mask)
            new_cache = (k_cache, v_cache)

        attn = attn.transpose(0, 2, 1, 3).reshape(batch, seq, cfg.n_heads * cfg.head_dim)
        x = x + dense(cfg.dim, "o_proj")(attn)

        h = RMSNorm(cfg.norm_eps, cfg.dtype, cfg.param_dtype, name="mlp_norm")(x)
        if cfg.fused_qkv:
            gate_up = dense(2 * cfg.ffn_dim, "gate_up_proj")(h)
            gate, up = gate_up[..., : cfg.ffn_dim], gate_up[..., cfg.ffn_dim :]
        else:
            gate = dense(cfg.ffn_dim, "gate_proj")(h)
            up = dense(cfg.ffn_dim, "up_proj")(h)
        x = x + dense(cfg.dim, "down_proj")(nn.silu(gate) * up)
        return x, new_cache


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
        self.blocks = nn.scan(
            block,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=cfg.n_layers,
        )(cfg, name="blocks")
        self.final_norm = RMSNorm(cfg.norm_eps, cfg.dtype, cfg.param_dtype, name="final_norm")
        if cfg.weight_quant:
            self.lm_head = QuantDense(cfg.vocab_size, name="lm_head")
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

        if not decode:
            segment_ids = attention_mask.astype(jnp.int32)
            x, stacked_kv = self.blocks(x, None, positions, segment_ids, None, None)
            new_cache = stacked_kv  # (k, v) each (L, B, H, T, Dh)
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
            x, new_kv = self.blocks(
                x,
                cache_kv,
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
    masked out for the whole decode. With ``cfg.kv_quant`` the cache stores
    int8 values + per-position scales (half the HBM footprint).
    """
    k, v = prefill_kv  # (L, B, H, T, Dh)
    n_layers, batch, heads, seq, head_dim = k.shape
    pad = max_len - seq
    pad_t = ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))
    kv_mask = jnp.pad(attention_mask.astype(jnp.int32), ((0, 0), (0, pad)))
    cache = dict(
        kv_mask=kv_mask,
        write_pos=jnp.array(seq, dtype=jnp.int32),
        tok_pos=jnp.sum(attention_mask, axis=-1).astype(jnp.int32),
    )
    if cfg.kv_quant:
        k_q, k_s = quantize_kv(k)
        v_q, v_s = quantize_kv(v)
        cache.update(
            k=jnp.pad(k_q, pad_t), k_s=jnp.pad(k_s, pad_t),
            v=jnp.pad(v_q, pad_t), v_s=jnp.pad(v_s, pad_t),
        )
    else:
        cache.update(k=jnp.pad(k, pad_t), v=jnp.pad(v, pad_t))
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


def fuse_llama_params(params: dict) -> dict:
    """Fuse q/k/v -> qkv_proj and gate/up -> gate_up_proj kernels (for
    ``fused_qkv=True``). Concatenation is along the output dim, matching the
    block's slicing order (q | k | v, gate | up)."""
    tree = jax.tree.map(lambda x: x, params)
    inner = tree["params"] if "params" in tree else tree
    blocks = inner["blocks"]
    qkv = jnp.concatenate(
        [blocks.pop(n)["kernel"] for n in ("q_proj", "k_proj", "v_proj")], axis=-1
    )
    blocks["qkv_proj"] = {"kernel": qkv}
    gate_up = jnp.concatenate(
        [blocks.pop(n)["kernel"] for n in ("gate_proj", "up_proj")], axis=-1
    )
    blocks["gate_up_proj"] = {"kernel": gate_up}
    return tree


def quantize_llama_params(params: dict) -> dict:
    """bf16/f32 LlamaModel params -> int8-quantized tree for weight_quant=True.

    Blocks' stacked (L, in, out) kernels quantize per layer; lm_head
    quantizes whole; embeddings and norms stay as-is. Handles both the split
    and the fused (qkv_proj / gate_up_proj) projection layouts.
    """
    tree = jax.tree.map(lambda x: x, params)  # shallow copy
    inner = tree["params"] if "params" in tree else tree
    blocks = inner["blocks"]
    proj_names = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                  "up_proj", "down_proj", "qkv_proj", "gate_up_proj")
    for name in proj_names:
        if name not in blocks:
            continue
        kernel = blocks[name].pop("kernel")
        w_q, scale = jax.vmap(quantize_weights)(kernel)
        blocks[name] = {"w_q": w_q, "scale": scale}
    head = inner["lm_head"].pop("kernel")
    w_q, scale = quantize_weights(head)
    inner["lm_head"] = {"w_q": w_q, "scale": scale}
    return tree
