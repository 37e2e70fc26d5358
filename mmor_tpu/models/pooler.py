"""Multi-view / multi-modal fusion pooler.

TPU-native equivalent of the reference ``ImageEmbeddingPooler``
(`LLaVA/llava/model/multimodal_projector/builder.py:61-194`): a 2-layer
BERT-style (post-LN) encoder with learned positions over the concatenation of
per-view CLIP patch tokens, truncated to the first ``out_tokens`` fused
tokens, then extra modality tokens are appended:

- 1 point-cloud token: PTv3 feature (512) -> ``project_pc`` linear (zeros
  through the projection when the sample has no cloud, builder.py:99-148);
- 1 audio token: CLAP embedding (512) -> linear (zeros projected when absent,
  builder.py:150-159);
- ``num_segmask_tokens`` segmask tokens (zeros when absent, builder.py:161-167).

Unlike the reference (whose output length varies with which modalities are
present), the fused layout here is static — absent modalities contribute
their zero-fallback tokens — so the whole model jits with fixed shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmor_tpu.config import PoolerConfig


class FlashMHA(nn.Module):
    """Self-attention with flax's MultiHeadDotProductAttention param layout
    (query/key/value/out DenseGeneral) but the Pallas flash kernel as the
    core — the materialized (B, H, S, S) logits of the flax module were a
    4.84 GB HLO temp at b20 over 7x576 view tokens."""

    cfg: PoolerConfig

    @nn.compact
    def __call__(self, x: jax.Array, segment_ids: jax.Array) -> jax.Array:
        from mmor_tpu.ops.attention import flash_attention

        cfg = self.cfg
        head_dim = cfg.hidden // cfg.n_heads
        dg = lambda name: nn.DenseGeneral(
            (cfg.n_heads, head_dim), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)
        tr = lambda t: t.transpose(0, 2, 1, 3)  # (B,S,H,hd) -> (B,H,S,hd)
        out = flash_attention(
            tr(dg("query")(x)), tr(dg("key")(x)), tr(dg("value")(x)),
            causal=False, segment_ids=segment_ids,
        ).transpose(0, 2, 1, 3)
        return nn.DenseGeneral(
            cfg.hidden, axis=(-2, -1), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="out")(out)


class BertLayer(nn.Module):
    """Post-LN transformer encoder layer (BERT convention)."""

    cfg: PoolerConfig

    @nn.compact
    def __call__(self, x: jax.Array, segment_ids: jax.Array) -> jax.Array:
        cfg = self.cfg
        attn = FlashMHA(cfg, name="attn")(x, segment_ids)
        x = nn.LayerNorm(
            epsilon=1e-12, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="ln1"
        )(x + attn)
        h = nn.Dense(cfg.mlp_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc2")(h)
        return nn.LayerNorm(
            epsilon=1e-12, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="ln2"
        )(x + h)


class ImagePooler(nn.Module):
    cfg: PoolerConfig

    @nn.compact
    def __call__(
        self,
        view_tokens: jax.Array,  # (B, V*tokens_per_view, hidden) concatenated views
        token_mask: jax.Array,  # (B, V*tokens_per_view) 1 on real view tokens
        pc_feature: jax.Array | None = None,  # (B, pc_feature_dim) pre-pooled PTv3 feature
        audio_embedding: jax.Array | None = None,  # (B, audio_dim) CLAP embedding
        segmask_features: jax.Array | None = None,  # (B, num_segmask_tokens, hidden)
    ) -> jax.Array:
        cfg = self.cfg
        batch, seq, _ = view_tokens.shape
        x = view_tokens.astype(cfg.dtype)

        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.max_positions, cfg.hidden),
            cfg.param_dtype,
        )
        token_type = self.param(
            "token_type_embed", nn.initializers.normal(0.02), (1, 1, cfg.hidden),
            cfg.param_dtype,
        )
        x = x + pos[:, :seq].astype(cfg.dtype) + token_type.astype(cfg.dtype)
        x = nn.LayerNorm(
            epsilon=1e-12, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="embed_ln"
        )(x)

        seg_ids = (token_mask != 0).astype(jnp.int32)  # (B, S)
        for i in range(cfg.n_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(x, seg_ids)

        fused = x[:, : cfg.out_tokens]  # truncate (builder.py:175)

        extras = []
        pc = (
            pc_feature
            if pc_feature is not None
            else jnp.zeros((batch, cfg.pc_feature_dim), cfg.dtype)
        )
        pc_tok = nn.Dense(
            cfg.hidden, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="project_pc"
        )(pc.astype(cfg.dtype))
        extras.append(pc_tok[:, None, :])

        audio = (
            audio_embedding
            if audio_embedding is not None
            else jnp.zeros((batch, cfg.audio_dim), cfg.dtype)
        )
        audio_tok = nn.Dense(
            cfg.hidden, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="project_audio"
        )(audio.astype(cfg.dtype))
        extras.append(audio_tok[:, None, :])

        seg = (
            segmask_features
            if segmask_features is not None
            else jnp.zeros((batch, cfg.num_segmask_tokens, cfg.hidden), cfg.dtype)
        )
        extras.append(seg.astype(cfg.dtype))

        return jnp.concatenate([fused, *extras], axis=1)


class MMProjector(nn.Module):
    """mlp2x_gelu multimodal projector (builder.py:40-58): hidden -> lm_dim."""

    lm_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.lm_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.lm_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(x)


class SegmaskEncoder(nn.Module):
    """32x32 label-map CNN (segmentation_map_feature_extractor.py:9-75):
    class-id embedding (30 -> 8) then five stride-2 3x3 convs 64/128/256/512/1024."""

    num_classes: int = 30
    embed_dim: int = 8
    out_dim: int = 1024
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, masks: jax.Array) -> jax.Array:
        """masks: (N, 32, 32) int class ids -> (N, out_dim)."""
        x = nn.Embed(
            self.num_classes, self.embed_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name="class_embed",
        )(masks.astype(jnp.int32))
        widths = [self.out_dim // 16, self.out_dim // 8, self.out_dim // 4,
                  self.out_dim // 2, self.out_dim]
        for i, w in enumerate(widths):
            x = nn.Conv(
                w, kernel_size=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (N, out_dim)
