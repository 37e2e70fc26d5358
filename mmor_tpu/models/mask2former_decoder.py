"""Masked-attention transformer decoder (Mask2Former / video / DVIS+ variant).

Equivalent of the reference's
``VideoMultiScaleMaskedTransformerDecoder[_dvisPlus]``
(`mask2former_video/modeling/transformer_decoder/video_mask2former_transformer_decoder.py`,
`dvis_Plus/video_mask2former_transformer_decoder.py:176-353`):

- 100 learned queries shared across the T frames of a clip;
- L layers cycling over the 3 transformer feature scales; each layer is
  masked cross-attention (attention restricted to the foreground of the
  previous layer's mask prediction; all-background queries unmask), query
  self-attention, FFN — pre-prediction heads give deep supervision;
- class head (K+1 logits) + mask-embed MLP dotted with 1/4 mask features;
- optional ReID embedding head (DVIS+), producing per-query track embeddings.

Static shapes: T, H, W are compile-time; the torch bool attention mask
becomes an additive bias.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmor_tpu.models.layers import MLP, sine_position_embedding_2d

NEG_INF = -1e9


@dataclass(frozen=True)
class MaskDecoderConfig:
    hidden_dim: int = 256
    num_queries: int = 100
    n_heads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9  # cycles over the 3 scales
    mask_dim: int = 256
    num_classes: int = 124  # reference quirk: VSPW head size kept for OR (24 live)
    reid_dim: int = 256
    with_reid: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @classmethod
    def tiny(cls, **kw):
        base = dict(hidden_dim=32, num_queries=8, n_heads=4, dim_feedforward=64,
                    dec_layers=3, mask_dim=32, num_classes=10, reid_dim=32)
        base.update(kw)
        return cls(**base)


def _attention(q, k, v, bias, n_heads, dtype):
    """Plain MHA with additive bias; (B, Lq, C) x (B, Lk, C)."""
    b, lq, c = q.shape
    head_dim = c // n_heads
    qh = q.reshape(b, lq, n_heads, head_dim).transpose(0, 2, 1, 3)
    kh = k.reshape(b, -1, n_heads, head_dim).transpose(0, 2, 1, 3)
    vh = v.reshape(b, -1, n_heads, head_dim).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
        jnp.asarray(head_dim, jnp.float32)
    )
    if bias is not None:
        logits = logits + bias
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, c)


class AttentionBlock(nn.Module):
    """Attention + residual + post-LN, matching the reference's
    (Self|Cross|ReferringCross)AttentionLayer with pre_norm=False: position
    embeddings are added to q/k only, and the residual is the (possibly
    distinct) input ``x`` — for the DVIS ReferringCrossAttentionLayer, ``x``
    is the identity path while ``q_input`` is the reference
    (`dvis_Plus/tracker.py:10-95`)."""

    dim: int
    n_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, q_input, k_input, v_input, bias=None):
        dense = lambda name: nn.Dense(self.dim, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        q = dense("q_proj")(q_input)
        k = dense("k_proj")(k_input)
        v = dense("v_proj")(v_input)
        attn = _attention(q, k, v, bias, self.n_heads, self.dtype)
        attn = dense("out_proj")(attn)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                            name="norm")(x + attn)


class FFNBlock(nn.Module):
    dim: int
    ffn_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.ffn_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(h)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                            name="norm")(x + h)


class VideoMaskedTransformerDecoder(nn.Module):
    cfg: MaskDecoderConfig

    def setup(self):
        cfg = self.cfg
        self.query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0),
            (cfg.num_queries, cfg.hidden_dim), cfg.param_dtype,
        )
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (cfg.num_queries, cfg.hidden_dim), cfg.param_dtype,
        )
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (3, cfg.hidden_dim),
            cfg.param_dtype,
        )
        self.input_proj = [
            nn.Dense(cfg.hidden_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name=f"input_proj_{i}")
            for i in range(3)
        ]
        self.cross_attn = [
            AttentionBlock(cfg.hidden_dim, cfg.n_heads, cfg.dtype, cfg.param_dtype,
                           name=f"cross_attn_{i}")
            for i in range(cfg.dec_layers)
        ]
        self.self_attn = [
            AttentionBlock(cfg.hidden_dim, cfg.n_heads, cfg.dtype, cfg.param_dtype,
                           name=f"self_attn_{i}")
            for i in range(cfg.dec_layers)
        ]
        self.ffn = [
            FFNBlock(cfg.hidden_dim, cfg.dim_feedforward, cfg.dtype, cfg.param_dtype,
                     name=f"ffn_{i}")
            for i in range(cfg.dec_layers)
        ]
        self.decoder_norm = nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                                         name="decoder_norm")
        self.class_embed = nn.Dense(cfg.num_classes + 1, dtype=cfg.dtype,
                                    param_dtype=cfg.param_dtype, name="class_embed")
        self.mask_embed = MLP(cfg.hidden_dim, cfg.mask_dim, 3, cfg.dtype,
                              cfg.param_dtype, name="mask_embed")
        if cfg.with_reid:
            self.reid_embed = MLP(cfg.hidden_dim, cfg.reid_dim, 3, cfg.dtype,
                                  cfg.param_dtype, name="reid_embed")

    def _predict(self, queries, mask_features, level_shape):
        """Heads + next-layer attention bias.

        queries: (B, Q, C); mask_features: (B, T, H, W, C).
        Returns (class_logits, masks (B,Q,T,H,W), attn_bias (B,1,Q,T*h*w), embds).
        """
        cfg = self.cfg
        x = self.decoder_norm(queries)
        class_logits = self.class_embed(x)
        mask_embed = self.mask_embed(x)  # (B, Q, mask_dim)
        masks = jnp.einsum("bqc,bthwc->bqthw", mask_embed, mask_features)

        h, w = level_shape
        b, q, t = masks.shape[:3]
        small = jax.image.resize(
            masks, (b, q, t, h, w), method="bilinear"
        )
        fg = (jax.nn.sigmoid(small) >= 0.5).reshape(b, q, t * h * w)
        # queries whose mask has no foreground attend everywhere
        # (mask2former_transformer_decoder.py "attn_mask.sum(-1)" fix)
        any_fg = jnp.any(fg, axis=-1, keepdims=True)
        allow = fg | ~any_fg
        bias = jnp.where(allow, 0.0, NEG_INF)[:, None]  # (B, 1, Q, T*h*w)

        embds = self.reid_embed(x) if cfg.with_reid else None
        return class_logits, masks, bias, embds

    def __call__(
        self,
        multi_scale_features: list[jax.Array],  # [(B*T, h, w, C)] x3, 1/32->1/8
        mask_features: jax.Array,  # (B, T, H/4, W/4, mask_dim)
        num_frames: int,
    ):
        cfg = self.cfg
        bt = multi_scale_features[0].shape[0]
        b = bt // num_frames
        t = num_frames

        srcs, poss, shapes = [], [], []
        for i, f in enumerate(multi_scale_features):
            _, h, w, _ = f.shape
            src = self.input_proj[i](f) + self.level_embed[i].astype(cfg.dtype)
            src = src.reshape(b, t * h * w, cfg.hidden_dim)
            pos = sine_position_embedding_2d(h, w, cfg.hidden_dim).astype(cfg.dtype)
            pos = jnp.tile(pos[None], (t, 1, 1)).reshape(1, t * h * w, cfg.hidden_dim)
            srcs.append(src)
            poss.append(pos)
            shapes.append((h, w))

        queries = jnp.broadcast_to(
            self.query_feat[None].astype(cfg.dtype), (b, cfg.num_queries, cfg.hidden_dim)
        )
        q_pos = self.query_embed[None].astype(cfg.dtype)

        outputs = []
        cls_logits, masks, bias, embds = self._predict(queries, mask_features, shapes[0])
        outputs.append({"pred_logits": cls_logits, "pred_masks": masks,
                        "pred_embds": embds})

        for layer in range(cfg.dec_layers):
            lvl = layer % 3
            queries = self.cross_attn[layer](
                queries, queries + q_pos, srcs[lvl] + poss[lvl], srcs[lvl], bias
            )
            queries = self.self_attn[layer](
                queries, queries + q_pos, queries + q_pos, queries
            )
            queries = self.ffn[layer](queries)
            next_lvl = (layer + 1) % 3
            cls_logits, masks, bias, embds = self._predict(
                queries, mask_features, shapes[next_lvl]
            )
            outputs.append({"pred_logits": cls_logits, "pred_masks": masks,
                            "pred_embds": embds})

        final = outputs[-1]
        return {
            "pred_logits": final["pred_logits"],
            "pred_masks": final["pred_masks"],
            "pred_embds": final["pred_embds"],
            "queries": queries,
            "aux_outputs": outputs[:-1],
        }
