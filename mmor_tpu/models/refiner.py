"""Temporal refiner: full-video offline refinement of tracked queries.

Equivalent of the reference ``TemporalRefiner`` (`dvis_Plus/refiner.py`):
L layers of [long-temporal self-attention -> short-term 1D convs (k5 + k3,
replicate padding, residual + LN) -> object self-attention -> cross-attention
to the tracker's frame queries -> FFN]; video-level class logits via
activation-weighted temporal pooling (`refiner.py:198-212`); masks from a
3-layer MLP dotted with mask features (windowed upstream if memory-bound).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmor_tpu.models.layers import MLP
from mmor_tpu.models.mask2former_decoder import AttentionBlock, FFNBlock


@dataclass(frozen=True)
class RefinerConfig:
    hidden_dim: int = 256
    ffn_dim: int = 2048
    n_heads: int = 8
    n_layers: int = 6
    mask_dim: int = 256
    num_classes: int = 124
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @classmethod
    def tiny(cls, **kw):
        base = dict(hidden_dim=32, ffn_dim=64, n_heads=4, n_layers=2,
                    mask_dim=32, num_classes=10)
        base.update(kw)
        return cls(**base)


def _replicate_pad_1d(x: jax.Array, k: int) -> jax.Array:
    """Replicate-pad the time axis (axis 1) for a 'same' conv of width k."""
    left = (k - 1) // 2
    right = k - 1 - left
    first = jnp.repeat(x[:, :1], left, axis=1)
    last = jnp.repeat(x[:, -1:], right, axis=1)
    return jnp.concatenate([first, x, last], axis=1)


class ShortTermConv(nn.Module):
    """Conv1d(k5) -> relu -> Conv1d(k3) over time, replicate padding,
    residual + LayerNorm (refiner.py:44-56, 118-123)."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (N, T, C)
        h = nn.Conv(self.dim, (5,), padding="VALID", dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv5")(_replicate_pad_1d(x, 5))
        h = nn.relu(h)
        h = nn.Conv(self.dim, (3,), padding="VALID", dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv3")(_replicate_pad_1d(h, 3))
        return nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                            name="norm")(h + x)


class TemporalRefiner(nn.Module):
    cfg: RefinerConfig

    def setup(self):
        cfg = self.cfg
        mk_attn = lambda name: AttentionBlock(cfg.hidden_dim, cfg.n_heads,
                                              cfg.dtype, cfg.param_dtype, name=name)
        self.time_attn = [mk_attn(f"time_attn_{i}") for i in range(cfg.n_layers)]
        self.short_conv = [
            ShortTermConv(cfg.hidden_dim, cfg.dtype, cfg.param_dtype,
                          name=f"short_conv_{i}")
            for i in range(cfg.n_layers)
        ]
        self.obj_attn = [mk_attn(f"obj_attn_{i}") for i in range(cfg.n_layers)]
        self.cross_attn = [mk_attn(f"cross_attn_{i}") for i in range(cfg.n_layers)]
        self.ffn = [
            FFNBlock(cfg.hidden_dim, cfg.ffn_dim, cfg.dtype, cfg.param_dtype,
                     name=f"ffn_{i}")
            for i in range(cfg.n_layers)
        ]
        self.decoder_norm = nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                                         name="decoder_norm")
        self.class_embed = nn.Dense(cfg.num_classes + 1, dtype=cfg.dtype,
                                    param_dtype=cfg.param_dtype, name="class_embed")
        self.mask_embed = MLP(cfg.hidden_dim, cfg.mask_dim, 3, cfg.dtype,
                              cfg.param_dtype, name="mask_embed")
        self.activation_proj = nn.Dense(1, dtype=cfg.dtype,
                                        param_dtype=cfg.param_dtype,
                                        name="activation_proj")

    def _pred_class(self, x: jax.Array) -> jax.Array:
        """Activation-weighted temporal pooling -> per-video class logits
        replicated over T. x: (L, B, T, Q, C) -> (L, B, T, Q, K+1)."""
        act = jax.nn.softmax(self.activation_proj(x), axis=2)  # over T
        pooled = jnp.sum(x * act, axis=2, keepdims=True)
        pooled = jnp.broadcast_to(pooled, x.shape)
        return self.class_embed(pooled)

    def __call__(
        self,
        instance_embeds: jax.Array,  # (B, T, Q, C) tracker-aligned queries
        frame_embeds: jax.Array,  # (B, T, Q, C) tracker frame queries (memory)
        mask_features: jax.Array,  # (B, T, H, W, mask_dim)
        train: bool = False,
    ):
        cfg = self.cfg
        b, t, q, c = instance_embeds.shape
        x = instance_embeds
        memory = frame_embeds.reshape(b * t, q, c)

        layer_outputs = []
        for i in range(cfg.n_layers):
            # long temporal self-attention: tokens = T, batch = B*Q
            xt = x.transpose(0, 2, 1, 3).reshape(b * q, t, c)
            xt = self.time_attn[i](xt, xt, xt, xt)
            # short-term conv over time
            xt = self.short_conv[i](xt)
            # object self-attention: tokens = Q, batch = B*T
            xq = xt.reshape(b, q, t, c).transpose(0, 2, 1, 3).reshape(b * t, q, c)
            xq = self.obj_attn[i](xq, xq, xq, xq)
            # cross-attention to the tracker's per-frame queries
            xq = self.cross_attn[i](xq, xq, memory, memory)
            xq = self.ffn[i](xq)
            x = xq.reshape(b, t, q, c)
            layer_outputs.append(x)

        stack = jnp.stack(layer_outputs, axis=0)  # (L, B, T, Q, C)
        stack = stack if train else stack[-1:]
        normed = self.decoder_norm(stack)
        outs_class = self._pred_class(normed)  # (L, B, T, Q, K+1)
        mask_embed = self.mask_embed(normed)
        outs_masks = jnp.einsum("lbtqc,bthwc->lbqthw", mask_embed, mask_features)

        return {
            "pred_logits": outs_class[-1],  # (B, T, Q, K+1)
            "pred_masks": outs_masks[-1],  # (B, Q, T, H, W)
            "pred_embds": normed[-1],  # (B, T, Q, C)
            "aux_outputs": [
                {"pred_logits": c_, "pred_masks": m_}
                for c_, m_ in zip(outs_class[:-1], outs_masks[:-1])
            ],
        }
