"""Shared layers for the panoptic stack: sine positions, MLP, deformable attention.

Geometry and init match the reference modules so converted checkpoints load
and training dynamics are preserved:
- ``PositionEmbeddingSine`` (`mask2former/modeling/transformer_decoder/position_encoding.py`);
- ``MSDeformAttn`` projections + directional offset-bias init
  (`pixel_decoder/ops/modules/ms_deform_attn.py:34-80`).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.ops.deformable_attention import (ms_deform_attn,
                                               ms_deform_attn_tiled)


def sine_position_embedding_2d(
    h: int, w: int, dim: int, temperature: float = 10000.0, normalize: bool = True
) -> jnp.ndarray:
    """DETR sine position embedding -> (h*w, dim)."""
    half = dim // 2
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))
    if normalize:
        eps = 1e-6
        scale = 2 * math.pi
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = temperature ** (2 * (jnp.arange(half, dtype=jnp.float32) // 2) / half)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1)
    pos = jnp.concatenate(
        [pos_y.reshape(h, w, -1), pos_x.reshape(h, w, -1)], axis=-1
    )
    return pos.reshape(h * w, dim)


class MLP(nn.Module):
    """DETR-style MLP head: n_layers Dense with relu between."""

    hidden_dim: int
    out_dim: int
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.n_layers - 1):
            x = nn.relu(
                nn.Dense(self.hidden_dim, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"fc{i}")(x)
            )
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"fc{self.n_layers - 1}")(x)


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Directional grid init for sampling-offset bias (ms_deform_attn.py:66-74)."""

    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * np.pi / n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        for p in range(n_points):
            grid[:, :, p, :] *= p + 1
        return jnp.asarray(grid.reshape(-1), dtype=dtype)

    return init


class DeformableAttention(nn.Module):
    """Multi-scale deformable attention over flattened level features."""

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (N, Lq, C) (position embeds already added)
        reference_points: jax.Array,  # (N, Lq, n_levels, 2) in [0, 1]
        value_flatten: jax.Array,  # (N, S, C)
        spatial_shapes: tuple[tuple[int, int], ...],
        query_shapes: tuple[tuple[int, int], ...] | None = None,
        sampler: str = "gather",
    ) -> jax.Array:
        n, lq, _ = query.shape
        head_dim = self.d_model // self.n_heads

        value = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="value_proj")(value_flatten)
        value = value.reshape(n, -1, self.n_heads, head_dim)

        offsets = nn.Dense(
            self.n_heads * self.n_levels * self.n_points * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(self.n_heads, self.n_levels, self.n_points),
            dtype=self.dtype, param_dtype=self.param_dtype, name="sampling_offsets",
        )(query).reshape(n, lq, self.n_heads, self.n_levels, self.n_points, 2)

        weights = nn.Dense(
            self.n_heads * self.n_levels * self.n_points,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attention_weights",
        )(query).reshape(n, lq, self.n_heads, self.n_levels * self.n_points)
        weights = jax.nn.softmax(weights, axis=-1).reshape(
            n, lq, self.n_heads, self.n_levels, self.n_points
        )

        normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], dtype=jnp.float32
        )  # (L, 2) in (x, y) order
        locations = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )

        if query_shapes is not None and sampler == "pallas":
            from mmor_tpu.ops.deformable_sampler import ms_deform_attn_pallas

            out = ms_deform_attn_pallas(value, spatial_shapes, locations,
                                        weights, query_shapes=query_shapes)
        elif query_shapes is not None and sampler == "tiled":
            out = ms_deform_attn_tiled(value, spatial_shapes, locations,
                                       weights, query_shapes=query_shapes)
        else:
            out = ms_deform_attn(value, spatial_shapes, locations, weights)
        return nn.Dense(self.d_model, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="output_proj")(out)
