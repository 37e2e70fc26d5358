"""MSDeformAttn pixel decoder: deformable transformer encoder + FPN fusion.

Equivalent of the reference ``MSDeformAttnPixelDecoder``
(`mask2former/modeling/pixel_decoder/msdeformattn.py:21-356`): res3-res5 are
projected to 256ch, run through 6 deformable-attention encoder layers with
sine positions + level embeds, reshaped back to maps; res2 is fused in via a
lateral 1x1 + output 3x3 FPN step; a final 3x3 conv emits the 1/4-scale mask
features. Images are padded/resized to a static size upstream, so there are no
padding masks (valid ratios are 1) and every shape is compile-time static.

Returns (mask_features 1/4, [1/32, 1/16, 1/8] transformer features).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmor_tpu.models.layers import DeformableAttention, sine_position_embedding_2d


class DeformableEncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes,
                 query_shapes=None, sampler="gather"):
        attn = DeformableAttention(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            self.dtype, self.param_dtype, name="self_attn",
        )(src + pos, reference_points, src, spatial_shapes,
          query_shapes=query_shapes, sampler=sampler)
        src = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                           name="norm1")(src + attn)
        h = nn.Dense(self.d_ffn, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc1")(src)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc2")(h)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                            name="norm2")(src + h)


def _reference_points(spatial_shapes, n_levels: int) -> jnp.ndarray:
    """Per-token normalized centers replicated across levels -> (S, L, 2)."""
    refs = []
    for h, w in spatial_shapes:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        refs.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    ref = jnp.concatenate(refs, axis=0)  # (S, 2)
    return jnp.broadcast_to(ref[:, None, :], (ref.shape[0], n_levels, 2))


class MSDeformAttnPixelDecoder(nn.Module):
    conv_dim: int = 256
    mask_dim: int = 256
    n_layers: int = 6
    n_heads: int = 8
    n_points: int = 4
    # encoder sampling core: "gather" | "pallas" | "tiled"
    # (see SegmenterConfig.sampler)
    sampler: str = "gather"
    transformer_features: tuple[str, ...] = ("res3", "res4", "res5")
    fpn_feature: str = "res2"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: dict[str, jax.Array]):
        n_levels = len(self.transformer_features)
        # project transformer inputs, high->low resolution reversed to
        # (res5, res4, res3) like the reference (msdeformattn.py:252-260)
        names = tuple(reversed(self.transformer_features))
        srcs, shapes, pos_list = [], [], []
        for name in names:
            f = features[name]
            n, h, w, _ = f.shape
            proj = nn.Conv(self.conv_dim, (1, 1), dtype=self.dtype,
                           param_dtype=self.param_dtype, name=f"input_proj_{name}")(f)
            # reference input_proj is Conv2d + GroupNorm(32) (msdeformattn.py:214-217)
            proj = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"input_proj_{name}_norm")(proj)
            srcs.append(proj.reshape(n, h * w, self.conv_dim))
            shapes.append((h, w))
            pos_list.append(
                sine_position_embedding_2d(h, w, self.conv_dim).astype(self.dtype)
            )
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (n_levels, self.conv_dim), self.param_dtype,
        )
        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(
            [p + level_embed[i].astype(self.dtype) for i, p in enumerate(pos_list)],
            axis=0,
        )[None]
        refs = _reference_points(shapes, n_levels)[None]

        sampler = self.sampler
        if sampler == "pallas" and jax.devices()[0].platform not in (
                "tpu", "axon"):
            sampler = "gather"  # kernel is TPU-only; CPU tests keep gather
        qshapes = tuple(shapes) if sampler != "gather" else None
        for i in range(self.n_layers):
            src = DeformableEncoderLayer(
                self.conv_dim, self.conv_dim * 4, n_levels, self.n_heads,
                self.n_points, self.dtype, self.param_dtype, name=f"layer_{i}",
            )(src, pos, refs, tuple(shapes), query_shapes=qshapes,
              sampler=sampler)

        # split back to maps, high->low res order (res5, res4, res3)
        maps = []
        start = 0
        for (h, w) in shapes:
            maps.append(
                jax.lax.dynamic_slice_in_dim(src, start, h * w, axis=1)
                .reshape(-1, h, w, self.conv_dim)
            )
            start += h * w

        # FPN: fuse res2 with the upsampled finest transformer map (res3 scale)
        lateral = nn.Conv(self.conv_dim, (1, 1), use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="fpn_lateral")(
            features[self.fpn_feature]
        )
        lateral = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                               param_dtype=self.param_dtype, name="fpn_lateral_norm")(lateral)
        finest = maps[-1]
        up = jax.image.resize(
            finest,
            (finest.shape[0], lateral.shape[1], lateral.shape[2], self.conv_dim),
            method="nearest",
        )
        fused = lateral + up
        fused = nn.Conv(self.conv_dim, (3, 3), use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fpn_output")(fused)
        fused = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="fpn_output_norm")(fused)
        fused = nn.relu(fused)

        mask_features = nn.Conv(self.mask_dim, (3, 3), dtype=self.dtype,
                                param_dtype=self.param_dtype, name="mask_features")(fused)
        return mask_features, maps  # maps: [1/32, 1/16, 1/8]
