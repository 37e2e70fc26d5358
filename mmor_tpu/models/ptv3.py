"""PointTransformerV3 (cls_mode) — TPU-native redesign.

Capability-equivalent of the reference PTv3 point-cloud encoder
(`LLaVA/llava/model/multimodal_projector/pointtransformerv3.py:787-1005`),
rebuilt for XLA's static-shape model instead of spconv/torch_scatter/
flash-attn-varlen (SURVEY.md §2.3):

- clouds are padded to a static capacity with a validity mask (no dynamic
  point counts anywhere);
- serialization uses the same 4 space-filling-curve orders (ops/serialization);
  blocks cycle through orders like the reference's per-block order shuffle;
- patch attention = our Pallas flash attention with *segment ids*: after
  sorting along the curve, points are windowed into ``patch_size`` chunks and
  attention is masked to equal chunks — the reference's varlen flash attention
  (`SerializedAttention`, `:322-493`) expressed as segments;
- the spconv stem / xCPE sparse convs become a linear embedding plus a
  serialized depthwise neighborhood mix (k=3 along the curve) — the TPU
  analogue of a submanifold 3x3x3 conv's local aggregation;
- SerializedPooling's torch_scatter reductions become sort + boundary cumsum
  + ``jax.ops.segment_max/mean`` with static segment capacity; the grid
  coarsens by 2x per stage (code >> 3), matching the reference's
  ``serialized_code >> pooling_depth * 3``;
- cls_mode head: masked global mean pool -> ``project_pc`` lives in the MM2SG
  pooler (builder.py:919 applies it there).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmor_tpu.config import PTv3Config
from mmor_tpu.ops.attention import flash_attention
from mmor_tpu.ops.serialization import ORDERS, encode


def voxelize(
    points: jax.Array,  # (N, 6) xyzrgb (metres, already /1000 like the reference loader)
    valid: jax.Array,  # (N,) bool
    grid_size: float,
) -> tuple[jax.Array, jax.Array]:
    """Quantize coordinates to grid cells. Returns (grid_coords (N,3) int32,
    valid). Coordinates are shifted to a non-negative origin computed over
    valid points (the reference's GridSampling subtracts the min)."""
    xyz = points[:, :3]
    big = jnp.float32(1e9)
    mins = jnp.min(jnp.where(valid[:, None], xyz, big), axis=0)
    grid = jnp.floor((xyz - mins) / grid_size).astype(jnp.int32)
    return jnp.clip(grid, 0, 1023), valid


class PTv3Block(nn.Module):
    """Pre-norm serialized-attention block + MLP, with a depthwise
    neighborhood mix standing in for xCPE."""

    dim: int
    n_heads: int
    patch_size: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, feat, perm, inv_perm, valid):
        """feat: (P, C); perm/inv_perm: (P,) serialization permutation."""
        p, c = feat.shape
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype,
                                         param_dtype=self.param_dtype, name=name)

        sorted_feat = feat[perm]
        sorted_valid = valid[perm]

        # xCPE analogue: depthwise conv (k=3) along the serialized order
        mixed = nn.Conv(
            c, (3,), padding="SAME", feature_group_count=c, dtype=self.dtype,
            param_dtype=self.param_dtype, name="cpe",
        )(sorted_feat[None])[0]
        sorted_feat = sorted_feat + jnp.where(sorted_valid[:, None], mixed, 0.0)

        # patch attention over contiguous curve windows
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                         name="attn_norm")(sorted_feat)
        qkv = dense(3 * c, "qkv")(h).reshape(p, 3, self.n_heads, c // self.n_heads)
        q, k, v = (
            qkv[:, 0][None].transpose(0, 2, 1, 3),
            qkv[:, 1][None].transpose(0, 2, 1, 3),
            qkv[:, 2][None].transpose(0, 2, 1, 3),
        )
        patch_ids = jnp.arange(p, dtype=jnp.int32) // self.patch_size
        segments = jnp.where(sorted_valid, patch_ids, -1)[None]  # (1, P)
        attn = flash_attention(q, k, v, segment_ids=segments)
        attn = attn.transpose(0, 2, 1, 3).reshape(p, c)
        sorted_feat = sorted_feat + dense(c, "proj")(attn)

        h = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                         name="mlp_norm")(sorted_feat)
        h = dense(int(c * 4), "fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = dense(c, "fc2")(h)
        sorted_feat = sorted_feat + h

        return sorted_feat[inv_perm]


def _pool_serialized(code, feat, grid, valid, capacity, depth_shift=3):
    """SerializedPooling: merge points sharing a coarsened code.

    code: (P,) base z-order codes; returns (code', feat', grid', valid') with
    static ``capacity`` rows. Features reduce by max, grid coords by min
    (cell-origin), like the reference's reduce='max' + coord mean (the exact
    coord reducer only shifts centers; codes are recomputed from grids).
    """
    coarse = jnp.where(valid, code >> depth_shift, jnp.int32(2**30))
    order = jnp.argsort(coarse, stable=True)
    coarse_s = coarse[order]
    feat_s = feat[order]
    grid_s = grid[order]
    valid_s = valid[order]

    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), coarse_s[1:] != coarse_s[:-1]]
    )
    seg_ids = jnp.cumsum(boundary.astype(jnp.int32)) - 1  # (P,) 0..n_seg-1
    seg_ids = jnp.where(valid_s, seg_ids, capacity)  # invalid -> dropped row

    pooled_feat = jax.ops.segment_max(
        jnp.where(valid_s[:, None], feat_s, -jnp.inf), seg_ids,
        num_segments=capacity + 1,
    )[:capacity]
    pooled_grid = jax.ops.segment_min(
        jnp.where(valid_s[:, None], grid_s, 2**30), seg_ids,
        num_segments=capacity + 1,
    )[:capacity] >> 1  # grid coarsens 2x
    counts = jax.ops.segment_sum(
        valid_s.astype(jnp.int32), seg_ids, num_segments=capacity + 1
    )[:capacity]
    new_valid = counts > 0
    pooled_feat = jnp.where(new_valid[:, None], pooled_feat, 0.0)
    pooled_grid = jnp.where(new_valid[:, None], pooled_grid, 0)
    new_code = encode(pooled_grid, "z")
    return new_code, pooled_feat, pooled_grid, new_valid


class PointTransformerV3(nn.Module):
    """Encoder-only (cls_mode) PTv3 -> (out_dim,) pooled cloud feature."""

    cfg: PTv3Config

    @nn.compact
    def __call__(self, points: jax.Array, valid: jax.Array) -> jax.Array:
        """points: (P, 6) padded xyzrgb; valid: (P,) bool -> (out_dim,)."""
        cfg = self.cfg
        grid, valid = voxelize(points, valid, cfg.grid_size)
        feat = nn.Dense(cfg.enc_channels[0], dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, name="stem")(
            points.astype(cfg.dtype)
        )
        feat = nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                            name="stem_norm")(feat)
        feat = jnp.where(valid[:, None], feat, 0.0)

        capacity = points.shape[0]
        code = encode(grid, "z")
        block_idx = 0
        for stage, (channels, depth, heads) in enumerate(
            zip(cfg.enc_channels, cfg.enc_depths, cfg.enc_heads)
        ):
            if stage > 0:
                capacity = max(capacity // 2, cfg.patch_size)
                code, feat, grid, valid = _pool_serialized(
                    code, feat, grid, valid, capacity
                )
                feat = nn.Dense(channels, dtype=cfg.dtype,
                                param_dtype=cfg.param_dtype,
                                name=f"down_{stage}")(feat)
                feat = jnp.where(valid[:, None], feat, 0.0)
            for d in range(depth):
                order = ORDERS[block_idx % len(ORDERS)]
                blk_code = encode(grid, order)
                key = jnp.where(valid, blk_code, jnp.int32(2**30))
                perm = jnp.argsort(key, stable=True)
                inv_perm = jnp.argsort(perm, stable=True)
                feat = PTv3Block(
                    channels, heads, cfg.patch_size, cfg.dtype, cfg.param_dtype,
                    name=f"stage{stage}_block{d}",
                )(feat, perm, inv_perm, valid)
                feat = jnp.where(valid[:, None], feat, 0.0)
                block_idx += 1

        # masked global average pool (cls_mode, builder.py:135-141)
        denom = jnp.maximum(jnp.sum(valid), 1)
        pooled = jnp.sum(jnp.where(valid[:, None], feat, 0.0), axis=0) / denom
        return nn.Dense(cfg.out_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        name="head")(pooled)


def encode_pointcloud_batch(
    model: PointTransformerV3,
    params,
    points: jax.Array,  # (B, P, 6)
    valid: jax.Array,  # (B, P)
) -> jax.Array:
    """vmap the per-cloud encoder over a batch -> (B, out_dim)."""
    return jax.vmap(lambda p, v: model.apply(params, p, v))(points, valid)
