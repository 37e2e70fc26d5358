"""ViT-Adapter backbone over a DINOv2-style plain ViT.

Equivalent of the reference's `mask2former/modeling/backbones_vitAdapter/`
(`adapter.py`: Injector / Extractor / SpatialPriorModule around a DINOv2 ViT,
`backbones.py`; the same deformable-attention op drives the interactions):

- a conv SpatialPriorModule produces multi-scale features c2 (1/4) .. c4 (1/32);
- interaction blocks alternate: an Injector (deformable cross-attention from
  ViT tokens to the spatial pyramid, gated residual) feeds spatial detail into
  the ViT; an Extractor (reverse cross-attention + FFN) refines the pyramid
  from the ViT tokens;
- outputs res2..res5 for the pixel decoder (res3 is the ViT's native 1/16
  scale mixed into the pyramid, matching the adapter's split-and-upsample).

The ViT body is a standard pre-LN transformer (DINOv2 geometry: patch 14,
learned positions); converted DINOv2 weights drop in via the patch/blocks
naming.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.models.layers import DeformableAttention, sine_position_embedding_2d
from mmor_tpu.models.swin import DropPath


@dataclass(frozen=True)
class VitAdapterConfig:
    patch_size: int = 14
    vit_dim: int = 1024  # DINOv2 ViT-L
    vit_layers: int = 24
    vit_heads: int = 16
    mlp_dim: int = 4096
    conv_dim: int = 64  # spatial prior module stem width
    n_interactions: int = 4
    n_points: int = 4
    # stochastic depth over ViT blocks (linspace decay) and the Extractor
    # FFN branch, matching the reference's drop_path threading
    # (backbones.py:116-118, adapter.py:112,124); DINOv2 default is 0.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @classmethod
    def tiny_test(cls, **kw):
        base = dict(patch_size=8, vit_dim=32, vit_layers=2, vit_heads=2,
                    mlp_dim=64, conv_dim=8, n_interactions=1)
        base.update(kw)
        return cls(**base)


class VitBlock(nn.Module):
    cfg: VitAdapterConfig
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                                       name=name)
        dp = DropPath(self.drop_path, name="drop_path")
        h = ln("ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=cfg.vit_heads, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="attn",
        )(h, h)
        x = x + dp(h, train)
        h = ln("ln2")(x)
        h = nn.Dense(cfg.mlp_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.vit_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="fc2")(h)
        return x + dp(h, train), None


class SpatialPriorModule(nn.Module):
    """Conv stem -> (c2 1/4, c3 1/8, c4 1/16, c5 1/32), all projected to dim."""

    cfg: VitAdapterConfig
    out_dim: int

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        conv = lambda f, s, name: nn.Conv(
            f, (3, 3), strides=(s, s), padding="SAME", dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name,
        )
        x = nn.relu(conv(cfg.conv_dim, 2, "stem1")(images.astype(cfg.dtype)))
        x = nn.relu(conv(cfg.conv_dim, 2, "stem2")(x))  # 1/4
        c2 = x
        c3 = nn.relu(conv(cfg.conv_dim * 2, 2, "down3")(c2))  # 1/8
        c4 = nn.relu(conv(cfg.conv_dim * 4, 2, "down4")(c3))  # 1/16
        c5 = nn.relu(conv(cfg.conv_dim * 4, 2, "down5")(c4))  # 1/32
        proj = lambda f, name: nn.Conv(self.out_dim, (1, 1), dtype=cfg.dtype,
                                       param_dtype=cfg.param_dtype, name=name)
        return (proj(self.out_dim, "proj2")(c2), proj(self.out_dim, "proj3")(c3),
                proj(self.out_dim, "proj4")(c4), proj(self.out_dim, "proj5")(c5))


class Injector(nn.Module):
    """Spatial pyramid -> ViT tokens, gated residual (adapter.py Injector)."""

    cfg: VitAdapterConfig

    @nn.compact
    def __call__(self, vit_tokens, vit_shape, pyramid_flat, pyramid_shapes):
        cfg = self.cfg
        h, w = vit_shape
        ref = _grid_reference_points(h, w, len(pyramid_shapes))
        attn = DeformableAttention(
            cfg.vit_dim, len(pyramid_shapes), cfg.vit_heads, cfg.n_points,
            cfg.dtype, cfg.param_dtype, name="attn",
        )(nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="q_norm")(vit_tokens),
          ref[None], pyramid_flat, pyramid_shapes)
        gamma = self.param("gamma", nn.initializers.zeros, (cfg.vit_dim,),
                           cfg.param_dtype)
        return vit_tokens + gamma.astype(cfg.dtype) * attn


class Extractor(nn.Module):
    """ViT tokens -> spatial pyramid + FFN (adapter.py Extractor)."""

    cfg: VitAdapterConfig

    @nn.compact
    def __call__(self, pyramid_flat, pyramid_shapes, vit_tokens, vit_shape,
                 train: bool = False):
        cfg = self.cfg
        refs = []
        for (h, w) in pyramid_shapes:
            refs.append(_grid_reference_points(h, w, 1)[:, 0])
        ref = jnp.concatenate(refs, axis=0)[:, None, :]  # (S, 1, 2)
        attn = DeformableAttention(
            cfg.vit_dim, 1, cfg.vit_heads, cfg.n_points, cfg.dtype,
            cfg.param_dtype, name="attn",
        )(nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="q_norm")(pyramid_flat),
          ref[None], vit_tokens, (vit_shape,))
        x = pyramid_flat + attn
        h = nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name="ffn_norm")(x)
        h = nn.Dense(cfg.vit_dim * 2, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.vit_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="fc2")(h)
        # drop-path on the cffn branch (adapter.py:124)
        return x + DropPath(cfg.drop_path_rate, name="drop_path")(h, train)


def _grid_reference_points(h: int, w: int, n_levels: int) -> jnp.ndarray:
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ref = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    return jnp.broadcast_to(ref[:, None, :], (h * w, n_levels, 2))


class VitAdapterBackbone(nn.Module):
    """(B, H, W, 3) -> {'res2'.. 'res5'} with channel width = vit_dim."""

    cfg: VitAdapterConfig

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.cfg
        b, ih, iw, _ = images.shape
        # stochastic-depth decay over the ViT blocks (backbones.py:118)
        dpr = np.linspace(0.0, cfg.drop_path_rate, max(cfg.vit_layers, 1))

        # ViT patch tokens (1/patch scale)
        tokens = nn.Conv(cfg.vit_dim, (cfg.patch_size, cfg.patch_size),
                         strides=(cfg.patch_size, cfg.patch_size),
                         dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name="patch_embed")(images.astype(cfg.dtype))
        _, th, tw, _ = tokens.shape
        tokens = tokens.reshape(b, th * tw, cfg.vit_dim)
        tokens = tokens + sine_position_embedding_2d(
            th, tw, cfg.vit_dim
        ).astype(cfg.dtype)[None]

        c2, c3, c4, c5 = SpatialPriorModule(cfg, cfg.vit_dim, name="spm")(images)
        pyr_shapes = tuple((f.shape[1], f.shape[2]) for f in (c2, c3, c4, c5))
        pyramid = jnp.concatenate(
            [f.reshape(b, -1, cfg.vit_dim) for f in (c2, c3, c4, c5)], axis=1
        )

        blocks_per_chunk = max(cfg.vit_layers // cfg.n_interactions, 1)
        layer = 0
        for i in range(cfg.n_interactions):
            tokens = Injector(cfg, name=f"injector_{i}")(
                tokens, (th, tw), pyramid, pyr_shapes
            )
            for _ in range(blocks_per_chunk):
                if layer >= cfg.vit_layers:
                    break
                tokens, _ = VitBlock(cfg, drop_path=float(dpr[layer]),
                                     name=f"vit_block_{layer}")(tokens, train)
                layer += 1
            pyramid = Extractor(cfg, name=f"extractor_{i}")(
                pyramid, pyr_shapes, tokens, (th, tw), train
            )
        while layer < cfg.vit_layers:
            tokens, _ = VitBlock(cfg, drop_path=float(dpr[layer]),
                                 name=f"vit_block_{layer}")(tokens, train)
            layer += 1

        # split the refined pyramid back to maps
        outs = {}
        start = 0
        for name, (h, w) in zip(("res2", "res3", "res4", "res5"), pyr_shapes):
            outs[name] = jax.lax.dynamic_slice_in_dim(
                pyramid, start, h * w, axis=1
            ).reshape(b, h, w, cfg.vit_dim)
            start += h * w
        # mix the ViT's native-scale tokens into the closest pyramid level
        vit_map = tokens.reshape(b, th, tw, cfg.vit_dim)
        target = outs["res4"]
        vit_resized = jax.image.resize(
            vit_map, (b, target.shape[1], target.shape[2], cfg.vit_dim), "bilinear"
        )
        outs["res4"] = target + vit_resized
        return outs
