"""Swin Transformer backbone (T/S/B variants) for the panoptic segmenter.

Equivalent of the reference's `mask2former/modeling/backbone/swin.py`
(detectron2 D2SwinTransformer): 4x4 patch embedding, window attention with
relative position bias, shifted windows on odd blocks, patch merging between
stages, per-output LayerNorm; emits res2 (1/4) .. res5 (1/32) like ResNet50.

TPU notes: window partitioning is pure reshape/transpose (XLA-fused); the
shifted-window attention mask is computed statically per resolution; all
shapes are static (inputs pad to window multiples inside).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    # stochastic depth: per-block rates linspace(0, rate, sum(depths)),
    # applied to both residual branches in train mode (reference swin.py
    # DropPath usage at :291-292; cfg.MODEL.SWIN.DROP_PATH_RATE=0.3)
    drop_path_rate: float = 0.3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @classmethod
    def tiny_test(cls, **kw):
        base = dict(embed_dim=16, depths=(1, 1), num_heads=(2, 2), window_size=4)
        base.update(kw)
        return cls(**base)

    @classmethod
    def swin_t(cls, **kw):
        return cls(**kw)

    @classmethod
    def swin_s(cls, **kw):
        base = dict(depths=(2, 2, 18, 2))
        base.update(kw)
        return cls(**base)

    @classmethod
    def swin_b(cls, **kw):
        base = dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32))
        base.update(kw)
        return cls(**base)


class DropPath(nn.Module):
    """Stochastic depth: drop a residual branch per-sample (timm DropPath;
    reference swin.py:224,291-292). Identity when not training or rate 0."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if not train or self.rate == 0.0:
            return x
        # per-sample mask broadcast over all non-batch dims
        return nn.Dropout(
            self.rate, broadcast_dims=tuple(range(1, x.ndim)), name="drop"
        )(x, deterministic=False)


def _window_partition(x: jax.Array, w: int) -> jax.Array:
    """(B, H, W, C) -> (B*nH*nW, w*w, C)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(windows: jax.Array, w: int, h: int, wd: int) -> jax.Array:
    b = windows.shape[0] // ((h // w) * (wd // w))
    x = windows.reshape(b, h // w, wd // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


def _relative_position_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, ww, ww)
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, wd: int, w: int, shift: int) -> np.ndarray:
    """(nWindows, ww, ww) additive mask for shifted windows."""
    img = np.zeros((1, h, wd, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    windows = np.reshape(
        img.reshape(1, h // w, w, wd // w, w, 1).transpose(0, 1, 3, 2, 4, 5),
        (-1, w * w),
    )
    diff = windows[:, :, None] - windows[:, None, :]
    return np.where(diff == 0, 0.0, -100.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    n_heads: int
    window_size: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None) -> jax.Array:
        """x: (nW, ww, C); mask: (nWindowsPerImage, ww, ww) or None."""
        nw, ww, c = x.shape
        head_dim = self.dim // self.n_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(nw, ww, 3, self.n_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (nW, H, ww, hd)

        bias_table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.n_heads),
            self.param_dtype,
        )
        idx = jnp.asarray(_relative_position_index(self.window_size))
        bias = bias_table[idx.reshape(-1)].reshape(ww, ww, self.n_heads)
        bias = bias.transpose(2, 0, 1)[None].astype(jnp.float32)  # (1, H, ww, ww)

        logits = jnp.einsum("whqd,whkd->whqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, jnp.float32)
        )
        logits = logits + bias
        if mask is not None:
            n_img = mask.shape[0]
            logits = logits.reshape(-1, n_img, self.n_heads, ww, ww)
            logits = logits + mask[None, :, None]
            logits = logits.reshape(nw, self.n_heads, ww, ww)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("whqk,whkd->whqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nw, ww, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    n_heads: int
    window_size: int
    shift: int
    mlp_ratio: float
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:  # (B, H, W, C)
        b, h, wd, c = x.shape
        w = self.window_size
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                                       name=name)
        shortcut = x
        x = ln("ln1")(x)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(h, wd, w, self.shift))
        else:
            mask = None
        windows = _window_partition(x, w)
        windows = WindowAttention(self.dim, self.n_heads, w, self.dtype,
                                  self.param_dtype, name="attn")(windows, mask)
        x = _window_reverse(windows, w, h, wd)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(x, train)

        y = ln("ln2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc2")(y)
        return x + dp(y, train)


class SwinBackbone(nn.Module):
    """(B, H, W, 3) -> {'res2'..: features at strides 4/8/16/32}."""

    cfg: SwinConfig

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.cfg
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="patch_embed")(
            images.astype(cfg.dtype)
        )
        x = nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name="patch_norm")(x)

        # stochastic-depth decay rule: 0 -> drop_path_rate across all blocks
        # (reference swin.py:583)
        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.depths))
        outputs = {}
        dim = cfg.embed_dim
        block_i = 0
        for stage, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            b, h, wd, _ = x.shape
            w = cfg.window_size
            pad_h = (-h) % w
            pad_w = (-wd) % w
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 else w // 2
                x = SwinBlock(dim, heads, w, shift, cfg.mlp_ratio, cfg.dtype,
                              cfg.param_dtype, drop_path=float(dpr[block_i]),
                              name=f"stage{stage}_block{blk}")(x, train)
                block_i += 1
            x = x[:, :h, :wd]
            out = nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                               name=f"out_norm{stage}")(x)
            outputs[f"res{stage + 2}"] = out
            if stage < len(cfg.depths) - 1:
                # patch merging: 2x2 concat -> LN -> Linear(4C -> 2C)
                b, h2, w2, c = x.shape
                ph, pw = h2 % 2, w2 % 2
                if ph or pw:
                    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                    h2, w2 = h2 + ph, w2 + pw
                merged = jnp.concatenate([
                    x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                    x[:, 0::2, 1::2], x[:, 1::2, 1::2],
                ], axis=-1)
                merged = nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                                      name=f"merge_norm{stage}")(merged)
                x = nn.Dense(2 * dim, use_bias=False, dtype=cfg.dtype,
                             param_dtype=cfg.param_dtype,
                             name=f"merge_reduce{stage}")(merged)
                dim *= 2
        return outputs
