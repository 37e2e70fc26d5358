"""Multi-scale deformable attention sampling — TPU-native (XLA gather) core.

Replaces the reference's CUDA extension
(`panoptic_segmentation/mask2former/modeling/pixel_decoder/ops/src/`, see
SURVEY.md §2.3). Numerics follow the reference's own oracle
``ms_deform_attn_core_pytorch`` (`functions/ms_deform_attn_func.py:53-72`):
bilinear sampling with zero padding and ``align_corners=False`` over each
feature level, weighted by per-point attention.

The gather formulation lets XLA fuse and differentiate the whole op; shapes
are static (levels are a compile-time tuple) so it jits anywhere. A Pallas
kernel can replace the gather behind the same API if it ever dominates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CORNERS = (
    (0, 0, lambda dx, dy: (1 - dx) * (1 - dy)),
    (1, 0, lambda dx, dy: dx * (1 - dy)),
    (0, 1, lambda dx, dy: (1 - dx) * dy),
    (1, 1, lambda dx, dy: dx * dy),
)


def _sample_level(
    value_l: jax.Array,  # (N, M, H*W, D) one level, heads leading
    h: int,
    w: int,
    loc: jax.Array,  # (N, Lq, M, P, 2) normalized [0,1]
) -> jax.Array:
    """Bilinear zero-padded sampling -> (N, M, Lq, P, D)."""
    n, m, _, d = value_l.shape
    _, lq, _, points, _ = loc.shape

    # align_corners=False pixel mapping (torch grid_sample convention)
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    dx = (x - x0f).astype(jnp.float32)
    dy = (y - y0f).astype(jnp.float32)
    x0, y0 = x0f.astype(jnp.int32), y0f.astype(jnp.int32)

    sampled = jnp.zeros((n, m, lq, points, d), dtype=jnp.float32)
    for ox, oy, corner_weight in _CORNERS:
        cx, cy = x0 + ox, y0 + oy
        valid = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
        flat = jnp.clip(cy, 0, h - 1) * w + jnp.clip(cx, 0, w - 1)  # (N, Lq, M, P)
        idx = flat.transpose(0, 2, 1, 3).reshape(n, m, lq * points)
        g = jnp.take_along_axis(
            value_l.astype(jnp.float32), idx[..., None], axis=2
        ).reshape(n, m, lq, points, d)
        cw = (corner_weight(dx, dy) * valid).transpose(0, 2, 1, 3)  # (N, M, Lq, P)
        sampled = sampled + g * cw[..., None]
    return sampled


def ms_deform_attn(
    value: jax.Array,  # (N, S, M, D) flattened multi-level features
    spatial_shapes: tuple[tuple[int, int], ...],  # static ((H1,W1), ...)
    sampling_locations: jax.Array,  # (N, Lq, M, L, P, 2) in [0,1]
    attention_weights: jax.Array,  # (N, Lq, M, L, P), softmaxed over L*P
) -> jax.Array:
    """Deformable attention core -> (N, Lq, M*D)."""
    n, s, m, d = value.shape
    _, lq, _, levels, _points, _ = sampling_locations.shape
    assert levels == len(spatial_shapes), "level count mismatch"
    assert s == sum(h * w for h, w in spatial_shapes), "flattened size mismatch"

    value_md = value.transpose(0, 2, 1, 3)  # (N, M, S, D)
    out = jnp.zeros((n, m, lq, d), dtype=jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(value_md, start, h * w, axis=2)
        start += h * w
        sampled = _sample_level(value_l, h, w, sampling_locations[:, :, :, lvl])
        w_l = attention_weights[:, :, :, lvl].astype(jnp.float32).transpose(0, 2, 1, 3)
        out = out + jnp.einsum("nmqpd,nmqp->nmqd", sampled, w_l)

    return out.transpose(0, 2, 1, 3).reshape(n, lq, m * d).astype(value.dtype)
