"""Point sampling for mask losses (detectron2 point_rend semantics).

Used by the video matcher/criterion
(`mask2former_video/modeling/{matcher,criterion}.py`): masks are compared on
``num_points`` sampled locations instead of full resolution —
uncertainty-biased during loss, uniform during matching. Bilinear sampling
follows torch ``grid_sample(align_corners=False, padding_mode='zeros')``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def point_sample(masks: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample (N, C, H, W)-style masks stored as (N, H, W, C) at normalized coords.

    masks: (N, H, W, C); coords: (N, P, 2) in [0, 1] (x, y). -> (N, P, C).
    """
    n, h, w, c = masks.shape
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    dx = (x - x0f).astype(masks.dtype)
    dy = (y - y0f).astype(masks.dtype)
    x0, y0 = x0f.astype(jnp.int32), y0f.astype(jnp.int32)

    flat = masks.reshape(n, h * w, c)
    out = jnp.zeros(coords.shape[:2] + (c,), dtype=masks.dtype)
    for ox, oy, cw in (
        (0, 0, (1 - dx) * (1 - dy)),
        (1, 0, dx * (1 - dy)),
        (0, 1, (1 - dx) * dy),
        (1, 1, dx * dy),
    ):
        cx, cy = x0 + ox, y0 + oy
        valid = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
        idx = jnp.clip(cy, 0, h - 1) * w + jnp.clip(cx, 0, w - 1)  # (N, P)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (N, P, C)
        out = out + g * (cw * valid)[..., None]
    return out


def uncertain_point_coords(
    key: jax.Array,
    logits: jax.Array,  # (N, H, W) class-agnostic mask logits
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jax.Array:
    """Uncertainty-biased point coords (point_rend
    ``get_uncertain_point_coords_with_randomness``): sample
    ``oversample*num_points`` uniform points, keep the ``importance`` fraction
    with highest ``-|logit|``, fill the rest with fresh uniform points.
    Returns (N, num_points, 2)."""
    n = logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    n_uncertain = int(importance_sample_ratio * num_points)
    n_random = num_points - n_uncertain

    k1, k2 = jax.random.split(key)
    coords = jax.random.uniform(k1, (n, n_sampled, 2))
    values = point_sample(logits[..., None], coords)[..., 0]  # (N, n_sampled)
    uncertainty = -jnp.abs(values)
    _, top_idx = jax.lax.top_k(uncertainty, n_uncertain)
    top_coords = jnp.take_along_axis(coords, top_idx[..., None], axis=1)
    if n_random > 0:
        rand_coords = jax.random.uniform(k2, (n, n_random, 2))
        return jnp.concatenate([top_coords, rand_coords], axis=1)
    return top_coords
