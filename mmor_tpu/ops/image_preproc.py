"""Fused on-device image preprocessing for the MM2SG hot path.

BASELINE.json requires decode/resize/normalize and view stacking fused into
the jit'd graph: JPEGs decode on host (libjpeg), but raw uint8 frames ship to
the device (4x less host->device traffic than f32) and pad-to-square +
bicubic resize + CLIP normalization run on-device, fusing into the CLIP patch
embedding. Semantics mirror the host path (`data/preprocessing.py`):
expand2square with the CLIP-mean background then bicubic resize — matching
``CLIPImageProcessor`` with LLaVA's ``image_aspect_ratio='pad'``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# plain numpy: module import can happen inside a jit trace (lazy import in
# mm2sg.generate) and module-level jnp constants would leak as tracers
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_views(
    frames: jax.Array,  # (..., H, W, 3) uint8 RGB
    image_size: int = 336,
) -> jax.Array:
    """Pad-to-square (CLIP-mean background) + bicubic resize + normalize.

    Works for any leading batch/view dims; output (..., S, S, 3) float32.
    The square canvas stays uint8 and the resize runs in bf16 — an f32
    canvas is 4x the bytes ((24, 2048, 2048, 3) f32 = 1.2 GB per view slot,
    a real batch-ceiling cost on the serving path); bf16's 0.4% rounding is
    below one uint8 LSB.
    """
    *lead, h, w, c = frames.shape
    x = frames.reshape((-1, h, w, c))

    side = max(h, w)
    if h != w:
        pad_y = (side - h) // 2
        pad_x = (side - w) // 2
        bg = jnp.round(CLIP_MEAN * 255.0).astype(np.uint8)
        canvas = jnp.broadcast_to(bg[None, None, None, :],
                                  (x.shape[0], side, side, c))
        x = jax.lax.dynamic_update_slice(canvas, x, (0, pad_y, pad_x, 0))

    x = x.astype(jnp.bfloat16) / 255.0
    x = jax.image.resize(
        x, (x.shape[0], image_size, image_size, c), method="cubic"
    ).astype(jnp.float32)
    x = (x - CLIP_MEAN) / CLIP_STD
    return x.reshape((*lead, image_size, image_size, c))


def audio_projection_input(audio: jax.Array, audio_dim: int) -> jax.Array:
    """Fit raw embeddings to the configured width on device (zero pad/trim)."""
    b = audio.shape[0]
    out = jnp.zeros((b, audio_dim), jnp.float32)
    n = min(audio.shape[-1], audio_dim)
    return out.at[:, :n].set(audio[:, :n].astype(jnp.float32))


def downsample_pointcloud(
    points: jax.Array,  # (P, 6) xyzrgb
    valid: jax.Array,  # (P,)
    grid_size: float,
    capacity: int,
    key: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """On-device voxel-grid downsample to a static capacity.

    Points sort by voxel code; the first point of each voxel survives (the
    reference's grid sampling keeps one point per cell). Output is padded /
    truncated to ``capacity``.
    """
    from mmor_tpu.ops.serialization import encode

    xyz = points[:, :3]
    big = jnp.float32(1e9)
    mins = jnp.min(jnp.where(valid[:, None], xyz, big), axis=0)
    grid = jnp.clip(jnp.floor((xyz - mins) / grid_size).astype(jnp.int32), 0, 1023)
    code = jnp.where(valid, encode(grid, "z"), jnp.int32(2**30))
    order = jnp.argsort(code, stable=True)
    code_s = code[order]
    pts_s = points[order]
    valid_s = valid[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), code_s[1:] != code_s[:-1]]
    ) & valid_s
    # stable-partition survivors to the front
    rank = jnp.argsort(~first, stable=True)
    pts_kept = pts_s[rank][:capacity]
    kept_valid = first[rank][:capacity]
    return jnp.where(kept_valid[:, None], pts_kept, 0.0), kept_valid
