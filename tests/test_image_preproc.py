"""On-device preprocessing vs the host (PIL) reference path."""

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from mmor_tpu.data.preprocessing import clip_preprocess
from mmor_tpu.ops.image_preproc import (
    audio_projection_input,
    downsample_pointcloud,
    preprocess_views,
)


def test_device_preprocess_close_to_pil():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (48, 64, 3), np.uint8)
    host = clip_preprocess(Image.fromarray(raw), image_size=28)
    dev = np.asarray(preprocess_views(jnp.asarray(raw), image_size=28))
    # PIL and jax bicubic kernels differ slightly; distributions must agree
    assert dev.shape == host.shape
    assert np.mean(np.abs(dev - host)) < 0.15
    assert abs(dev.mean() - host.mean()) < 0.03


def test_device_preprocess_batch_dims():
    raw = jnp.zeros((2, 3, 24, 32, 3), jnp.uint8)
    out = preprocess_views(raw, image_size=14)
    assert out.shape == (2, 3, 14, 14, 3)
    # all-black input -> the normalized black value everywhere in the content
    # region; background padding uses the CLIP mean (normalizes to ~0)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_square_input_no_padding():
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 255, (32, 32, 3), np.uint8)
    host = clip_preprocess(Image.fromarray(raw), image_size=32)
    dev = np.asarray(preprocess_views(jnp.asarray(raw), image_size=32))
    np.testing.assert_allclose(dev, host, atol=1e-2)  # no resize, no pad


def test_audio_projection_input():
    audio = jnp.ones((2, 512))
    out = audio_projection_input(audio, 16)
    assert out.shape == (2, 16)
    out2 = audio_projection_input(jnp.ones((2, 8)), 16)
    assert float(out2[0, :8].sum()) == 8.0 and float(out2[0, 8:].sum()) == 0.0


def test_downsample_pointcloud_dedupes_voxels():
    # 10 points in the same voxel + 5 spread out
    pts = jnp.zeros((16, 6))
    pts = pts.at[:10, :3].set(0.001)
    for i in range(5):
        pts = pts.at[10 + i, :3].set(0.5 * (i + 1))
    valid = jnp.ones((16,), bool).at[15].set(False)
    out, kept = downsample_pointcloud(pts, valid, grid_size=0.05, capacity=8)
    assert out.shape == (8, 6)
    assert int(kept.sum()) == 6  # 1 voxel for the cluster + 5 singles


def test_mm2sg_accepts_raw_uint8_frames():
    from mmor_tpu.config import MM2SGConfig
    from mmor_tpu.models.mm2sg import MM2SG
    from mmor_tpu.sg.prompts import IMAGE_TOKEN_INDEX

    cfg = MM2SGConfig.tiny()
    model = MM2SG(cfg)
    b, v = 1, cfg.pooler.max_views
    ids = jnp.full((b, 6), 3, jnp.int32).at[0, 1].set(IMAGE_TOKEN_INDEX)
    mask = jnp.ones((b, 6), jnp.int32)
    raw = jnp.zeros((b, v, 40, 56, 3), jnp.uint8)  # non-square raw frames
    view_mask = jnp.ones((b, v), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, raw, view_mask)
    logits, _, _ = model.apply(params, ids, mask, raw, view_mask)
    assert bool(jnp.all(jnp.isfinite(logits)))
