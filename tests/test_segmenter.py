"""Panoptic segmenter: backbone strides, pixel decoder, masked decoder shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.models.resnet import ResNet50
from mmor_tpu.models.segmenter import SegmenterConfig, VideoSegmenter, normalize_pixels


def test_resnet_strides_and_channels():
    model = ResNet50()
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["res2"].shape == (1, 16, 24, 256)
    assert out["res3"].shape == (1, 8, 12, 512)
    assert out["res4"].shape == (1, 4, 6, 1024)
    assert out["res5"].shape == (1, 2, 3, 2048)


def test_normalize_pixels():
    x = jnp.full((2, 4, 4, 3), 123.675)
    out = normalize_pixels(x)
    np.testing.assert_allclose(out[..., 0], 0.0, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_segmenter():
    cfg = SegmenterConfig.tiny()
    model = VideoSegmenter(cfg)
    t, h, w = 2, 64, 64
    images = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, 3))
    params = model.init(jax.random.PRNGKey(1), images, num_frames=t)
    return cfg, model, params, images


def test_video_segmenter_shapes(tiny_segmenter):
    cfg, model, params, images = tiny_segmenter
    t = 2
    out = model.apply(params, images, num_frames=t)
    q = cfg.decoder.num_queries
    k = cfg.decoder.num_classes
    assert out["pred_logits"].shape == (1, q, k + 1)
    assert out["pred_masks"].shape == (1, q, t, 16, 16)
    assert out["pred_embds"].shape == (1, q, cfg.decoder.reid_dim)
    assert len(out["aux_outputs"]) == cfg.decoder.dec_layers
    assert bool(jnp.all(jnp.isfinite(out["pred_masks"])))


def test_video_segmenter_deep_supervision_differs(tiny_segmenter):
    cfg, model, params, images = tiny_segmenter
    out = model.apply(params, images, num_frames=2)
    first = out["aux_outputs"][0]["pred_masks"]
    final = out["pred_masks"]
    assert float(jnp.max(jnp.abs(first - final))) > 1e-6
