"""Swin backbone: strides, channels, shifted windows, padding robustness."""

import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.models.swin import (
    SwinBackbone,
    SwinConfig,
    _relative_position_index,
    _shift_attn_mask,
    _window_partition,
    _window_reverse,
)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    windows = _window_partition(x, 4)
    assert windows.shape == (2 * 4, 16, 3)
    back = _window_reverse(windows, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_bounds():
    idx = _relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < (2 * 7 - 1) ** 2
    assert (idx == idx.max() - idx[::-1, ::-1]).all()  # antisymmetric layout


def test_shift_mask_blocks_cross_region():
    mask = _shift_attn_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    assert (mask == 0).any() and (mask == -100.0).any()
    # diagonal always allowed
    for wdx in range(4):
        assert (np.diag(mask[wdx]) == 0).all()


def test_swin_backbone_shapes():
    cfg = SwinConfig.tiny_test()
    model = SwinBackbone(cfg)
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["res2"].shape == (1, 16, 24, 16)
    assert out["res3"].shape == (1, 8, 12, 32)


def test_swin_backbone_nondivisible_input():
    """Resolutions not divisible by the window pad internally."""
    cfg = SwinConfig.tiny_test()
    model = SwinBackbone(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 72, 56, 3))  # 18x14 tokens
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["res2"].shape == (1, 18, 14, 16)
    assert bool(jnp.all(jnp.isfinite(out["res3"])))


def test_segmenter_with_swin_backbone():
    import dataclasses

    from mmor_tpu.models.mask2former_decoder import MaskDecoderConfig
    from mmor_tpu.models.segmenter import SegmenterConfig, VideoSegmenter
    from mmor_tpu.models.swin import SwinConfig

    # use the full swin_t wiring but at reduced dims via a tiny decoder
    cfg = SegmenterConfig(
        decoder=MaskDecoderConfig.tiny(),
        backbone="swin_t", conv_dim=32, mask_dim=32, pixel_decoder_layers=1,
    )
    model = VideoSegmenter(cfg)
    images = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), images, num_frames=1)
    out = model.apply(params, images, num_frames=1)
    assert out["pred_masks"].shape[-2:] == (16, 16)
    assert bool(jnp.all(jnp.isfinite(out["pred_logits"])))
