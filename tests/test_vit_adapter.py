"""ViT-Adapter backbone: shapes, interactions, segmenter integration."""

import jax
import jax.numpy as jnp

from mmor_tpu.models.vit_adapter import VitAdapterBackbone, VitAdapterConfig


def test_vit_adapter_shapes():
    cfg = VitAdapterConfig.tiny_test()
    model = VitAdapterBackbone(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out["res2"].shape == (1, 16, 16, cfg.vit_dim)
    assert out["res3"].shape == (1, 8, 8, cfg.vit_dim)
    assert out["res4"].shape == (1, 4, 4, cfg.vit_dim)
    assert out["res5"].shape == (1, 2, 2, cfg.vit_dim)
    assert bool(jnp.all(jnp.isfinite(out["res4"])))


def test_vit_tokens_influence_pyramid():
    """Zeroing the image changes the extractor-refined pyramid (the ViT branch
    feeds the outputs, not just the conv stem)."""
    cfg = VitAdapterConfig.tiny_test()
    model = VitAdapterBackbone(cfg)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x1)
    out1 = model.apply(params, x1)
    out2 = model.apply(params, x1 * 0.5)
    assert float(jnp.max(jnp.abs(out1["res4"] - out2["res4"]))) > 1e-6
