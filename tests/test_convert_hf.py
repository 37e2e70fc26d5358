"""Checkpoint conversion numerics: our models vs locally-built HF models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.config import ClipVitConfig, LlamaConfig
from mmor_tpu.models.clip_vit import ClipVisionTower
from mmor_tpu.models.llama import LlamaModel
from mmor_tpu.utils.convert_hf import convert_clip_vision, convert_llama

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_llama_conversion_matches_hf_logits():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    if "lm_head.weight" not in sd:  # tied embeddings
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]

    cfg = LlamaConfig(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
        ffn_dim=128, max_seq_len=64, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = {"params": convert_llama(sd, cfg)}
    model = LlamaModel(cfg)

    ids = np.random.default_rng(0).integers(3, 128, (2, 12))
    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(ids)).logits.numpy()
    ours, _ = model.apply(
        params, input_ids=jnp.asarray(ids), attention_mask=jnp.ones_like(jnp.asarray(ids))
    )
    np.testing.assert_allclose(np.asarray(ours), hf_logits, atol=2e-4)


def test_clip_conversion_matches_hf_hidden_states():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = ClipVitConfig(
        image_size=28, patch_size=14, dim=32, n_layers=3, n_heads=2,
        mlp_dim=64, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = {"params": convert_clip_vision(sd, cfg)}
    model = ClipVisionTower(cfg)

    pixels = np.random.default_rng(1).standard_normal((2, 28, 28, 3), dtype=np.float32)
    with torch.no_grad():
        hf_out = hf(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
            output_hidden_states=True,
        )
    # feature layer -2, patch tokens only (clip_encoder.py:40-51)
    want = hf_out.hidden_states[-2][:, 1:].numpy()
    ours = model.apply(params, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(ours), want, atol=2e-4)


def test_clip_global_forward_matches_hf_pooler_output():
    """mode='global' == HF CLIPVisionModel pooler_output (the reference's
    global_forward pooler variant, clip_encoder.py:53-65)."""
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = ClipVitConfig(
        image_size=28, patch_size=14, dim=32, n_layers=3, n_heads=2,
        mlp_dim=64, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = {"params": convert_clip_vision(sd, cfg)}
    model = ClipVisionTower(cfg)

    pixels = np.random.default_rng(1).standard_normal((2, 28, 28, 3), dtype=np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(pixels.transpose(0, 3, 1, 2))).pooler_output.numpy()
    ours = model.apply(params, jnp.asarray(pixels), mode="global")
    assert ours.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(ours), want, atol=2e-4)
