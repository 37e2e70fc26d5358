"""Checkpoint-conversion CLI: tiny HF models saved locally -> converted tree
-> forward parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mmor_tpu.cli import convert_checkpoint
from mmor_tpu.config import ClipVitConfig, LlamaConfig, MM2SGConfig, PoolerConfig, PTv3Config, SegmaskEncoderConfig
from mmor_tpu.models.llama import LlamaModel
from mmor_tpu.utils.checkpoint import restore_pytree


def test_convert_cli_roundtrip(tmp_path):
    # build + save tiny HF models locally (no network)
    torch.manual_seed(0)
    hf_llama = transformers.LlamaForCausalLM(transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, attn_implementation="eager",
    )).eval()
    hf_llama.save_pretrained(tmp_path / "llama")
    hf_clip = transformers.CLIPVisionModel(transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
    )).eval()
    hf_clip.save_pretrained(tmp_path / "clip")

    cfg = MM2SGConfig(
        llama=LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                          n_kv_heads=4, ffn_dim=128, max_seq_len=64,
                          dtype=jnp.float32, param_dtype=jnp.float32),
        vision=ClipVitConfig(image_size=28, patch_size=14, dim=32, n_layers=3,
                             n_heads=2, mlp_dim=64, dtype=jnp.float32,
                             param_dtype=jnp.float32),
        pooler=PoolerConfig.tiny(tokens_per_view=4, out_tokens=4),
        segmask=SegmaskEncoderConfig.tiny(),
        ptv3=PTv3Config.tiny(),
    )
    args = type("A", (), dict(
        llama=str(tmp_path / "llama"), clip=str(tmp_path / "clip"),
        pooler=None, preset="custom", output=str(tmp_path / "out"),
        quantize=False,
    ))
    params, out_cfg = convert_checkpoint.convert(args, cfg=cfg)

    restored = restore_pytree(tmp_path / "out", params)

    # forward parity on the converted + restored LM weights
    lm = LlamaModel(out_cfg.llama)
    assert out_cfg.llama.norm_eps == hf_llama.config.rms_norm_eps
    lm_params = {"params": restored["params"]["language_model"]}
    ids = np.random.default_rng(0).integers(3, 128, (1, 10))
    with torch.no_grad():
        want = hf_llama(torch.from_numpy(ids)).logits.numpy()
    got, _ = lm.apply(lm_params, input_ids=jnp.asarray(ids),
                      attention_mask=jnp.ones((1, 10), jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


def test_convert_dry_run_manifest(tmp_path):
    """--dry-run validates key-mapping against a state-dict manifest with no
    weights and catches shape corruption (VERDICT r4 #8)."""
    import json

    torch.manual_seed(0)
    hf_llama_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, attn_implementation="eager",
    )
    hf_llama = transformers.LlamaForCausalLM(hf_llama_cfg).eval()
    hf_clip = transformers.CLIPVisionModel(transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
    )).eval()

    manifest = {
        "llama": {k: list(v.shape) for k, v in hf_llama.state_dict().items()},
        "clip": {k: list(v.shape) for k, v in hf_clip.state_dict().items()},
    }
    path = tmp_path / "manifest.json"
    path.write_text(json.dumps(manifest))

    cfg = MM2SGConfig(
        llama=LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                          n_kv_heads=4, ffn_dim=128, max_seq_len=64,
                          dtype=jnp.float32, param_dtype=jnp.float32),
        vision=ClipVitConfig(image_size=28, patch_size=14, dim=32, n_layers=3,
                             n_heads=2, mlp_dim=64, dtype=jnp.float32,
                             param_dtype=jnp.float32),
        pooler=PoolerConfig.tiny(tokens_per_view=4, out_tokens=4),
        segmask=SegmaskEncoderConfig.tiny(),
        ptv3=PTv3Config.tiny(),
    )
    args = type("A", (), dict(manifest=str(path), preset="custom"))
    problems = convert_checkpoint.dry_run(args, cfg=cfg)
    assert problems == []

    # corrupt a shape (both layers, so the stack survives to the named
    # comparison): the mismatch must surface, named
    bad = dict(manifest)
    bad["llama"] = dict(manifest["llama"])
    bad["llama"]["model.layers.0.mlp.down_proj.weight"] = [64, 999]
    bad["llama"]["model.layers.1.mlp.down_proj.weight"] = [64, 999]
    path.write_text(json.dumps(bad))
    problems = convert_checkpoint.dry_run(args, cfg=cfg)
    assert any("down_proj" in p for p in problems)

    # drop a key: the converter raise must be reported, not crash
    bad["llama"] = dict(manifest["llama"])
    del bad["llama"]["model.norm.weight"]
    path.write_text(json.dumps(bad))
    problems = convert_checkpoint.dry_run(args, cfg=cfg)
    assert any("llama" in p for p in problems)
