"""non_lora_trainables.bin conversion: key mapping, PTv3 policy, numerics.

The reference saves the tuned non-LoRA modules as ``model.image_pooler.*`` /
``model.mm_projector.*`` / ``model.vision_tower.vision_tower.*``
(`train.py:1284-1297`, reloaded at `model/builder.py:150-177`). These tests
build a synthetic blob with those exact key names from locally-initialized
torch modules and check our converter end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.config import ClipVitConfig, PoolerConfig
from mmor_tpu.utils.convert_hf import (
    PTv3ConversionError,
    convert_clip_vision,
    convert_non_lora_trainables,
    merge_clip_partial,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_pooler_cfg():
    return PoolerConfig(
        hidden=32, n_layers=2, n_heads=2, mlp_dim=64, max_views=3,
        tokens_per_view=4, out_tokens=4, pc_feature_dim=16, audio_dim=16,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )


def _tiny_blob(with_ptv3=True):
    """Synthetic non_lora_trainables with reference key names."""
    torch.manual_seed(0)
    bert_cfg = transformers.BertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=12, vocab_size=1,
    )
    bert = transformers.BertModel(bert_cfg).eval()
    sd = {}
    for k, v in bert.state_dict().items():
        sd[f"model.image_pooler.bert.{k}"] = v.numpy()
    g = np.random.default_rng(0)
    sd["model.image_pooler.project_audio.weight"] = (
        g.standard_normal((32, 16)).astype(np.float32))
    sd["model.image_pooler.project_audio.bias"] = (
        g.standard_normal((32,)).astype(np.float32))
    sd["model.image_pooler.point_transformer.project_pc.weight"] = (
        g.standard_normal((32, 16)).astype(np.float32))
    sd["model.image_pooler.point_transformer.project_pc.bias"] = (
        g.standard_normal((32,)).astype(np.float32))
    if with_ptv3:
        # trained spconv-stem tensors (structurally unmappable)
        sd["model.image_pooler.point_transformer.embedding.stem.conv.weight"] = (
            g.standard_normal((5, 5, 5, 6, 32)).astype(np.float32))
        sd["model.image_pooler.point_transformer.enc0.block0.cpe.0.weight"] = (
            g.standard_normal((3, 3, 3, 32, 32)).astype(np.float32))
    # segmask encoder (embedding + conv1..conv5, reference widths)
    sd["model.image_pooler.segmasks_encoder.embedding.weight"] = (
        g.standard_normal((30, 8)).astype(np.float32))
    widths = [(8, 64), (64, 128), (128, 256), (256, 512), (512, 1024)]
    for i, (cin, cout) in enumerate(widths):
        sd[f"model.image_pooler.segmasks_encoder.conv{i + 1}.weight"] = (
            g.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.05)
        sd[f"model.image_pooler.segmasks_encoder.conv{i + 1}.bias"] = (
            g.standard_normal((cout,)).astype(np.float32) * 0.05)
    # mlp2x_gelu projector
    sd["model.mm_projector.0.weight"] = g.standard_normal((64, 32)).astype(np.float32)
    sd["model.mm_projector.0.bias"] = g.standard_normal((64,)).astype(np.float32)
    sd["model.mm_projector.2.weight"] = g.standard_normal((64, 64)).astype(np.float32)
    sd["model.mm_projector.2.bias"] = g.standard_normal((64,)).astype(np.float32)
    return sd


def test_ptv3_weights_raise_without_optin():
    with pytest.raises(PTv3ConversionError, match="re-finetune|ptv3"):
        convert_non_lora_trainables(_tiny_blob(), _tiny_pooler_cfg())


def test_converts_everything_else_with_ptv3_reinit():
    sd = _tiny_blob()
    out = convert_non_lora_trainables(sd, _tiny_pooler_cfg(),
                                      allow_ptv3_reinit=True)
    assert len(out["skipped_ptv3"]) == 2
    up = out["image_pooler"]
    # bert layers + projections all present
    assert "layer_0" in up and "layer_1" in up and "embed_ln" in up
    np.testing.assert_array_equal(
        up["project_audio"]["kernel"],
        sd["model.image_pooler.project_audio.weight"].T)
    np.testing.assert_array_equal(
        up["project_pc"]["kernel"],
        sd["model.image_pooler.point_transformer.project_pc.weight"].T)
    # projector transposed into flax layout
    np.testing.assert_array_equal(
        out["mm_projector"]["fc1"]["kernel"],
        sd["model.mm_projector.0.weight"].T)


def test_peft_prefixed_keys_accepted():
    sd = {f"base_model.model.{k}": v for k, v in _tiny_blob(False).items()}
    out = convert_non_lora_trainables(sd, _tiny_pooler_cfg(),
                                      allow_ptv3_reinit=False)
    assert "mm_projector" in out and "image_pooler" in out


def test_segmask_encoder_conversion_matches_torch():
    """Converted segmask CNN == the reference torch forward."""
    sd = _tiny_blob(False)
    out = convert_non_lora_trainables(sd, _tiny_pooler_cfg(),
                                      allow_ptv3_reinit=True)
    seg_params = {"params": out["segmask_encoder"]}

    from mmor_tpu.models.pooler import SegmaskEncoder

    ids = np.random.default_rng(2).integers(0, 30, (2, 32, 32))
    ours = SegmaskEncoder(dtype=jnp.float32, param_dtype=jnp.float32).apply(
        seg_params, jnp.asarray(ids))

    # reference forward (segmentation_map_feature_extractor.py:54-75)
    p = "model.image_pooler.segmasks_encoder."
    emb = torch.nn.Embedding(30, 8)
    emb.weight.data = torch.from_numpy(sd[p + "embedding.weight"])
    x = emb(torch.from_numpy(ids)).permute(0, 3, 1, 2)
    for i in range(1, 6):
        conv = torch.nn.Conv2d(x.shape[1],
                               sd[p + f"conv{i}.weight"].shape[0], 3, 2, 1)
        conv.weight.data = torch.from_numpy(sd[p + f"conv{i}.weight"])
        conv.bias.data = torch.from_numpy(sd[p + f"conv{i}.bias"])
        x = torch.relu(conv(x))
    want = x.mean(dim=(2, 3)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), want, atol=1e-4)


def test_partial_clip_merge_numerics():
    """Tuned-layer merge == rebuilding the tower from the tuned HF model."""
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    base = transformers.CLIPVisionModel(hf_cfg).eval()
    torch.manual_seed(7)
    tuned = transformers.CLIPVisionModel(hf_cfg).eval()

    cfg = ClipVitConfig(
        image_size=28, patch_size=14, dim=32, n_layers=3, n_heads=2,
        mlp_dim=64, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    base_sd = {k: v.numpy() for k, v in base.state_dict().items()}
    params = convert_clip_vision(base_sd, cfg)

    # blob carries only the "unfrozen" layers 1 and 2 of the tuned model
    tuned_sd = {k: v.numpy() for k, v in tuned.state_dict().items()}
    blob = {f"model.vision_tower.vision_tower.{k}": v
            for k, v in tuned_sd.items()
            if ".encoder.layers.1." in k or ".encoder.layers.2." in k}
    out = convert_non_lora_trainables(blob, _tiny_pooler_cfg(), cfg)
    merged = merge_clip_partial(params, out["vision_tower_partial"], cfg)

    # expectation: base weights with tuned layers 1-2 spliced in
    mixed_sd = dict(base_sd)
    for k, v in tuned_sd.items():
        if ".encoder.layers.1." in k or ".encoder.layers.2." in k:
            mixed_sd[k] = v
    want = convert_clip_vision(mixed_sd, cfg)

    flat_m = jax.tree_util.tree_leaves_with_path(merged)
    flat_w = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(want)}
    for path, v in flat_m:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_w[jax.tree_util.keystr(path)]),
            atol=1e-6, err_msg=jax.tree_util.keystr(path))
