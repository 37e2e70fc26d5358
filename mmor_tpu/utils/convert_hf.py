"""HF checkpoint conversion: Llama / CLIP-ViT / BERT-pooler -> mmor_tpu params.

The reference builds MM2SG from ``liuhaotian/llava-v1.5-7b`` (Llama-7B +
CLIP ViT-L/14-336 + BERT pooler, `model/builder.py:26-184`). These converters
map HF ``state_dict``-style {name: np.ndarray} onto our flax param trees so
published weights load directly:

- linear weights transpose (HF (out, in) -> flax kernel (in, out));
- scanned decoder blocks stack per-layer tensors on a leading layer axis;
- CLIP keeps only the first ``n_layers - 1`` encoder layers (feature layer
  -2 — the reference never runs the last layer);
- attention q/k/v reshape into flax ``MultiHeadDotProductAttention`` layout
  (in, heads, head_dim).

Parity is tested against locally-initialized HF models (tests/test_convert_hf.py).
"""

from __future__ import annotations

import numpy as np

from mmor_tpu.config import ClipVitConfig, LlamaConfig, PoolerConfig


def _t(w: np.ndarray) -> np.ndarray:
    return np.asarray(w).T


def llama_config_from_hf(hf_config, **overrides) -> LlamaConfig:
    """Derive our LlamaConfig from an HF LlamaConfig (dims, eps, rope theta) —
    silent default mismatches (e.g. rms_norm_eps 1e-6 vs 1e-5) shift logits."""
    base = dict(
        vocab_size=hf_config.vocab_size,
        dim=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=getattr(hf_config, "num_key_value_heads",
                           hf_config.num_attention_heads),
        ffn_dim=hf_config.intermediate_size,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        max_seq_len=hf_config.max_position_embeddings,
        norm_eps=hf_config.rms_norm_eps,
    )
    base.update(overrides)
    return LlamaConfig(**base)


def convert_llama(sd: dict, cfg: LlamaConfig) -> dict:
    """HF LlamaForCausalLM state dict -> LlamaModel params['params']."""
    get = lambda k: np.asarray(sd[k])
    stack = lambda fmt: np.stack([get(fmt.format(i)) for i in range(cfg.n_layers)])

    blocks = {
        "q_proj": {"kernel": stack("model.layers.{}.self_attn.q_proj.weight").transpose(0, 2, 1)},
        "k_proj": {"kernel": stack("model.layers.{}.self_attn.k_proj.weight").transpose(0, 2, 1)},
        "v_proj": {"kernel": stack("model.layers.{}.self_attn.v_proj.weight").transpose(0, 2, 1)},
        "o_proj": {"kernel": stack("model.layers.{}.self_attn.o_proj.weight").transpose(0, 2, 1)},
        "gate_proj": {"kernel": stack("model.layers.{}.mlp.gate_proj.weight").transpose(0, 2, 1)},
        "up_proj": {"kernel": stack("model.layers.{}.mlp.up_proj.weight").transpose(0, 2, 1)},
        "down_proj": {"kernel": stack("model.layers.{}.mlp.down_proj.weight").transpose(0, 2, 1)},
        "attn_norm": {"scale": stack("model.layers.{}.input_layernorm.weight")},
        "mlp_norm": {"scale": stack("model.layers.{}.post_attention_layernorm.weight")},
    }
    return {
        "embed_tokens": {"embedding": get("model.embed_tokens.weight")},
        "blocks": blocks,
        "final_norm": {"scale": get("model.norm.weight")},
        "lm_head": {"kernel": _t(get("lm_head.weight"))},
    }


def _mha_params(sd: dict, prefix: str, n_heads: int, dim: int,
                q="q_proj", k="k_proj", v="v_proj", o="out_proj") -> dict:
    """HF attention projections -> flax MultiHeadDotProductAttention tree."""
    head_dim = dim // n_heads

    def qkv(name):
        w = _t(np.asarray(sd[f"{prefix}.{name}.weight"]))  # (in, out)
        b = np.asarray(sd[f"{prefix}.{name}.bias"])
        return {
            "kernel": w.reshape(dim, n_heads, head_dim),
            "bias": b.reshape(n_heads, head_dim),
        }

    out_w = _t(np.asarray(sd[f"{prefix}.{o}.weight"]))  # (in, out)
    return {
        "query": qkv(q),
        "key": qkv(k),
        "value": qkv(v),
        "out": {
            "kernel": out_w.reshape(n_heads, head_dim, dim),
            "bias": np.asarray(sd[f"{prefix}.{o}.bias"]),
        },
    }


def _clip_layer(sd: dict, p: str, cfg: ClipVitConfig) -> dict:
    """One HF CLIP encoder layer -> our ClipEncoderLayer param tree."""
    get = lambda k: np.asarray(sd[k])
    return {
        "ln1": {"scale": get(f"{p}.layer_norm1.weight"),
                "bias": get(f"{p}.layer_norm1.bias")},
        "ln2": {"scale": get(f"{p}.layer_norm2.weight"),
                "bias": get(f"{p}.layer_norm2.bias")},
        "attn": _mha_params(sd, f"{p}.self_attn", cfg.n_heads, cfg.dim),
        "fc1": {"kernel": _t(get(f"{p}.mlp.fc1.weight")),
                "bias": get(f"{p}.mlp.fc1.bias")},
        "fc2": {"kernel": _t(get(f"{p}.mlp.fc2.weight")),
                "bias": get(f"{p}.mlp.fc2.bias")},
    }


def convert_clip_vision(sd: dict, cfg: ClipVitConfig) -> dict:
    """HF CLIPVisionModel state dict -> ClipVisionTower params['params'].

    Accepts names with or without the ``vision_model.`` prefix. Only the
    first ``n_layers + feature_layer_offset + 1`` layers convert.
    """
    if not any(k.startswith("vision_model.") for k in sd):
        sd = {f"vision_model.{k}": v for k, v in sd.items()}
    get = lambda k: np.asarray(sd[k])
    n_run = cfg.n_layers + cfg.feature_layer_offset + 1

    blocks: dict = {}
    per_layer: dict[str, list] = {}
    for i in range(n_run):
        layer = _clip_layer(sd, f"vision_model.encoder.layers.{i}", cfg)
        flat = _flatten(layer)
        for key, val in flat.items():
            per_layer.setdefault(key, []).append(val)
    blocks = _unflatten({k: np.stack(v) for k, v in per_layer.items()})

    patch = get("vision_model.embeddings.patch_embedding.weight")  # (out, 3, P, P)
    out = {
        "patch_embed": {"kernel": patch.transpose(2, 3, 1, 0)},
        "cls_token": get("vision_model.embeddings.class_embedding").reshape(1, 1, -1),
        "pos_embed": get("vision_model.embeddings.position_embedding.weight")[None],
        "pre_ln": {"scale": get("vision_model.pre_layrnorm.weight"),
                   "bias": get("vision_model.pre_layrnorm.bias")},
        "blocks": blocks,
    }
    # tail layers + post-layernorm for the global_forward pooler variant
    # (clip_encoder.py:53-65); unused params are ignored by the patch path
    for i in range(n_run, cfg.n_layers):
        out[f"tail_block_{i}"] = _clip_layer(
            sd, f"vision_model.encoder.layers.{i}", cfg)
    if "vision_model.post_layernorm.weight" in sd:
        out["post_ln"] = {"scale": get("vision_model.post_layernorm.weight"),
                          "bias": get("vision_model.post_layernorm.bias")}
    return out


def convert_bert_pooler(sd: dict, cfg: PoolerConfig, prefix: str = "") -> dict:
    """HF BertModel state dict -> ImagePooler BERT-part params (the pc/audio
    projection and segmask tokens convert separately from the LLaVA
    ``image_pooler`` blob: project_pc/project_audio are plain linears)."""
    get = lambda k: np.asarray(sd[prefix + k])
    out = {
        "pos_embed": get("embeddings.position_embeddings.weight")[None][:, : cfg.max_positions],
        "token_type_embed": get("embeddings.token_type_embeddings.weight")[:1][None],
        "embed_ln": {"scale": get("embeddings.LayerNorm.weight"),
                     "bias": get("embeddings.LayerNorm.bias")},
    }
    for i in range(cfg.n_layers):
        p = f"encoder.layer.{i}"
        out[f"layer_{i}"] = {
            "attn": _mha_params(
                sd, f"{prefix}{p}.attention", cfg.n_heads, cfg.hidden,
                q="self.query", k="self.key", v="self.value", o="output.dense",
            ),
            "ln1": {"scale": get(f"{p}.attention.output.LayerNorm.weight"),
                    "bias": get(f"{p}.attention.output.LayerNorm.bias")},
            "fc1": {"kernel": _t(get(f"{p}.intermediate.dense.weight")),
                    "bias": get(f"{p}.intermediate.dense.bias")},
            "fc2": {"kernel": _t(get(f"{p}.output.dense.weight")),
                    "bias": get(f"{p}.output.dense.bias")},
            "ln2": {"scale": get(f"{p}.output.LayerNorm.weight"),
                    "bias": get(f"{p}.output.LayerNorm.bias")},
        }
    return out


def _flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


class PTv3ConversionError(RuntimeError):
    """Raised when a non_lora_trainables blob carries trained PTv3 weights.

    The reference's PTv3 uses a spconv sparse-conv stem and xCPE sparse convs
    (`pointtransformerv3.py:141-177`); the TPU rebuild replaces those with a
    linear embedding + serialized depthwise curve conv (models/ptv3.py), so
    the trained stem/xCPE tensors have NO structural counterpart here. Only
    ``point_transformer.project_pc`` maps. Pass ``allow_ptv3_reinit=True``
    (CLI: ``--ptv3-reinit``) to convert everything else and leave the point
    encoder at fresh initialization — it then needs re-finetuning (the
    reference's own curriculum path, `train.py:1053-1085`, covers this:
    init from the converted checkpoint and train with the vision stack
    frozen until the PTv3 branch recovers).
    """


def convert_non_lora_trainables(
    sd: dict,
    pooler_cfg: PoolerConfig,
    clip_cfg: ClipVitConfig | None = None,
    *,
    allow_ptv3_reinit: bool = False,
):
    """Reference ``non_lora_trainables.bin`` -> per-module param updates.

    The blob (saved by `train.py:1284-1297`, reloaded by
    `model/builder.py:150-177`) holds the tuned non-LoRA modules keyed as
    ``model.image_pooler.*`` (BERT + project_audio + point_transformer incl.
    project_pc + segmasks_encoder), ``model.mm_projector.*`` (mlp2x_gelu) and
    ``model.vision_tower.vision_tower.*`` (the unfrozen CLIP layers,
    partial). Returns a dict with keys among {"image_pooler",
    "mm_projector", "segmask_encoder", "vision_tower_partial",
    "skipped_ptv3"}:

    - ``image_pooler``: update() onto our ImagePooler params (BERT layers,
      project_pc, project_audio);
    - ``mm_projector`` / ``segmask_encoder``: full param trees;
    - ``vision_tower_partial``: {layer_index: ClipEncoderLayer tree} plus
      optional embeddings/pre_ln entries — merge with
      ``merge_clip_partial`` (the blob only carries the unfrozen layers);
    - ``skipped_ptv3``: the unmappable trained-PTv3 key names (only when
      ``allow_ptv3_reinit``; otherwise PTv3ConversionError raises).
    """
    # PEFT-wrapped saves prefix module paths with base_model.model.
    sd = {k[len("base_model.model."):] if k.startswith("base_model.model.")
          else k: np.asarray(v) for k, v in sd.items()}
    out: dict = {}

    pooler_sd = {k[len("model.image_pooler."):]: v for k, v in sd.items()
                 if k.startswith("model.image_pooler.")}
    if pooler_sd:
        # trained PTv3 weights cannot map onto the TPU-native PTv3 (see
        # PTv3ConversionError) — everything except project_pc
        ptv3_keys = sorted(
            k for k in pooler_sd
            if k.startswith("point_transformer.")
            and not k.startswith("point_transformer.project_pc."))
        if ptv3_keys and not allow_ptv3_reinit:
            raise PTv3ConversionError(
                "non_lora_trainables carries trained PointTransformerV3 "
                f"weights ({len(ptv3_keys)} tensors, e.g. {ptv3_keys[0]!r}) "
                "that have no structural counterpart in the TPU-native PTv3 "
                "(spconv stem/xCPE were redesigned — models/ptv3.py). "
                "Re-run with allow_ptv3_reinit=True / --ptv3-reinit to "
                "convert the rest and re-finetune the point encoder."
            )
        updates: dict = {}
        if any(k.startswith("bert.") for k in pooler_sd):
            updates.update(convert_bert_pooler(pooler_sd, pooler_cfg,
                                               prefix="bert."))
        if "project_audio.weight" in pooler_sd:
            updates["project_audio"] = {
                "kernel": _t(pooler_sd["project_audio.weight"]),
                "bias": pooler_sd["project_audio.bias"],
            }
        if "point_transformer.project_pc.weight" in pooler_sd:
            updates["project_pc"] = {
                "kernel": _t(pooler_sd["point_transformer.project_pc.weight"]),
                "bias": pooler_sd["point_transformer.project_pc.bias"],
            }
        out["image_pooler"] = updates
        if ptv3_keys:
            out["skipped_ptv3"] = ptv3_keys

        seg_sd = {k[len("segmasks_encoder."):]: v for k, v in pooler_sd.items()
                  if k.startswith("segmasks_encoder.")}
        if seg_sd:
            seg = {"class_embed": {"embedding": seg_sd["embedding.weight"]}}
            for i in range(1, 6):
                # torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out)
                seg[f"conv{i}"] = {
                    "kernel": seg_sd[f"conv{i}.weight"].transpose(2, 3, 1, 0),
                    "bias": seg_sd[f"conv{i}.bias"],
                }
            out["segmask_encoder"] = seg

    proj_sd = {k[len("model.mm_projector."):]: v for k, v in sd.items()
               if k.startswith("model.mm_projector.")}
    if proj_sd:
        out["mm_projector"] = {
            "fc1": {"kernel": _t(proj_sd["0.weight"]), "bias": proj_sd["0.bias"]},
            "fc2": {"kernel": _t(proj_sd["2.weight"]), "bias": proj_sd["2.bias"]},
        }

    vt_sd = {k[len("model.vision_tower.vision_tower."):]: v
             for k, v in sd.items()
             if k.startswith("model.vision_tower.vision_tower.")}
    if vt_sd and clip_cfg is not None:
        partial: dict = {}
        import re

        layers = sorted({
            int(m.group(1)) for k in vt_sd
            if (m := re.match(r"vision_model\.encoder\.layers\.(\d+)\.", k))
        })
        for i in layers:
            partial[i] = _clip_layer(vt_sd, f"vision_model.encoder.layers.{i}",
                                     clip_cfg)
        out["vision_tower_partial"] = partial

    return out


def merge_clip_partial(vision_params: dict, partial: dict,
                       cfg: ClipVitConfig) -> dict:
    """Write per-layer ClipEncoderLayer trees into the stacked ``blocks``
    arrays (and ``tail_block_*`` where the index is beyond the -2 feature
    cut). ``partial``: {layer_index: layer tree} from
    convert_non_lora_trainables; mirrors the reference's strict=False
    vision-tower reload (`model/builder.py:155-163`)."""
    import jax

    n_run = cfg.n_layers + cfg.feature_layer_offset + 1
    vision_params = dict(vision_params)
    blocks = dict(_flatten(vision_params["blocks"]))
    for i, layer in partial.items():
        if i < n_run:
            for key, val in _flatten(layer).items():
                stacked = np.asarray(blocks[key]).copy()
                stacked[i] = val
                blocks[key] = stacked
        elif f"tail_block_{i}" in vision_params:
            vision_params[f"tail_block_{i}"] = jax.tree.map(
                np.asarray, layer)
    vision_params["blocks"] = _unflatten(blocks)
    return vision_params
