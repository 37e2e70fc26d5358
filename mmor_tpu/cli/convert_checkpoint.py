"""Convert HF checkpoints (LLaVA / Llama / CLIP) into mmor_tpu param trees.

The reference loads ``liuhaotian/llava-v1.5-7b`` through HF + PEFT
(`model/builder.py:26-184`); here the published weights convert once into an
orbax directory that every CLI accepts as ``--checkpoint``.

Usage:
  python -m mmor_tpu.cli.convert_checkpoint \
      --llama <hf_llama_dir> --clip <hf_clip_dir> [--pooler <hf_bert_dir>] \
      --output converted_params [--quantize]

Any component may be omitted; missing modules keep fresh initialization (the
reference also trains pooler/projector from scratch).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from mmor_tpu.cli.common import init_params, model_config
from mmor_tpu.config import MM2SGConfig
from mmor_tpu.models.mm2sg import MM2SG
from mmor_tpu.utils.checkpoint import save_pytree
from mmor_tpu.utils.convert_hf import (
    convert_bert_pooler,
    convert_clip_vision,
    convert_llama,
)


def _state_dict(model_dir: str, cls_name: str) -> dict:
    import torch
    import transformers

    cls = getattr(transformers, cls_name)
    model = cls.from_pretrained(model_dir, torch_dtype=torch.float32)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    del model
    return sd


def convert(args, cfg: MM2SGConfig | None = None):
    import dataclasses

    cfg = cfg or model_config(args.preset, type("T", (), {"vocab_size": 32000}))
    if args.llama:
        # derive decoder hyperparameters from the HF config (eps/theta/dims)
        import transformers

        from mmor_tpu.utils.convert_hf import llama_config_from_hf

        hf_cfg = transformers.AutoConfig.from_pretrained(args.llama)
        cfg = dataclasses.replace(
            cfg,
            llama=llama_config_from_hf(
                hf_cfg, dtype=cfg.llama.dtype, param_dtype=cfg.llama.param_dtype
            ),
        )
    model = MM2SG(cfg)
    params = init_params(cfg, model)

    if args.llama:
        sd = _state_dict(args.llama, "LlamaForCausalLM")
        if "lm_head.weight" not in sd:
            sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
        params["params"]["language_model"] = convert_llama(sd, cfg.llama)
        print(f"converted llama from {args.llama}")
    if args.clip:
        sd = _state_dict(args.clip, "CLIPVisionModel")
        params["params"]["vision_tower"] = convert_clip_vision(sd, cfg.vision)
        print(f"converted clip from {args.clip}")
    if args.pooler:
        sd = _state_dict(args.pooler, "BertModel")
        bert = convert_bert_pooler(sd, cfg.pooler)
        params["params"]["image_pooler"].update(bert)
        print(f"converted pooler bert from {args.pooler}")
    if getattr(args, "non_lora", None):
        import torch

        from mmor_tpu.utils.convert_hf import (
            convert_non_lora_trainables,
            merge_clip_partial,
        )

        blob = torch.load(args.non_lora, map_location="cpu")
        sd = {k: v.float().numpy() for k, v in blob.items()}
        updates = convert_non_lora_trainables(
            sd, cfg.pooler, cfg.vision, allow_ptv3_reinit=args.ptv3_reinit
        )
        if "image_pooler" in updates:
            params["params"]["image_pooler"].update(updates["image_pooler"])
        if "mm_projector" in updates:
            params["params"]["mm_projector"] = updates["mm_projector"]
        if "segmask_encoder" in updates:
            params["params"]["segmask_encoder"] = updates["segmask_encoder"]
        if "vision_tower_partial" in updates:
            params["params"]["vision_tower"] = merge_clip_partial(
                params["params"]["vision_tower"],
                updates["vision_tower_partial"], cfg.vision,
            )
            print(f"merged {len(updates['vision_tower_partial'])} tuned CLIP "
                  "layers from non_lora_trainables")
        if "skipped_ptv3" in updates:
            print(f"WARNING: {len(updates['skipped_ptv3'])} trained PTv3 "
                  "tensors skipped (spconv stem/xCPE have no counterpart in "
                  "the TPU-native PTv3) — the point encoder stays at fresh "
                  "init and needs re-finetuning (see "
                  "convert_hf.PTv3ConversionError and --init_from curriculum "
                  "in cli/train_mm2sg.py)")
        print(f"converted non-LoRA trainables from {args.non_lora}")

    if args.quantize:
        from mmor_tpu.models.llama import quantize_llama_params

        ffn_pad = (-cfg.llama.ffn_dim) % 1024  # LlamaConfig.ffn_pad tiling
        params["params"]["language_model"] = quantize_llama_params(
            params["params"]["language_model"], ffn_pad=ffn_pad
        )
        print(f"quantized decoder weights to packed int8 (ffn_pad={ffn_pad})")

    save_pytree(Path(args.output), params)
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"wrote {n / 1e6:.1f}M params to {args.output}")
    return params, cfg


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--llama", default=None, help="HF Llama/LLaVA model dir")
    p.add_argument("--clip", default=None, help="HF CLIPVisionModel dir")
    p.add_argument("--pooler", default=None, help="HF BertModel dir")
    p.add_argument("--non-lora", dest="non_lora", default=None,
                   help="reference non_lora_trainables.bin (tuned pooler / "
                        "projector / segmask encoder / CLIP layers)")
    p.add_argument("--ptv3-reinit", action="store_true",
                   help="allow trained-PTv3 weights in --non-lora to be "
                        "skipped (the TPU-native PTv3 stem cannot load them; "
                        "re-finetune required)")
    p.add_argument("--preset", default="7b")
    p.add_argument("--output", required=True)
    p.add_argument("--quantize", action="store_true")
    args = p.parse_args(argv)
    convert(args)


if __name__ == "__main__":
    main()
