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


class _RecordingSD(dict):
    """State dict that records which keys the converters actually read."""

    def __init__(self, d):
        super().__init__(d)
        self.read: set = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _flat_shapes(tree) -> dict:
    from mmor_tpu.utils.convert_hf import _flatten

    return {k: tuple(v.shape) for k, v in _flatten(tree).items()}


def _compare_shapes(got: dict, want: dict, name: str, problems: list):
    for k, shape in want.items():
        if k not in got:
            problems.append(f"{name}: converted tree is missing {k} {shape}")
        elif got[k] != shape:
            problems.append(
                f"{name}: {k} shape {got[k]} != expected {shape}")
    for k in got:
        if k not in want:
            problems.append(f"{name}: converter emitted unexpected key {k} "
                            f"{got[k]}")


def dry_run(args, cfg: MM2SGConfig | None = None):
    """Validate the converter key-mapping against a state-dict MANIFEST —
    no weights needed, nothing written (VERDICT r4 #8: keep the
    real-checkpoint path warm so conversion is one command when the HF
    weights appear).

    The manifest is JSON: ``{"llama": {key: [dims...]}, "clip": {...},
    "pooler": {...}, "non_lora": {...}}`` — produce it where the weights
    live with e.g. ``{k: list(v.shape) for k, v in model.state_dict().items()}``
    (or from the safetensors index). An optional ``"hf_llama_config"``
    entry (kwargs for transformers.LlamaConfig) rederives decoder
    hyperparameters exactly like the real conversion does. Zero tensors at
    the manifest's shapes run through the SAME converters, and the result
    is shape-checked leaf-by-leaf against the model's init tree
    (jax.eval_shape — no FLOPs). Returns the list of problems; main()
    exits 1 if any."""
    import dataclasses
    import json

    manifest = json.loads(Path(args.manifest).read_text())
    cfg = cfg or model_config(args.preset, type("T", (), {"vocab_size": 32000}))
    if "hf_llama_config" in manifest:
        import transformers

        from mmor_tpu.utils.convert_hf import llama_config_from_hf

        hf_cfg = transformers.LlamaConfig(**manifest["hf_llama_config"])
        cfg = dataclasses.replace(
            cfg,
            llama=llama_config_from_hf(
                hf_cfg, dtype=cfg.llama.dtype, param_dtype=cfg.llama.param_dtype
            ),
        )
    model = MM2SG(cfg)
    expected = jax.eval_shape(lambda: init_params(cfg, model))["params"]

    def synth(comp):
        return _RecordingSD({k: np.zeros(tuple(s), np.float32)
                             for k, s in manifest[comp].items()})

    problems: list = []

    def report_unread(sd, comp):
        unread = sorted(set(sd) - sd.read)
        if unread:
            print(f"[dry-run] {comp}: {len(unread)} manifest keys not "
                  f"consumed (first 5: {unread[:5]})")

    if "llama" in manifest:
        sd = synth("llama")
        if "lm_head.weight" not in sd:
            sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
        try:
            conv = convert_llama(sd, cfg.llama)
            _compare_shapes(_flat_shapes(conv),
                            _flat_shapes(expected["language_model"]),
                            "llama", problems)
        except Exception as e:
            problems.append(f"llama: converter raised {type(e).__name__}: {e}")
        report_unread(sd, "llama")
    if "clip" in manifest:
        # pre-normalize the prefix so the recording wrapper survives the
        # converter's own re-prefixing pass
        raw = manifest["clip"]
        if not any(k.startswith("vision_model.") for k in raw):
            raw = {f"vision_model.{k}": v for k, v in raw.items()}
        sd = _RecordingSD({k: np.zeros(tuple(s), np.float32)
                           for k, s in raw.items()})
        try:
            conv = convert_clip_vision(sd, cfg.vision)
            got = _flat_shapes(conv)
            # tail blocks + post-LN serve the global_forward pooler variant
            # and are absent from the patch-path init tree by design
            # (convert_hf.convert_clip_vision tail comment) — legal extras
            got = {k: v for k, v in got.items()
                   if not (k.startswith("tail_block_")
                           or k.startswith("post_ln"))}
            _compare_shapes(got, _flat_shapes(expected["vision_tower"]),
                            "clip", problems)
        except Exception as e:
            problems.append(f"clip: converter raised {type(e).__name__}: {e}")
        report_unread(sd, "clip")
    if "pooler" in manifest:
        sd = synth("pooler")
        try:
            conv = convert_bert_pooler(sd, cfg.pooler)
            want = _flat_shapes(expected["image_pooler"])
            got = _flat_shapes(conv)
            # the BERT conversion covers a SUBSET of the pooler tree (query
            # tokens / projections stay fresh-init) — check only mapped keys
            for k, shape in got.items():
                if k not in want:
                    problems.append(f"pooler: converter emitted unexpected "
                                    f"key {k} {shape}")
                elif want[k] != shape:
                    problems.append(
                        f"pooler: {k} shape {shape} != expected {want[k]}")
        except Exception as e:
            problems.append(
                f"pooler: converter raised {type(e).__name__}: {e}")
        report_unread(sd, "pooler")
    if "non_lora" in manifest:
        from mmor_tpu.utils.convert_hf import convert_non_lora_trainables

        sd = synth("non_lora")
        try:
            updates = convert_non_lora_trainables(
                sd, cfg.pooler, cfg.vision,
                allow_ptv3_reinit=getattr(args, "ptv3_reinit", True))
            for comp, target in (("image_pooler", "image_pooler"),
                                 ("mm_projector", "mm_projector"),
                                 ("segmask_encoder", "segmask_encoder")):
                if comp not in updates:
                    continue
                want = _flat_shapes(expected[target])
                for k, shape in _flat_shapes(updates[comp]).items():
                    if k not in want:
                        problems.append(f"non_lora/{comp}: unexpected key "
                                        f"{k} {shape}")
                    elif want[k] != shape:
                        problems.append(f"non_lora/{comp}: {k} shape {shape} "
                                        f"!= expected {want[k]}")
        except Exception as e:
            problems.append(
                f"non_lora: converter raised {type(e).__name__}: {e}")

    for p_ in problems:
        print(f"[dry-run] PROBLEM {p_}")
    comps = [c for c in ("llama", "clip", "pooler", "non_lora")
             if c in manifest]
    print(f"[dry-run] {'FAILED' if problems else 'OK'}: "
          f"components={comps} problems={len(problems)}")
    return problems


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
    p.add_argument("--output", default=None)
    p.add_argument("--quantize", action="store_true")
    p.add_argument("--dry-run", action="store_true",
                   help="validate key-mapping against --manifest without "
                        "weights; nothing is written")
    p.add_argument("--manifest", default=None,
                   help="state-dict manifest JSON for --dry-run")
    args = p.parse_args(argv)
    if args.dry_run:
        if not args.manifest:
            p.error("--dry-run requires --manifest")
        raise SystemExit(1 if dry_run(args) else 0)
    if not args.output:
        p.error("--output is required (unless --dry-run)")
    convert(args)


if __name__ == "__main__":
    main()
