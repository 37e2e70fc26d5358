"""Shared CLI plumbing: presets, tokenizers, dataset/predictor construction."""

from __future__ import annotations

import tempfile
from pathlib import Path

import jax

from mmor_tpu.config import LlamaConfig, MM2SGConfig
from mmor_tpu.data.or_dataset import ORDataset
from mmor_tpu.inference import ByteTokenizer, SceneGraphPredictor
from mmor_tpu.models.mm2sg import MM2SG
from mmor_tpu.sg.prompts import IMAGE_TOKEN_INDEX
from mmor_tpu.utils.checkpoint import restore_pytree


def load_tokenizer(path: str | None):
    """HF tokenizer from a local dir, else the byte-level fallback."""
    if path:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(path)
        tok.vocab_size = len(tok)
        return tok
    return ByteTokenizer()


def model_config(preset: str, tokenizer) -> MM2SGConfig:
    from __graft_entry__ import _preset

    cfg = _preset(preset)
    if preset == "tiny":
        cfg = MM2SGConfig.tiny(
            llama=LlamaConfig.tiny(vocab_size=max(tokenizer.vocab_size, 259))
        )
    return cfg


def make_dataset(args) -> ORDataset:
    if args.synthetic:
        from mmor_tpu.data.synthetic import build_synthetic_dataset

        root = Path(tempfile.mkdtemp(prefix="mmor_synth_"))
        paths = build_synthetic_dataset(root, n_frames=args.synthetic)
        return ORDataset(split=args.split if args.split != "train" else "train",
                         data_path=paths["data_path"],
                         mmor_root=paths["mmor_root"],
                         or4d_root=paths["or4d_root"])
    return ORDataset(split=args.split, data_path=args.data_path)


def init_params(cfg: MM2SGConfig, model: MM2SG):
    """Randomly initialized params with every modality traced."""
    import jax.numpy as jnp

    b, t, v, s = 1, 16, cfg.pooler.max_views, cfg.vision.image_size
    ids = jnp.full((b, t), 3, jnp.int32).at[0, 1].set(IMAGE_TOKEN_INDEX)
    return model.init(
        jax.random.PRNGKey(0), ids, jnp.ones((b, t), jnp.int32),
        jnp.zeros((b, v, s, s, 3)), jnp.ones((b, v), jnp.int32),
        audio_embedding=jnp.zeros((b, cfg.pooler.audio_dim)),
        segmasks=jnp.zeros(
            (b, cfg.pooler.num_segmask_tokens, cfg.segmask.mask_size,
             cfg.segmask.mask_size), jnp.int32,
        ),
        pc_points=jnp.zeros((b, cfg.ptv3.max_points, 6)),
        pc_valid=jnp.ones((b, cfg.ptv3.max_points), bool),
    )


def build_predictor(
    preset: str, tokenizer, checkpoint: str | Path | None,
    temporality: str | None = None,
    quantize: bool | str = False,
) -> SceneGraphPredictor:
    """``quantize``: False/None = bf16; "int8" (or True, back-compat) =
    packed-int8 weights + int8 KV, per-op stepwise decode (the round-2
    serving config); "int4" = the megakernel serving config — fused
    qkv/gate-up, int4 weights (per-K-chunk scales), int4 T-halved KV, ALL
    decoder layers in one pallas call per token (ops/mega_decode.py).
    Quality gates: tests/test_generation_parity.py."""
    cfg = model_config(preset, tokenizer)
    model = MM2SG(cfg)
    params = init_params(cfg, model)
    if checkpoint:
        ckpt = Path(checkpoint)
        target = ckpt / "state" if (ckpt / "state").exists() else ckpt
        restored = restore_pytree(target, params)
        params = restored.get("params_full", restored) if isinstance(restored, dict) else restored
        if "params" not in params:
            params = {"params": params}
    mode = {True: "int8", False: None}.get(quantize, quantize)
    if mode == "int8":
        import dataclasses

        from mmor_tpu.models.llama import quantize_llama_params

        lm = params["params"]["language_model"]
        ffn_pad = (-cfg.llama.ffn_dim) % 1024  # clean tiling (LlamaConfig.ffn_pad)
        params["params"]["language_model"] = quantize_llama_params(
            lm, ffn_pad=ffn_pad)
        cfg = dataclasses.replace(
            cfg,
            llama=dataclasses.replace(cfg.llama, weight_quant=True,
                                      kv_quant=True, ffn_pad=ffn_pad),
        )
        model = MM2SG(cfg)
    elif mode == "int4":
        import dataclasses

        from mmor_tpu.models.llama import (fuse_llama_params,
                                           quantize_llama_params)
        from mmor_tpu.ops.mega_decode import MegaGeometry

        ffn_pad = (-cfg.llama.ffn_dim) % 1024
        lcfg = dataclasses.replace(
            cfg.llama, weight_quant=True, kv_quant=True, fused_qkv=True,
            mega_decode=True, weight_bits=4, kv_bits=4, ffn_pad=ffn_pad)
        group = MegaGeometry.pick_ck(lcfg)
        if group % 256 != 0:
            # small/test geometries can't host the megakernel's int4 lane
            # tiles (ck % 256); degrade to per-op int4 weights + int8 KV
            lcfg = dataclasses.replace(lcfg, mega_decode=False, kv_bits=8)
        lcfg = dataclasses.replace(lcfg, weight_group=group)
        lm = params["params"]["language_model"]
        params["params"]["language_model"] = quantize_llama_params(
            fuse_llama_params(lm), ffn_pad=ffn_pad, bits=4, group=group)
        cfg = dataclasses.replace(cfg, llama=lcfg)
        model = MM2SG(cfg)
    elif mode not in (None,):
        raise ValueError(f"unknown quantize mode {quantize!r}")
    return SceneGraphPredictor(
        cfg=cfg, model=model, params=params, tokenizer=tokenizer,
        temporality=temporality,
    )
