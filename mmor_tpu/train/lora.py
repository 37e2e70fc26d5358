"""LoRA for the MM2SG language model — functional, pytree-surgery style.

Equivalent of the reference's PEFT/QLoRA setup (`train.py:1159-1175`,
r=128, alpha=256, targeting every linear layer of the decoder except the
multimodal modules — ``find_all_linear_names`` excludes mm_projector /
vision_tower / image_pooler, `train.py:187-200`). On TPU the 4-bit NF4
base-weight quantization is unnecessary (HBM fits bf16), so this is plain
LoRA: ``W_eff = W + (alpha/r) * B @ A``.

Implementation: instead of rewriting model modules, LoRA factors live in a
parallel pytree keyed like the frozen params; ``apply_lora`` materializes
effective weights (cheap: one (in,r)x(r,out) matmul per target), so every
existing model function works unchanged — and ``merge`` is the identity of
the same computation, mirroring ``merge_and_unload`` (model/builder.py:67-90).
Training differentiates w.r.t. the factors only.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class LoraConfig:
    rank: int = 128
    alpha: float = 256.0
    # target Dense kernels under these subtrees (path substring match)
    include: tuple[str, ...] = ("language_model",)
    exclude: tuple[str, ...] = ("embed_tokens",)

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def is_lora_target(cfg: LoraConfig, path_str: str, leaf) -> bool:
    """2D 'kernel' leaves inside included subtrees (the reference targets all
    linear layers of the decoder)."""
    if not path_str.endswith("kernel"):
        return False
    if getattr(leaf, "ndim", 0) != 2:
        return False
    if not any(s in path_str for s in cfg.include):
        return False
    return not any(s in path_str for s in cfg.exclude)


def init_lora_params(cfg: LoraConfig, params, key: jax.Array):
    """A/B factors for every target kernel: A ~ N(0, 0.01) (r, in),
    B = 0 (out, r) — standard LoRA init (B zero => identity at step 0)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lora = {}
    for path, leaf in flat:
        ps = _path_str(path)
        if not is_lora_target(cfg, ps, leaf):
            continue
        key, k_a = jax.random.split(key)
        d_in, d_out = leaf.shape
        lora[ps] = {
            "a": jax.random.normal(k_a, (cfg.rank, d_in), jnp.float32) * 0.01,
            "b": jnp.zeros((d_out, cfg.rank), jnp.float32),
        }
    return lora


def apply_lora(cfg: LoraConfig, params, lora_params):
    """Materialize effective weights: kernel + scale * (A^T @ B^T)."""

    def update(path, leaf):
        ps = _path_str(path)
        if ps in lora_params:
            ab = lora_params[ps]
            delta = (ab["a"].T @ ab["b"].T) * cfg.scale  # (in, out)
            return (leaf.astype(jnp.float32) + delta).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(update, params)


def merge_lora(cfg: LoraConfig, params, lora_params):
    """Fold the factors into the base weights permanently
    (peft ``merge_and_unload`` equivalent)."""
    return apply_lora(cfg, params, lora_params)


def count_lora_params(lora_params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(lora_params)))
