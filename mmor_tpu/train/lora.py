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
    """'kernel' leaves inside included subtrees (the reference targets all
    linear layers of the decoder). 2-D kernels are plain Dense layers;
    3-D (L, in, out) kernels are the nn.scan-stacked decoder blocks, which
    get per-layer factors."""
    if not path_str.endswith("kernel"):
        return False
    if getattr(leaf, "ndim", 0) not in (2, 3):
        return False
    if not any(s in path_str for s in cfg.include):
        return False
    return not any(s in path_str for s in cfg.exclude)


def init_lora_params(cfg: LoraConfig, params, key: jax.Array):
    """A/B factors for every target kernel: A ~ N(0, 0.01), B = 0 — standard
    LoRA init (B zero => identity at step 0).

    2-D kernel (in, out)    -> a: (r, in),    b: (out, r)
    3-D kernel (L, in, out) -> a: (L, r, in), b: (L, out, r)  (per-layer)
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lora = {}
    for path, leaf in flat:
        ps = _path_str(path)
        if not is_lora_target(cfg, ps, leaf):
            continue
        key, k_a = jax.random.split(key)
        if leaf.ndim == 2:
            d_in, d_out = leaf.shape
            a_shape, b_shape = (cfg.rank, d_in), (d_out, cfg.rank)
        else:
            n_layers, d_in, d_out = leaf.shape
            a_shape = (n_layers, cfg.rank, d_in)
            b_shape = (n_layers, d_out, cfg.rank)
        lora[ps] = {
            "a": jax.random.normal(k_a, a_shape, jnp.float32) * 0.01,
            "b": jnp.zeros(b_shape, jnp.float32),
        }
    return lora


def _delta(ab) -> jax.Array:
    a, b = ab["a"], ab["b"]
    if a.ndim == 2:  # (r, in) x (out, r) -> (in, out)
        return a.T @ b.T
    # stacked: (L, r, in) x (L, out, r) -> (L, in, out)
    return jnp.einsum("lri,lor->lio", a, b)


def apply_lora(cfg: LoraConfig, params, lora_params):
    """Materialize effective weights: kernel + scale * (B @ A) per target."""

    def update(path, leaf):
        ps = _path_str(path)
        if ps in lora_params:
            delta = _delta(lora_params[ps]) * cfg.scale
            return (leaf.astype(jnp.float32) + delta).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(update, params)


def merge_lora(cfg: LoraConfig, params, lora_params):
    """Fold the factors into the base weights permanently
    (peft ``merge_and_unload`` equivalent)."""
    return apply_lora(cfg, params, lora_params)


def count_lora_params(lora_params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(lora_params)))
