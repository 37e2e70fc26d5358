"""Tensor-parallel sharding rules for the MM2SG decoder.

Megatron-style TP expressed purely through ``jax.sharding`` specs — XLA's
SPMD partitioner splits the matmuls and inserts the all-reduces over ICI
(scaling-book recipe: annotate, don't hand-write collectives):

- q/k/v and gate/up kernels shard their OUTPUT dim on ``model`` (heads split
  across chips);
- o_proj and down_proj shard their INPUT dim on ``model`` (the following
  residual-add triggers the psum);
- lm_head shards the vocab dim; embeddings replicate.

Everything else (vision tower, pooler, PTv3) replicates — those are small
next to the 7B decoder. Requires n_heads % model_axis == 0.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec builder). Kernel layouts: blocks are stacked (L, in, out);
# lm_head is (in, out). The FUSED serving projections (qkv_proj /
# gate_up_proj) shard their output dim too — valid because the model lays
# the fused columns out in `model`-axis segment groups when
# ``LlamaConfig.tp_segments == mesh.shape['model']`` (each shard's slice is
# its own heads' q|k|v / gate|up; see fuse_llama_params). Packed ``w_p``
# tensors are (L, K/4, N): output-dim sharding is unchanged, and input-dim
# sharding splits K in 4-row units aligned with the activation's K shards.
TP_RULES: tuple[tuple[str, P], ...] = (
    (r".*blocks/(q_proj|k_proj|v_proj|gate_proj|up_proj|qkv_proj|gate_up_proj)/kernel$",
     P(None, None, "model")),
    (r".*blocks/(o_proj|down_proj)/kernel$", P(None, "model", None)),
    (r".*blocks/(q_proj|k_proj|v_proj|gate_proj|up_proj|qkv_proj|gate_up_proj)/w_[qp]$",
     P(None, None, "model")),
    (r".*blocks/(o_proj|down_proj)/w_[qp]$", P(None, "model", None)),
    (r".*blocks/(q_proj|k_proj|v_proj|gate_proj|up_proj|qkv_proj|gate_up_proj)/scale$",
     P(None, "model")),
    # int4 grouped scales carry a (K/group) axis: (L, K/group, N). o/down
    # shard the K-group axis with their K-sharded weights; the output-dim
    # projections get the group axis replicated via the rank adapter below.
    (r".*blocks/(o_proj|down_proj)/scale$", P(None, "model", None)),
    (r".*lm_head/kernel$", P(None, "model")),
    (r".*lm_head/w_[qp]$", P(None, "model")),
    (r".*lm_head/scale$", P("model")),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def tp_param_shardings(mesh: Mesh, params):
    """Pytree of NamedShardings: TP for decoder kernels, replicated otherwise."""

    def spec_for(path, leaf):
        ps = _path_str(path)
        for pattern, spec in TP_RULES:
            if not re.match(pattern, ps):
                continue
            if ps.endswith("/scale") and leaf.ndim == len(spec) + 1:
                # int4 grouped scale (L, K/group, N) matched a 2-D
                # (per-channel) rule: keep the rule's semantic axes and
                # replicate the inserted K-group axis
                spec = P(*spec[:-1], None, spec[-1])
            if len(spec) != leaf.ndim:
                continue  # e.g. the 3-D o/down scale rule vs int8 (L, N)
            # skip axes that don't divide evenly (tiny test configs)
            sizes = leaf.shape
            ok = all(
                ax is None or sizes[i] % mesh.shape[ax] == 0
                for i, ax in enumerate(spec)
            )
            if ok:
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params):
    """Place a param tree according to the TP rules."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, tp_param_shardings(mesh, params)
    )


def tp_cache_shardings(mesh: Mesh, cache: dict, data_axis: str | None = None):
    """NamedShardings for a decode KV cache: the HEAD axis shards on
    ``model`` (matching the q/k/v head shards), batch optionally on
    ``data``; masks/positions follow the batch.

    Cache layouts (models/llama.py): packed quant stacks are
    (L, B, H, D/4, T) int32 with (L, B, H, T) scales; unquantized stacks are
    (L, B, H, T, Dh). ``kv_mask`` is (B, T); ``write_pos`` scalar;
    ``tok_pos`` (B,).
    """
    m = mesh.shape.get("model", 1)
    d = data_axis

    def spec_for(key, leaf):
        if key in ("k", "v"):
            if leaf.ndim == 5 and leaf.shape[2] % m == 0:
                return NamedSharding(mesh, P(None, d, "model", None, None))
        elif key in ("k_s", "v_s"):
            if leaf.ndim == 4 and leaf.shape[2] % m == 0:
                return NamedSharding(mesh, P(None, d, "model", None))
        elif key == "kv_mask":
            return NamedSharding(mesh, P(d, None))
        elif key == "tok_pos":
            return NamedSharding(mesh, P(d))
        return NamedSharding(mesh, P())

    return {k: spec_for(k, v) for k, v in cache.items()}


def shard_cache(mesh: Mesh, cache: dict, data_axis: str | None = None):
    """Place a decode cache according to ``tp_cache_shardings``."""
    shardings = tp_cache_shardings(mesh, cache, data_axis)
    return {k: jax.device_put(v, shardings[k]) for k, v in cache.items()}
