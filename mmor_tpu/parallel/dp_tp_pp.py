"""DP x TP x PP composed in ONE train step on a 3-axis mesh.

The three parallelism dimensions this package provides individually —
data-parallel batch sharding (`parallel/mesh.py`), Megatron-style tensor
parallelism (`parallel/tp.py`), and layer-axis pipelining
(`parallel/pp.py`) — composed over a ``('data', 'pipe', 'model')`` mesh:

- microbatches shard their batch dim on ``data`` and rotate between pipeline
  stages over ``pipe`` (``pipeline_apply``'s GPipe ring);
- within each stage, the decoder block runs TENSOR-parallel on ``model``:
  q/k/v/gate/up kernels arrive output-sliced (local heads / local ffn
  channels), o/down arrive input-sliced, and explicit ``psum('model')``
  completes the row-parallel matmuls (under ``shard_map`` the collectives
  are hand-placed, unlike the GSPMD path in parallel/tp.py — this is the
  scaling-book recipe for when you own the SPMD program).

``tp_block_apply`` reimplements ``LlamaBlock``'s prefill math (RMSNorm +
HF-convention RoPE + causal attention + SwiGLU; models/llama.py) over the
SAME parameter tree, so the composed pipeline is validated token-for-token
against ``LlamaModel.apply`` (tests/test_dp_tp_pp.py).

The reference has no model parallelism at all (SURVEY §2.4: single-GPU DP
via detectron2/HF Trainer); this is the TPU-native extension completing the
DP x TP x PP matrix claimed in PARITY §2.4.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmor_tpu.config import LlamaConfig
from mmor_tpu.models.llama import apply_rope
from mmor_tpu.ops.attention import mha_reference
from mmor_tpu.parallel.pp import pipeline_apply


def _rms(x, scale, eps):
    x32 = x.astype(jnp.float32)
    normed = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (normed * scale.astype(jnp.float32)).astype(x.dtype)


def tp_block_apply(cfg: LlamaConfig, layer_params, x, *,
                   model_axis: str = "model"):
    """One TP-sharded LlamaBlock prefill step (inside shard_map).

    ``layer_params`` is one layer of the ``blocks`` tree with q/k/v/gate/up
    kernels output-sliced and o/down input-sliced on ``model_axis``; ``x`` is
    (B, T, D) with full D. Positions are ``arange(T)`` (dense prefill — the
    composed step trains on unpadded windows). psum('model') completes the
    o_proj / down_proj row-parallel products before the residual adds.
    """
    b, t, _ = x.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    dh = cfg.head_dim

    h = _rms(x, layer_params["attn_norm"]["scale"], cfg.norm_eps)
    q = h @ layer_params["q_proj"]["kernel"].astype(h.dtype)
    k = h @ layer_params["k_proj"]["kernel"].astype(h.dtype)
    v = h @ layer_params["v_proj"]["kernel"].astype(h.dtype)
    hl = q.shape[-1] // dh  # local head count (H / model_parallel)
    q = q.reshape(b, t, hl, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, hl, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, hl, dh).transpose(0, 2, 1, 3)
    q = apply_rope(q, positions, cfg.rope_theta)
    k = apply_rope(k, positions, cfg.rope_theta)
    attn = mha_reference(q, k, v, causal=True)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, hl * dh)
    o_local = attn @ layer_params["o_proj"]["kernel"].astype(attn.dtype)
    x = x + jax.lax.psum(o_local, model_axis)

    h = _rms(x, layer_params["mlp_norm"]["scale"], cfg.norm_eps)
    gate = h @ layer_params["gate_proj"]["kernel"].astype(h.dtype)
    up = h @ layer_params["up_proj"]["kernel"].astype(h.dtype)
    m = jax.nn.silu(gate) * up
    d_local = m @ layer_params["down_proj"]["kernel"].astype(m.dtype)
    return x + jax.lax.psum(d_local, model_axis)


def make_3d_mesh(n_data: int, n_pipe: int, n_model: int,
                 devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    need = n_data * n_pipe * n_model
    grid = np.asarray(devices[:need]).reshape(n_data, n_pipe, n_model)
    return Mesh(grid, axis_names=("data", "pipe", "model"))


def block_param_specs(blocks_params):
    """PartitionSpecs for the stacked (L, ...) blocks tree: L on ``pipe``,
    projection in/out dims on ``model`` per the TP rules (parallel/tp.py)."""

    def spec(path, leaf):
        names = [str(getattr(kk, "key", kk)) for kk in path]
        mod = names[0] if names else ""
        if mod in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
            return P("pipe", None, "model")
        if mod in ("o_proj", "down_proj"):
            return P("pipe", "model", None)
        return P("pipe", *([None] * (leaf.ndim - 1)))

    return jax.tree_util.tree_map_with_path(spec, blocks_params)


def decoder_forward(cfg: LlamaConfig, params, ids, mesh: Mesh, *,
                    n_micro: int):
    """Full decoder forward with the blocks pipelined+TP'd over the mesh.

    Embedding / final norm / lm_head stay replicated (tiny next to the
    blocks); the (L-stacked) blocks run through ``pipeline_apply`` with the
    batch on ``data``, layers on ``pipe`` and tensor shards on ``model``.
    """
    inner = params["params"]
    x = jnp.take(inner["embed_tokens"]["embedding"], ids, axis=0
                 ).astype(cfg.dtype)
    blocks = inner["blocks"]
    layer_fn = partial(tp_block_apply, cfg)
    x = pipeline_apply(
        layer_fn, blocks, x, mesh, n_micro=n_micro,
        data_axis="data", param_specs=block_param_specs(blocks),
    )
    x = _rms(x, inner["final_norm"]["scale"], cfg.norm_eps)
    logits = x @ inner["lm_head"]["kernel"].astype(x.dtype)
    return logits.astype(jnp.float32)


def make_dp_tp_pp_train_step(cfg: LlamaConfig, mesh: Mesh, tx, *,
                             n_micro: int):
    """jit-able (state, ids, labels) -> (state, metrics) with all three
    parallel axes active in ONE step: grads flow through ppermute (pipe),
    psum (model) and the data-axis batch sharding."""

    def loss_fn(params, ids, labels):
        logits = decoder_forward(cfg, params, ids, mesh, n_micro=n_micro)
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp[:, :-1], labels[:, 1:, None], axis=-1)
        return nll.mean()

    def step(state, ids, labels):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], ids, labels)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        return (
            {"params": params, "opt_state": opt_state,
             "step": state["step"] + 1},
            {"loss": loss},
        )

    return step


def shard_decoder_state(mesh: Mesh, state):
    """Place a {params, opt_state, step} train state on the 3-D mesh: blocks
    (and their optimizer moments) split over pipe(+model), the rest
    replicated."""

    def put_tree(tree):
        def place(path, leaf):
            names = [str(getattr(kk, "key", kk)) for kk in path]
            if "blocks" in names:
                i = names.index("blocks")
                # spec from the position of the projection name after blocks
                mod = names[i + 1] if i + 1 < len(names) else ""
                if mod in ("q_proj", "k_proj", "v_proj", "gate_proj",
                           "up_proj") and leaf.ndim == 3:
                    spec = P("pipe", None, "model")
                elif mod in ("o_proj", "down_proj") and leaf.ndim == 3:
                    spec = P("pipe", "model", None)
                elif leaf.ndim >= 1:
                    spec = P("pipe", *([None] * (leaf.ndim - 1)))
                else:
                    spec = P()
            else:
                spec = P()
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map_with_path(place, tree)

    return put_tree(state)
