"""MM2SG training: functional train state + pjit-able data-parallel step.

TPU-native replacement for the reference's HF Trainer + DeepSpeed ZeRO-2 path
(`LLaVA/llava/train/train.py:1088-1363`): AdamW with warmup+cosine, token-
weighted CE over the spliced labels, data parallelism over the ``data`` mesh
axis (XLA inserts the gradient all-reduce), optional ZeRO-style optimizer
state sharding.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmor_tpu.models.mm2sg import MM2SG
from mmor_tpu.sg.prompts import IGNORE_INDEX
from mmor_tpu.train.losses import token_weighted_ce


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-5  # README training command
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    b1: float = 0.9
    b2: float = 0.999
    grad_clip: float = 1.0
    grad_accum: int = 1  # README: per-device batch 4 x grad_accum 4
    # separate LR for the multimodal projector, as in the reference's
    # optimizer groups (llava_trainer.py:191-278); None = single group
    mm_projector_lr: float | None = None


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def hf_decay_mask(params) -> Any:
    """HF Trainer semantics (llava_trainer.py:191-278 via
    get_decay_parameter_names): weight decay applies to everything except
    biases and norm parameters."""
    def ok(path, _):
        p = _path_str(path)
        leaf = p.rsplit("/", 1)[-1]
        if leaf == "bias":
            return False
        if leaf == "scale" and "norm" in p.lower():
            return False
        return True
    return jax.tree_util.tree_map_with_path(ok, params)


def mm_projector_labels(params) -> Any:
    """'proj' for mm_projector params, 'base' otherwise (the reference's
    mm_projector_lr group selects names containing 'mm_projector')."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "proj" if "mm_projector" in _path_str(path) else "base",
        params,
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    def adamw(lr_peak):
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr_peak,
            warmup_steps=max(1, int(cfg.total_steps * cfg.warmup_ratio)),
            decay_steps=cfg.total_steps,
        )
        return optax.adamw(schedule, b1=cfg.b1, b2=cfg.b2,
                           weight_decay=cfg.weight_decay, mask=hf_decay_mask)

    if cfg.mm_projector_lr is not None:
        inner = optax.multi_transform(
            {"base": adamw(cfg.learning_rate), "proj": adamw(cfg.mm_projector_lr)},
            mm_projector_labels,
        )
    else:
        inner = adamw(cfg.learning_rate)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), inner)
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def init_train_state(params, tx: optax.GradientTransformation) -> dict[str, Any]:
    return {
        "params": params,
        "opt_state": tx.init(params["params"]),
        "step": jnp.zeros((), jnp.int32),
    }


def train_step(model: MM2SG, tx, state, batch, vocab_weights=None):
    """One optimization step. ``batch`` carries the MM2SG forward inputs plus
    ``labels`` (already IGNORE_INDEX-masked on the prompt)."""

    def loss_fn(params):
        logits, labels, _ = model.apply(
            {"params": params},
            batch["input_ids"],
            batch["attention_mask"],
            batch["images"],
            batch["view_mask"],
            pc_feature=batch.get("pc_feature"),
            audio_embedding=batch.get("audio_embedding"),
            segmasks=batch.get("segmasks"),
            pc_points=batch.get("pc_points"),
            pc_valid=batch.get("pc_valid"),
            labels=batch["labels"],
        )
        return token_weighted_ce(logits, labels, vocab_weights)

    loss, grads = jax.value_and_grad(loss_fn)(state["params"]["params"])
    updates, opt_state = tx.update(
        grads, state["opt_state"], state["params"]["params"]
    )
    new_params = optax.apply_updates(state["params"]["params"], updates)
    new_state = {
        "params": {"params": new_params},
        "opt_state": opt_state,
        "step": state["step"] + 1,
    }
    metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
    return new_state, metrics


def make_sharded_train_step(mesh: Mesh, model: MM2SG, tx, vocab_weights=None):
    """jit the train step with DP batch sharding over the mesh's data axis.

    Params/opt state are replicated (pass them through ``parallel.mesh.replicate``
    or let jit's sharding propagation place them); the gradient all-reduce
    rides ICI via XLA's SPMD partitioner.
    """
    step = partial(train_step, model, tx, vocab_weights=vocab_weights)
    batch_spec = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(None, batch_spec),
        donate_argnums=(0,),
    )


def make_labels(input_ids, attention_mask, prompt_lengths):
    """Supervise only the assistant response: positions < prompt_length (and
    padding) become IGNORE_INDEX — `preprocess_v1` target masking
    (train.py:432-508)."""
    t = input_ids.shape[1]
    pos = jnp.arange(t)[None, :]
    in_prompt = pos < prompt_lengths[:, None]
    ignore = in_prompt | (attention_mask == 0)
    return jnp.where(ignore, IGNORE_INDEX, input_ids)


# --------------------------------------------------------------------- #
# LoRA fine-tuning (reference QLoRA path, train.py:1159-1175 — bf16 on TPU)
# --------------------------------------------------------------------- #

from mmor_tpu.train import lora as lora_lib  # noqa: E402


def partition_params(params, trainable_patterns: tuple[str, ...]):
    """Split a param tree into (trainable dict, frozen dict, rebuild fn).

    Mirrors the reference's trainable set: LoRA on the decoder plus fully
    trained multimodal modules (mm_projector, image_pooler, segmask encoder,
    PTv3), everything else frozen (train.py:1145-1261). Vision-tower
    last-N-layer unfreezing maps to including 'vision_tower' here (the
    scanned-layer param stack trains as a whole; per-layer masks are a
    finer-grained option).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = [lora_lib._path_str(p) for p, _ in flat]
    leaves = [leaf for _, leaf in flat]
    trainable = {
        ps: leaf for ps, leaf in zip(paths, leaves)
        if any(pat in ps for pat in trainable_patterns)
    }
    frozen = {
        ps: leaf for ps, leaf in zip(paths, leaves) if ps not in trainable
    }

    def rebuild(trainable_now):
        return jax.tree_util.tree_unflatten(
            treedef,
            [trainable_now.get(ps, frozen.get(ps)) for ps in paths],
        )

    return trainable, frozen, rebuild


DEFAULT_TRAINABLE = ("mm_projector", "image_pooler", "segmask_encoder", "point_encoder")


def make_lora_train_step(
    model: MM2SG,
    tx,
    lora_cfg: "lora_lib.LoraConfig",
    params,
    trainable_patterns: tuple[str, ...] = DEFAULT_TRAINABLE,
    vocab_weights=None,
    vision_unfreeze_last_n: int | None = None,
):
    """Build (train_step, initial_state) for LoRA + partial fine-tuning.

    state = {lora, trainable, opt_state, step}; the frozen remainder is
    closed over (donated once to device). Gradients flow only into the LoRA
    factors and the trainable subtrees. ``vision_unfreeze_last_n`` reproduces
    the reference's ``unfreeze_n_vision_tower_layers`` (train.py:1257-1261):
    the CLIP tower's scanned blocks join the trainables with a per-layer
    gradient mask that zeroes all but the last N layers.
    """
    if vision_unfreeze_last_n:
        trainable_patterns = tuple(trainable_patterns) + ("vision_tower",)
    trainable, _frozen, rebuild = partition_params(params, trainable_patterns)

    vision_masks = None
    if vision_unfreeze_last_n:
        vision_masks = {}
        for ps, leaf in trainable.items():
            if "vision_tower/blocks" in ps:
                n_layers = leaf.shape[0]
                keep = jnp.arange(n_layers) >= n_layers - vision_unfreeze_last_n
                vision_masks[ps] = keep.reshape(
                    (n_layers,) + (1,) * (leaf.ndim - 1)
                ).astype(leaf.dtype)
    lora_params = lora_lib.init_lora_params(lora_cfg, params, jax.random.PRNGKey(0))

    state = {
        "lora": lora_params,
        "trainable": trainable,
        "opt_state": tx.init({"lora": lora_params, "trainable": trainable}),
        "step": jnp.zeros((), jnp.int32),
    }

    def step_fn(state, batch):
        def loss_fn(opt_tree):
            full = rebuild(opt_tree["trainable"])
            eff = lora_lib.apply_lora(lora_cfg, full, opt_tree["lora"])
            logits, labels, _ = model.apply(
                eff,
                batch["input_ids"],
                batch["attention_mask"],
                batch["images"],
                batch["view_mask"],
                pc_feature=batch.get("pc_feature"),
                audio_embedding=batch.get("audio_embedding"),
                segmasks=batch.get("segmasks"),
                pc_points=batch.get("pc_points"),
                pc_valid=batch.get("pc_valid"),
                labels=batch["labels"],
            )
            return token_weighted_ce(logits, labels, vocab_weights)

        opt_tree = {"lora": state["lora"], "trainable": state["trainable"]}
        loss, grads = jax.value_and_grad(loss_fn)(opt_tree)
        if vision_masks:
            grads["trainable"] = {
                ps: g * vision_masks[ps] if ps in vision_masks else g
                for ps, g in grads["trainable"].items()
            }
        updates, opt_state = tx.update(grads, state["opt_state"], opt_tree)
        new_tree = optax.apply_updates(opt_tree, updates)
        new_state = {
            "lora": new_tree["lora"],
            "trainable": new_tree["trainable"],
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return step_fn, state


def make_sharded_lora_train_step(
    mesh: Mesh,
    model: MM2SG,
    tx,
    lora_cfg: "lora_lib.LoraConfig",
    params,
    trainable_patterns: tuple[str, ...] = DEFAULT_TRAINABLE,
    vocab_weights=None,
    vision_unfreeze_last_n: int | None = None,
):
    """Data-parallel LoRA step over the mesh's ``data`` axis.

    The reference trains this path via HF Trainer + DeepSpeed ZeRO-2 on
    ``--num-gpus`` (README training command); here the batch shards on
    ``data``, the LoRA/trainable state replicates, and XLA's SPMD partitioner
    inserts the gradient all-reduce over ICI. (TP of the frozen decoder under
    LoRA is possible but unnecessary at 7B serving scale — LoRA grads touch
    only adapters and the small multimodal modules.)

    Returns (jitted step, state ON THE MESH). Shard batches with
    ``parallel.mesh.shard_batch`` before calling.
    """
    from mmor_tpu.parallel.mesh import batch_sharding, replicate, replicated

    step_fn, state = make_lora_train_step(
        model, tx, lora_cfg, params,
        trainable_patterns=trainable_patterns,
        vocab_weights=vocab_weights,
        vision_unfreeze_last_n=vision_unfreeze_last_n,
    )
    state = replicate(mesh, state)
    rep = replicated(mesh)
    jitted = jax.jit(
        step_fn,
        in_shardings=(rep, batch_sharding(mesh)),
        donate_argnums=(0,),
    )
    return jitted, state
