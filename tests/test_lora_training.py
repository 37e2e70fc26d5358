"""LoRA + partial fine-tuning: identity at init, frozen base, loss decreases;
checkpoint save/resume roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.config import MM2SGConfig
from mmor_tpu.models.mm2sg import MM2SG
from mmor_tpu.sg.prompts import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from mmor_tpu.train import trainer as tr
from mmor_tpu.train.lora import (
    LoraConfig,
    apply_lora,
    count_lora_params,
    init_lora_params,
    merge_lora,
)
from mmor_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_train_checkpoint,
    save_train_checkpoint,
)


@pytest.fixture(scope="module")
def setup():
    cfg = MM2SGConfig.tiny()
    model = MM2SG(cfg)
    key = jax.random.PRNGKey(0)
    b, t, v, s = 2, 10, cfg.pooler.max_views, cfg.vision.image_size
    ids = jax.random.randint(key, (b, t), 3, cfg.llama.vocab_size)
    ids = ids.at[:, 1].set(IMAGE_TOKEN_INDEX)
    batch = {
        "input_ids": ids,
        "attention_mask": jnp.ones((b, t), jnp.int32),
        "images": jax.random.normal(jax.random.PRNGKey(1), (b, v, s, s, 3)),
        "view_mask": jnp.ones((b, v), jnp.int32),
        "labels": jnp.where(jnp.arange(t)[None] < 4, IGNORE_INDEX, ids),
    }
    params = model.init(
        jax.random.PRNGKey(2), batch["input_ids"], batch["attention_mask"],
        batch["images"], batch["view_mask"],
    )
    return cfg, model, params, batch


def test_lora_identity_at_init(setup):
    cfg, model, params, batch = setup
    lcfg = LoraConfig(rank=4, alpha=8)
    lora = init_lora_params(lcfg, params, jax.random.PRNGKey(3))
    assert count_lora_params(lora) > 0
    assert all("language_model" in k for k in lora)
    assert not any("embed_tokens" in k for k in lora)
    # the nn.scan-stacked decoder linears must be covered, not just lm_head
    # (reference PEFT targets every decoder linear, train.py:187-200)
    for proj in ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj"):
        assert any(f"blocks/{proj}" in k for k in lora), proj
    stacked = lora["params/language_model/blocks/q_proj/kernel"]
    n_layers = cfg.llama.n_layers
    assert stacked["a"].shape == (n_layers, lcfg.rank, cfg.llama.dim)
    assert stacked["b"].shape == (n_layers, cfg.llama.dim, lcfg.rank)
    eff = apply_lora(lcfg, params, lora)
    logits0, _, _ = model.apply(params, batch["input_ids"], batch["attention_mask"],
                                batch["images"], batch["view_mask"])
    logits1, _, _ = model.apply(eff, batch["input_ids"], batch["attention_mask"],
                                batch["images"], batch["view_mask"])
    np.testing.assert_allclose(np.asarray(logits0), np.asarray(logits1), atol=1e-5)


def test_lora_training_decreases_loss_and_freezes_base(setup):
    cfg, model, params, batch = setup
    lcfg = LoraConfig(rank=4, alpha=8)
    tx = tr.make_optimizer(tr.TrainConfig(learning_rate=5e-3, total_steps=20))
    step_fn, state = tr.make_lora_train_step(model, tx, lcfg, params)
    step_fn = jax.jit(step_fn)

    first_loss = None
    for _ in range(8):
        state, metrics = step_fn(state, batch)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    assert float(metrics["loss"]) < first_loss

    # LoRA factors moved; trainable multimodal modules moved
    assert float(jnp.max(jnp.abs(
        jax.tree.leaves(state["lora"])[0]
    ))) >= 0.0
    moved = any(
        "mm_projector" in k
        for k in state["trainable"]
    )
    assert moved
    # merged weights differ from the originals after training — including the
    # stacked decoder kernels (the round-1 bug trained only lm_head)
    merged = merge_lora(lcfg, params, state["lora"])
    q_before = params["params"]["language_model"]["blocks"]["q_proj"]["kernel"]
    q_after = merged["params"]["language_model"]["blocks"]["q_proj"]["kernel"]
    assert float(jnp.max(jnp.abs(
        q_after.astype(jnp.float32) - q_before.astype(jnp.float32)
    ))) > 0, "stacked decoder kernels did not receive LoRA updates"
    # and decoder outputs actually change
    logits0, _, _ = model.apply(params, batch["input_ids"], batch["attention_mask"],
                                batch["images"], batch["view_mask"])
    logits1, _, _ = model.apply(merged, batch["input_ids"], batch["attention_mask"],
                                batch["images"], batch["view_mask"])
    assert float(jnp.max(jnp.abs(logits0 - logits1))) > 1e-6


def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, model, params, batch = setup
    lcfg = LoraConfig(rank=2, alpha=4)
    lora = init_lora_params(lcfg, params, jax.random.PRNGKey(4))
    non_lora = {"marker": jnp.arange(3.0)}
    save_train_checkpoint(tmp_path, 100, lora_params=lora,
                          non_lora_trainables=non_lora)
    save_train_checkpoint(tmp_path, 250, lora_params=lora,
                          non_lora_trainables=non_lora)
    latest = latest_checkpoint(tmp_path)
    assert latest is not None and latest.name == "checkpoint-250"
    restored = load_train_checkpoint(latest, lora_like=lora, non_lora_like=non_lora)
    assert restored["step"] == 250
    np.testing.assert_allclose(
        np.asarray(restored["non_lora_trainables"]["marker"]), [0, 1, 2]
    )
    a0 = jax.tree.leaves(lora)[0]
    b0 = jax.tree.leaves(restored["lora"])[0]
    np.testing.assert_allclose(np.asarray(a0), np.asarray(b0))


def test_vision_tower_partial_unfreeze(setup):
    import jax.numpy as jnp

    cfg, model, params, batch = setup
    lcfg = LoraConfig(rank=2, alpha=4)
    tx = tr.make_optimizer(tr.TrainConfig(learning_rate=1e-2, total_steps=5))
    step_fn, state = tr.make_lora_train_step(
        model, tx, lcfg, params, vision_unfreeze_last_n=1
    )
    vt_keys = [k for k in state["trainable"] if "vision_tower/blocks" in k]
    assert vt_keys, "vision tower blocks should be trainable"
    before = {k: state["trainable"][k] for k in vt_keys}
    jitted = jax.jit(step_fn)
    state2 = state
    for _ in range(3):  # step past the LR warmup (schedule starts at 0)
        state2, _ = jitted(state2, batch)
    moved_any = False
    for k in vt_keys:
        delta = jnp.abs(state2["trainable"][k] - before[k])
        # only the last layer of the scanned stack moves
        assert float(delta[:-1].max()) == 0.0, k
        moved_any = moved_any or float(delta[-1].max()) > 0
    assert moved_any


def test_grad_accumulation_defers_updates(setup):
    import jax.numpy as jnp

    cfg, model, params, batch = setup
    lcfg = LoraConfig(rank=2, alpha=4)
    tx = tr.make_optimizer(tr.TrainConfig(learning_rate=1e-2, total_steps=10,
                                          grad_accum=2))
    step_fn, state = tr.make_lora_train_step(model, tx, lcfg, params)
    jitted = jax.jit(step_fn)
    before = jax.tree.leaves(state["trainable"])[0]
    state1, _ = jitted(state, batch)
    mid = jax.tree.leaves(state1["trainable"])[0]
    # first micro-step only accumulates; params move after the second
    assert float(jnp.max(jnp.abs(mid - before))) == 0.0
    state2, _ = jitted(state1, batch)
    state3, _ = jitted(state2, batch)
    state4, _ = jitted(state3, batch)
    after = jax.tree.leaves(state4["trainable"])[0]
    assert float(jnp.max(jnp.abs(after - before))) > 0.0
