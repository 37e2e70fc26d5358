"""Optimizer param-group semantics vs the reference recipes.

SGG: separate mm_projector LR group + HF decay exclusions
(`LLaVA/llava/train/llava_trainer.py:191-278`). Panoptic: backbone LR
multiplier x norm/embed decay overrides + frozen-BN buffers + full-model
clip (`train_net_video.py:181-260`).
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_mm_projector_lr_group_moves_faster():
    from mmor_tpu.train.trainer import (
        TrainConfig, hf_decay_mask, make_optimizer, mm_projector_labels,
    )

    params = {
        "mm_projector": {"fc": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}},
        "language_model": {"blocks": {"q_proj": {"kernel": jnp.ones((4, 4))}},
                           "attn_norm": {"scale": jnp.ones(4)}},
    }
    labels = mm_projector_labels(params)
    assert labels["mm_projector"]["fc"]["kernel"] == "proj"
    assert labels["language_model"]["blocks"]["q_proj"]["kernel"] == "base"

    mask = hf_decay_mask(params)
    assert mask["mm_projector"]["fc"]["bias"] is False
    assert mask["language_model"]["attn_norm"]["scale"] is False
    assert mask["language_model"]["blocks"]["q_proj"]["kernel"] is True

    cfg = TrainConfig(learning_rate=1e-3, mm_projector_lr=1e-1,
                      total_steps=10, warmup_ratio=0.0, grad_clip=1e9)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    # step 0 sits at the warmup ramp's zero; measure the second step
    updates, opt_state = tx.update(grads, opt_state, params)
    updates, _ = tx.update(grads, opt_state, params)
    proj_step = float(jnp.abs(updates["mm_projector"]["fc"]["kernel"]).mean())
    base_step = float(jnp.abs(
        updates["language_model"]["blocks"]["q_proj"]["kernel"]).mean())
    assert proj_step > 10 * base_step  # 100x LR ratio (cosine-scaled)


def test_panoptic_groups_and_frozen_bn():
    from mmor_tpu.train.panoptic_trainer import (
        PanopticTrainConfig, make_panoptic_optimizer, panoptic_param_labels,
    )

    params = {"segmenter": {
        "backbone": {
            "stem_conv": {"kernel": jnp.ones((3, 3, 3, 8))},
            "stem_bn": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
            "stage0_block0": {"ln1": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
                              "attn": {"rel_pos_bias": jnp.ones((9, 2))}},
        },
        "decoder": {
            "query_feat": jnp.ones((4, 8)),
            "decoder_norm": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
            "class_embed": {"kernel": jnp.ones((8, 5)), "bias": jnp.zeros(5)},
        },
    }}
    labels = panoptic_param_labels(params)
    bb = labels["segmenter"]["backbone"]
    assert bb["stem_conv"]["kernel"] == "bb_base"
    assert bb["stem_bn"]["scale"] == "frozen"
    assert bb["stage0_block0"]["ln1"]["scale"] == "bb_norm"
    assert bb["stage0_block0"]["attn"]["rel_pos_bias"] == "bb_embed"
    dec = labels["segmenter"]["decoder"]
    assert dec["query_feat"] == "embed"
    assert dec["decoder_norm"]["scale"] == "norm"
    assert dec["class_embed"]["kernel"] == "base"

    cfg = PanopticTrainConfig(learning_rate=1e-3, grad_clip=1e9,
                              backbone_multiplier=0.1, weight_decay=0.0)
    tx = make_panoptic_optimizer(cfg)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    bb_step = float(jnp.abs(
        updates["segmenter"]["backbone"]["stem_conv"]["kernel"]).mean())
    base_step = float(jnp.abs(
        updates["segmenter"]["decoder"]["class_embed"]["kernel"]).mean())
    frozen_step = float(jnp.abs(
        updates["segmenter"]["backbone"]["stem_bn"]["scale"]).max())
    assert abs(bb_step - 0.1 * base_step) < 0.02 * base_step
    assert frozen_step == 0.0


def test_panoptic_full_model_clip_is_joint():
    from mmor_tpu.train.panoptic_trainer import (
        PanopticTrainConfig, make_panoptic_optimizer,
    )

    params = {"segmenter": {"decoder": {
        "a": {"kernel": jnp.zeros((2, 2))},
        "b": {"kernel": jnp.zeros((2, 2))},
    }}}
    cfg = PanopticTrainConfig(learning_rate=1.0, grad_clip=0.01, weight_decay=0.0)
    tx = make_panoptic_optimizer(cfg)
    state = tx.init(params)
    grads = jax.tree.map(lambda x: jnp.full_like(x, 100.0), params)
    updates, _ = tx.update(grads, state, params)
    # after a joint clip to 0.01, both subtrees see equally-scaled gradients;
    # adam normalizes magnitude, so just assert finite, nonzero, equal
    ua = np.asarray(updates["segmenter"]["decoder"]["a"]["kernel"])
    ub = np.asarray(updates["segmenter"]["decoder"]["b"]["kernel"])
    assert np.isfinite(ua).all() and np.abs(ua).max() > 0
    np.testing.assert_allclose(ua, ub)
