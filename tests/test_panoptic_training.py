"""Staged panoptic training: each stage steps, freezes the right subtrees."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.models.meta_arch import DVISConfig, DVISPlus
from mmor_tpu.train.criterion import CriterionConfig
from mmor_tpu.train.ctvis import ctvis_reid_loss
from mmor_tpu.train.panoptic_trainer import (
    PanopticTrainConfig,
    make_panoptic_train_step,
)


@pytest.fixture(scope="module")
def setup():
    cfg = DVISConfig.tiny()
    model = DVISPlus(cfg)
    b, t, h, w = 1, 2, 64, 64
    images = jax.random.normal(jax.random.PRNGKey(0), (b * t, h, w, 3))
    params = model.init(jax.random.PRNGKey(1), images, num_frames=t)
    n = 3
    masks = jnp.zeros((b, n, t, 16, 16)).at[:, 0, :, :8, :].set(1.0)
    targets = {
        "labels": jnp.array([[1, 0, 0]], jnp.int32),
        "masks": masks,
        "valid": jnp.array([[True, False, False]]),
    }
    batch = {"images": images, "targets": targets}
    return cfg, model, params, batch


@pytest.mark.parametrize("stage", ["ctvis", "online", "offline"])
def test_stage_steps_and_freezes(setup, stage):
    cfg, model, params, batch = setup
    tcfg = PanopticTrainConfig(
        stage=stage,
        criterion=CriterionConfig.tiny(num_classes=model.cfg.segmenter.decoder.num_classes),
        num_negatives=4,
    )
    step_fn, state, rebuild = make_panoptic_train_step(model, tcfg, params)
    expected = {"ctvis": "segmenter", "online": "tracker", "offline": "refiner"}[stage]
    assert all(expected in k for k in state["trainable"])
    assert len(state["trainable"]) > 0

    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # params actually moved
    # some leaf moved (the first may be a FrozenBN affine, which the
    # d2-parity optimizer groups keep frozen by design)
    moved = max(
        float(jnp.max(jnp.abs(b - a)))
        for b, a in zip(jax.tree.leaves(state["trainable"]),
                        jax.tree.leaves(state2["trainable"]))
    )
    assert moved > 0


def test_reid_loss_separates_good_from_bad():
    """Consistent instance embeddings across frames + distinct negatives ->
    lower loss than random embeddings."""
    key = jax.random.PRNGKey(0)
    b, t, q, c, n = 1, 3, 8, 16, 2
    base = jax.random.normal(key, (b, 1, q, c)) * 4.0
    good = jnp.tile(base, (1, t, 1, 1))  # every query identical across frames
    assignment = jnp.tile(jnp.array([[0, 1]], jnp.int32)[None], (1, t, 1))
    valid = jnp.ones((b, t, n), bool)
    loss_good = ctvis_reid_loss(good, assignment, valid, jax.random.PRNGKey(1),
                                num_negatives=4)
    bad = jax.random.normal(jax.random.PRNGKey(2), (b, t, q, c)) * 4.0
    loss_bad = ctvis_reid_loss(bad, assignment, valid, jax.random.PRNGKey(1),
                               num_negatives=4)
    assert float(loss_good["loss_reid"]) < float(loss_bad["loss_reid"])
    assert float(loss_good["loss_aux_reid"]) < float(loss_bad["loss_aux_reid"])


def test_reid_loss_no_valid_instances_is_zero():
    b, t, q, c, n = 1, 2, 4, 8, 2
    embeds = jax.random.normal(jax.random.PRNGKey(0), (b, t, q, c))
    assignment = jnp.full((b, t, n), -1, jnp.int32)
    valid = jnp.zeros((b, t, n), bool)
    out = ctvis_reid_loss(embeds, assignment, valid, jax.random.PRNGKey(1),
                          num_negatives=2)
    assert float(out["loss_reid"]) == 0.0


def test_online_stage_with_segmenter_guided_matching(setup):
    cfg, model, params, batch = setup
    tcfg = PanopticTrainConfig(
        stage="online",
        match_from_segmenter=True,
        criterion=CriterionConfig.tiny(num_classes=model.cfg.segmenter.decoder.num_classes),
        num_negatives=4,
    )
    step_fn, state, _ = make_panoptic_train_step(model, tcfg, params)
    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["total"]))


def test_reid_momentum_option_runs():
    b, t, q, c, n = 1, 3, 6, 8, 2
    embeds = jax.random.normal(jax.random.PRNGKey(0), (b, t, q, c))
    assignment = jnp.tile(jnp.array([[0, 1]], jnp.int32)[None], (1, t, 1))
    valid = jnp.ones((b, t, n), bool).at[0, 1, 1].set(False)
    out = ctvis_reid_loss(embeds, assignment, valid, jax.random.PRNGKey(1),
                          num_negatives=3, momentum=0.75)
    assert np.isfinite(float(out["loss_reid"]))
    out2 = ctvis_reid_loss(embeds, assignment, valid, jax.random.PRNGKey(1),
                           num_negatives=3)
    assert float(out["loss_reid"]) != float(out2["loss_reid"])
