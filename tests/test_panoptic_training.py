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


# ---- tracker/refiner CL reference loss (USE_CL, off in the OR configs) ----

def _loss_reid_oracle(items):
    """Loop re-statement of the reference's loss_reid
    (`dvis_Plus/utils.py:97-150`): per item, contrastive = logsumexp over
    all (pos, neg) pairs of (neg - pos) with an appended 0; aux = mean
    squared (cosine - label)."""
    from scipy.special import logsumexp

    contras, aux = 0.0, 0.0
    for dot, cos, label in items:
        pos = dot[label == 1]
        neg = dot[label == 0]
        pairs = (neg[None, :] - pos[:, None]).ravel()
        contras += logsumexp(np.concatenate([pairs, [0.0]]))
        aux += np.mean((cos - label) ** 2)
    n = max(len(items), 1)
    return contras / n, aux / n


def _norm(x):
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)


def test_cl_ref_loss_matches_reference_loops():
    """Dense cl_ref_loss vs a per-instance loop oracle of get_cl_loss_ref
    (`dvis_Plus/meta_architecture.py:1005-1090`)."""
    from mmor_tpu.train.ctvis import cl_ref_loss

    rng = np.random.default_rng(0)
    t, q, c, n = 4, 6, 8, 3
    refs = rng.standard_normal((1, t, q, c)).astype(np.float32)
    assignment = np.array([[2, 5, 0]], np.int32)
    valid = np.array([[True, True, False]])

    items = []
    r = refs[0]
    for i in range(1, t):
        for inst in range(n):
            if not valid[0, inst]:
                continue
            slot = assignment[0, inst]
            anchor = r[i, slot]
            for src in [i - 1] + ([i + 1] if i < t - 1 else []):
                others = [s for s in range(q) if s != slot]
                pos_neg = np.concatenate([r[src, slot][None], r[src, others]])
                label = np.zeros(q)
                label[0] = 1
                dot = pos_neg @ anchor
                cos = _norm(pos_neg) @ _norm(anchor[None]).T[:, 0]
                items.append((dot, cos, label))
    want_c, want_a = _loss_reid_oracle(items)

    got = cl_ref_loss(jnp.asarray(refs), jnp.asarray(assignment),
                      jnp.asarray(valid))
    np.testing.assert_allclose(float(got["loss_reid"]), want_c, rtol=1e-4)
    np.testing.assert_allclose(float(got["loss_aux_reid"]), want_a, rtol=1e-4)


def test_cl_memory_loss_matches_reference_loops_and_pushes():
    """Dense cl_memory_loss vs a loop oracle of get_cl_loss_with_memory
    (`dvis_Plus/meta_architecture.py:1547-1624`): item 1 per (frame,
    instance) with all-frames positives + same-frame negatives; item 2 adds
    class-memory negatives once the class bank is non-empty; afterwards the
    instance's T embeddings land in its class's ring buffer."""
    from mmor_tpu.train.ctvis import cl_memory_loss, init_class_memory

    rng = np.random.default_rng(1)
    t, q, c, n, k_cls, m_len = 3, 5, 8, 2, 4, 8
    embds = rng.standard_normal((1, t, q, c)).astype(np.float32)
    assignment = np.array([[1, 3]], np.int32)
    valid = np.array([[True, True]])
    labels = np.array([[2, 2]], np.int32)  # same class: pushes must not collide

    memory = init_class_memory(k_cls, m_len, c)

    def oracle(mem_rows_by_cls):
        items = []
        e = embds[0]
        for i in range(t):
            for inst in range(n):
                slot = assignment[0, inst]
                anchor = e[i, slot]
                pos = e[:, slot]  # (T, C)
                others = [s for s in range(q) if s != slot]
                pos_neg = np.concatenate([pos, e[i, others]])
                label = np.zeros(len(pos_neg))
                label[:t] = 1
                dot = pos_neg @ anchor
                cos = _norm(pos_neg) @ _norm(anchor[None]).T[:, 0]
                items.append((dot, cos, label))
                mem_rows = mem_rows_by_cls.get(int(labels[0, inst]), [])
                if len(mem_rows):
                    pos_neg = np.concatenate([pos, np.stack(mem_rows)])
                    label = np.zeros(len(pos_neg))
                    label[:t] = 1
                    dot = pos_neg @ anchor
                    cos = _norm(pos_neg) @ _norm(anchor[None]).T[:, 0]
                    items.append((dot, cos, label))
        return _loss_reid_oracle(items)

    # call 1: empty memory -> item 2 skipped everywhere
    want_c, want_a = oracle({})
    got, mem1 = cl_memory_loss(jnp.asarray(embds), jnp.asarray(assignment),
                               jnp.asarray(valid), jnp.asarray(labels),
                               memory)
    np.testing.assert_allclose(float(got["loss_reid"]), want_c, rtol=1e-4)
    np.testing.assert_allclose(float(got["loss_aux_reid"]), want_a, rtol=1e-4)

    # push check: both instances are class 2 -> 2*T rows, no collision
    assert int(mem1["count"][2]) == 2 * t
    bank2 = np.asarray(mem1["bank"][2])
    want_rows = np.concatenate(
        [embds[0, :, assignment[0, 0]], embds[0, :, assignment[0, 1]]])
    np.testing.assert_allclose(bank2[: 2 * t], want_rows, rtol=1e-5)
    assert float(np.abs(mem1["bank"][0]).max()) == 0.0  # other classes untouched

    # call 2: memory now non-empty -> item 2 participates
    want_c2, want_a2 = oracle({2: list(bank2[: 2 * t])})
    got2, mem2 = cl_memory_loss(jnp.asarray(embds), jnp.asarray(assignment),
                                jnp.asarray(valid), jnp.asarray(labels),
                                mem1)
    np.testing.assert_allclose(float(got2["loss_reid"]), want_c2, rtol=1e-4)
    np.testing.assert_allclose(float(got2["loss_aux_reid"]), want_a2, rtol=1e-4)
    assert int(mem2["count"][2]) == 4 * t  # ring-buffer wraps at m_len


@pytest.mark.parametrize("stage", ["online", "offline"])
def test_use_cl_stage_steps(setup, stage):
    """use_cl=True: both CL-enabled stages step, report finite reid losses,
    and the offline stage's class memory advances in the train state."""
    cfg, model, params, batch = setup
    tcfg = PanopticTrainConfig(
        stage=stage,
        use_cl=True,
        criterion=CriterionConfig.tiny(num_classes=model.cfg.segmenter.decoder.num_classes),
        num_negatives=4,
    )
    step_fn, state, _ = make_panoptic_train_step(model, tcfg, params)
    if stage == "offline":
        assert "cl_memory" in state
    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["total"]))
    assert np.isfinite(float(metrics["loss_reid"]))
    assert np.isfinite(float(metrics["loss_aux_reid"]))
    if stage == "offline":
        # one valid instance of class 1, T frames pushed
        t = batch["targets"]["masks"].shape[2]
        assert int(state2["cl_memory"]["count"][1]) == t
