"""Tracker / refiner / DVIS meta-arch: shapes, state resume, matching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.models.meta_arch import DVISConfig, DVISPlus
from mmor_tpu.models.refiner import RefinerConfig, TemporalRefiner, _replicate_pad_1d
from mmor_tpu.models.tracker import (
    ReferringTracker,
    TrackerConfig,
    apply_noise,
    match_embeddings,
)
from mmor_tpu.eval.video_inference import (
    match_from_embds,
    minvis_post_process,
    run_window_inference,
    vps_inference,
)


def test_match_embeddings_recovers_permutation():
    key = jax.random.PRNGKey(0)
    ref = jax.random.normal(key, (1, 6, 16))
    perm = jnp.array([3, 1, 4, 0, 5, 2])
    cur = ref[:, perm]
    indices = np.asarray(match_embeddings(ref, cur))[0]
    # cur[indices[r]] should equal ref[r]
    np.testing.assert_allclose(np.asarray(cur[0, indices]), np.asarray(ref[0]), atol=1e-6)


def test_apply_noise_inactive_is_identity():
    key = jax.random.PRNGKey(1)
    cur = jax.random.normal(key, (2, 4, 8))
    idx = jnp.tile(jnp.array([2, 0, 3, 1])[None], (2, 1))
    out_idx, out_init = apply_noise(key, idx, cur, "wa", 1.0, active=False)
    np.testing.assert_array_equal(np.asarray(out_idx), np.asarray(idx))
    np.testing.assert_allclose(
        np.asarray(out_init), np.asarray(jnp.take_along_axis(cur, idx[..., None], 1))
    )


@pytest.fixture(scope="module")
def tiny_tracker():
    cfg = TrackerConfig.tiny()
    model = ReferringTracker(cfg)
    b, t, q, c, h, w = 1, 3, 8, cfg.hidden_dim, 16, 16
    key = jax.random.PRNGKey(0)
    embds = jax.random.normal(key, (b, t, q, c))
    mask_features = jax.random.normal(jax.random.PRNGKey(1), (b, t, h, w, cfg.mask_dim))
    params = model.init(jax.random.PRNGKey(2), embds, embds, mask_features)
    return cfg, model, params, embds, mask_features


def test_tracker_shapes_and_state(tiny_tracker):
    cfg, model, params, embds, mask_features = tiny_tracker
    out, state = model.apply(params, embds, embds, mask_features)
    b, t, q, c = embds.shape
    assert out["pred_logits"].shape == (b, t, q, cfg.num_classes + 1)
    assert out["pred_masks"].shape == (b, q, t, 16, 16)
    assert out["pred_embds"].shape == (b, t, q, c)
    assert state["last_output"].shape == (b, q, c)


def test_tracker_window_resume_consistency(tiny_tracker):
    """Processing 3 frames at once == processing 2 then 1 with resumed state."""
    cfg, model, params, embds, mask_features = tiny_tracker
    out_full, _ = model.apply(params, embds, embds, mask_features)

    out_a, state = model.apply(params, embds[:, :2], embds[:, :2], mask_features[:, :2])
    out_b, _ = model.apply(
        params, embds[:, 2:], embds[:, 2:], mask_features[:, 2:], state=state
    )
    np.testing.assert_allclose(
        np.asarray(out_full["pred_logits"][:, 2:]),
        np.asarray(out_b["pred_logits"]),
        atol=1e-4,
    )


def test_tracker_train_mode_has_aux(tiny_tracker):
    cfg, model, params, embds, mask_features = tiny_tracker
    out, _ = model.apply(
        params, embds, embds, mask_features,
        noise_key=jax.random.PRNGKey(3), train=True,
    )
    assert len(out["aux_outputs"]) == cfg.n_layers - 1


def test_replicate_pad():
    x = jnp.arange(3.0)[None, :, None]
    padded = _replicate_pad_1d(x, 5)
    np.testing.assert_array_equal(
        np.asarray(padded[0, :, 0]), [0, 0, 0, 1, 2, 2, 2]
    )


def test_refiner_shapes():
    cfg = RefinerConfig.tiny()
    model = TemporalRefiner(cfg)
    b, t, q, c, h, w = 1, 4, 6, cfg.hidden_dim, 8, 8
    embds = jax.random.normal(jax.random.PRNGKey(0), (b, t, q, c))
    mask_features = jax.random.normal(jax.random.PRNGKey(1), (b, t, h, w, cfg.mask_dim))
    params = model.init(jax.random.PRNGKey(2), embds, embds, mask_features)
    out = model.apply(params, embds, embds, mask_features)
    assert out["pred_logits"].shape == (b, t, q, cfg.num_classes + 1)
    assert out["pred_masks"].shape == (b, q, t, h, w)
    # video-level class: identical logits across frames
    np.testing.assert_allclose(
        np.asarray(out["pred_logits"][:, 0]), np.asarray(out["pred_logits"][:, 1]),
        atol=1e-5,
    )


def test_dvis_full_path():
    cfg = DVISConfig.tiny()
    model = DVISPlus(cfg)
    t, h, w = 2, 64, 64
    images = jax.random.normal(jax.random.PRNGKey(0), (t, h, w, 3))
    params = model.init(jax.random.PRNGKey(1), images, num_frames=t)
    out, state = model.apply(params, images, num_frames=t)
    q = cfg.segmenter.decoder.num_queries
    assert out["pred_masks"].shape[1] == q
    assert state["last_output"].shape == (1, q, cfg.tracker.hidden_dim)


def test_minvis_post_process_aligns():
    rng = np.random.default_rng(0)
    q, c, h, w = 5, 8, 4, 4
    embds0 = rng.standard_normal((q, c))
    perm = np.array([2, 0, 4, 1, 3])
    logits = rng.standard_normal((2, q, 3))
    logits[1] = logits[0][perm]
    masks = rng.standard_normal((2, q, h, w))
    masks[1] = masks[0][perm]
    embds = np.stack([embds0, embds0[perm]])
    avg_logits, aligned = minvis_post_process(logits, masks, embds)
    np.testing.assert_allclose(aligned[:, 1], aligned[:, 0], atol=1e-6)
    np.testing.assert_allclose(avg_logits, logits[0], atol=1e-6)


def test_window_inference_folds_state():
    calls = []

    def step(window, state):
        calls.append((window.shape[0], state))
        n = 0 if state is None else state
        return {"frame_idx": np.arange(len(window)) + n}, n + len(window)

    frames = np.zeros((7, 2, 2, 3))
    out = run_window_inference(step, frames, window_size=3)
    np.testing.assert_array_equal(out["frame_idx"], np.arange(7))
    assert len(calls) == 3
    assert calls[0][1] is None and calls[1][1] == 3


def test_vps_inference_builds_panoptic_map():
    q, t, h, w = 3, 2, 8, 8
    pred_cls = np.full((q, 5), -5.0)  # 4 classes + no-object
    pred_masks = np.full((q, t, h, w), -10.0)
    # query 0: thing class 1, left half; query 1: stuff class 3, right half
    pred_cls[0, 1] = 5.0
    pred_cls[1, 3] = 5.0
    pred_cls[2, 4] = 5.0  # no-object
    pred_masks[0, :, :, :4] = 10.0
    pred_masks[1, :, :, 4:] = 10.0
    out = vps_inference(
        pred_cls, pred_masks, np.arange(q), num_classes=4, num_thing_classes=2
    )
    seg = out["pred_masks"]
    assert set(np.unique(seg)) == {1, 2}
    assert len(out["segments_infos"]) == 2
    assert out["segments_infos"][0]["isthing"] is True
    assert out["segments_infos"][1]["isthing"] is False
