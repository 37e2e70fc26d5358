"""Matcher + criterion: point sampling, Hungarian assignment, loss behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.ops.matching import hungarian_match
from mmor_tpu.ops.sampling import point_sample, uncertain_point_coords
from mmor_tpu.train.criterion import (
    CriterionConfig,
    build_class_weights,
    match,
    video_set_criterion,
)


def test_point_sample_center_values():
    # 2x2 image: sampling at pixel centers returns exact values
    img = jnp.array([[[1.0, 2.0], [3.0, 4.0]]])[..., None]  # (1, 2, 2, 1)
    coords = jnp.array([[[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]]])
    out = point_sample(img, coords)[0, :, 0]
    np.testing.assert_allclose(np.asarray(out), [1, 2, 3, 4], atol=1e-6)


def test_point_sample_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    img = rng.standard_normal((3, 7, 5, 2), dtype=np.float32)  # (N, H, W, C)
    coords = rng.uniform(-0.1, 1.1, (3, 9, 2)).astype(np.float32)
    ours = np.asarray(point_sample(jnp.asarray(img), jnp.asarray(coords)))
    timg = torch.from_numpy(img).permute(0, 3, 1, 2)  # (N, C, H, W)
    grid = torch.from_numpy(2 * coords - 1).unsqueeze(1)  # (N, 1, P, 2)
    want = (
        F.grid_sample(timg, grid, mode="bilinear", padding_mode="zeros",
                      align_corners=False)
        .squeeze(2).permute(0, 2, 1).numpy()
    )
    np.testing.assert_allclose(ours, want, atol=1e-5)


def test_uncertain_points_prefer_boundary():
    # logits: strong positive left, strong negative right, boundary at x=0.5
    h = w = 32
    xs = jnp.linspace(-10, 10, w)
    logits = jnp.broadcast_to(xs[None, :], (h, w))[None]  # (1, H, W)
    coords = uncertain_point_coords(jax.random.PRNGKey(0), logits, 64, 4.0, 1.0)
    # all importance-sampled points should hug the uncertain band
    assert float(jnp.mean(jnp.abs(coords[0, :, 0] - 0.5) < 0.2)) > 0.9


def test_hungarian_simple():
    cost = jnp.array([[[0.0, 10.0], [10.0, 0.0], [5.0, 5.0]]])  # (1, Q=3, N=2)
    valid = jnp.array([[True, True]])
    assign = np.asarray(hungarian_match(cost, valid))
    np.testing.assert_array_equal(assign, [[0, 1]])


def test_hungarian_invalid_columns():
    cost = jnp.zeros((2, 4, 3))
    valid = jnp.array([[True, False, False], [False, False, False]])
    assign = np.asarray(hungarian_match(cost, valid))
    assert assign[0, 1] == -1 and assign[0, 2] == -1
    assert (assign[1] == -1).all()
    assert 0 <= assign[0, 0] < 4


def _toy_problem(cfg, key, good=True):
    """One obvious target; prediction either matches it (good) or not."""
    b, q, t, h, w = 1, 4, 2, 16, 16
    n = 3
    tgt_mask = jnp.zeros((b, n, t, h, w)).at[0, 0, :, :8, :8].set(1.0)
    targets = {
        "labels": jnp.array([[2, 0, 0]], jnp.int32),
        "masks": tgt_mask,
        "valid": jnp.array([[True, False, False]]),
    }
    logits = jnp.full((b, q, cfg.num_classes + 1), -4.0)
    logits = logits.at[:, :, cfg.num_classes].set(4.0)  # default: no-object
    masks = jnp.full((b, q, t, h, w), -8.0)
    if good:
        logits = logits.at[0, 1, cfg.num_classes].set(-4.0)
        logits = logits.at[0, 1, 2].set(6.0)
        masks = masks.at[0, 1, :, :8, :8].set(8.0)
    outputs = {"pred_logits": logits, "pred_masks": masks, "aux_outputs": []}
    return outputs, targets


def test_criterion_good_prediction_has_lower_loss():
    cfg = CriterionConfig.tiny()
    key = jax.random.PRNGKey(0)
    out_good, targets = _toy_problem(cfg, key, good=True)
    out_bad, _ = _toy_problem(cfg, key, good=False)
    l_good = video_set_criterion(cfg, out_good, targets, key)["total"]
    l_bad = video_set_criterion(cfg, out_bad, targets, key)["total"]
    assert float(l_good) < float(l_bad)
    assert np.isfinite(float(l_good))


def test_match_assigns_overlapping_query():
    cfg = CriterionConfig.tiny()
    out, targets = _toy_problem(cfg, jax.random.PRNGKey(0), good=True)
    assign = np.asarray(match(cfg, out, targets, jax.random.PRNGKey(1)))
    assert assign[0, 0] == 1  # query 1 carries the matching mask+class


def test_class_weights_layout():
    cfg = CriterionConfig(num_classes=5, eos_coef=0.1)
    w = build_class_weights(cfg)
    assert w.shape == (6,)
    assert float(w[-1]) == pytest.approx(0.1)
    w2 = build_class_weights(
        cfg, class_freqs={0: 100, 1: 10, 2: 0}, weighting="linear"
    )
    assert float(w2[2]) == 0.0
    assert float(w2[1]) == pytest.approx(1.0)  # min nonzero freq -> weight 1
    assert float(w2[0]) == pytest.approx(0.1)


def test_criterion_grads_flow():
    cfg = CriterionConfig.tiny()
    out, targets = _toy_problem(cfg, jax.random.PRNGKey(0), good=True)

    def loss_fn(masks):
        o = dict(out, pred_masks=masks)
        return video_set_criterion(cfg, o, targets, jax.random.PRNGKey(3))["total"]

    g = jax.grad(loss_fn)(out["pred_masks"])
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_loss_labels_padded_targets_do_not_corrupt_queries():
    """Regression: assignment -1 must NOT wrap to the last query (negative
    indices wrap in jax scatters even under mode='drop')."""
    from mmor_tpu.train.criterion import build_class_weights, loss_labels

    cfg = CriterionConfig.tiny()
    b, q, n = 1, 4, 2
    # strong no-object prediction on EVERY query
    logits = jnp.full((b, q, cfg.num_classes + 1), -6.0)
    logits = logits.at[..., cfg.num_classes].set(6.0)
    outputs = {"pred_logits": logits}
    targets = {
        "labels": jnp.array([[3, 0]], jnp.int32),  # padded label is class 0
        "valid": jnp.array([[False, False]]),  # no real targets at all
    }
    assignment = jnp.array([[-1, -1]], jnp.int32)
    w = build_class_weights(cfg)
    loss = loss_labels(cfg, outputs, targets, assignment, w)
    # with no valid targets every query should be supervised as no-object:
    # loss must be tiny; a wrapped scatter would label query 3 as class 0
    assert float(loss) < 0.01, float(loss)
