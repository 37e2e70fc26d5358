"""Consistent (first-appearance) matching across video frames."""

import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.train.criterion import CriterionConfig, consistent_match


def _outputs(b, t, q, k, h, w, key):
    ks = jax.random.split(key, 2)
    return {
        "pred_logits": jax.random.normal(ks[0], (b, t, q, k + 1)),
        "pred_masks": jax.random.normal(ks[1], (b, q, t, h, w)),
    }


def test_consistent_match_unique_queries():
    cfg = CriterionConfig.tiny()
    b, t, q, h, w = 1, 3, 6, 8, 8
    out = _outputs(b, t, q, cfg.num_classes, h, w, jax.random.PRNGKey(0))
    n = 4
    targets = {
        "labels": jnp.array([[1, 2, 3, 0]], jnp.int32),
        "masks": jax.random.uniform(jax.random.PRNGKey(1), (b, n, t, h, w)),
        "valid": jnp.array([[True, True, True, False]]),
        # instance 0 appears from frame 0; instance 1 from frame 1; 2 from frame 2
        "frame_valid": jnp.array([[[True, True, True],
                                   [False, True, True],
                                   [False, False, True],
                                   [False, False, False]]]),
    }
    assign = np.asarray(
        consistent_match(cfg, out, targets, jax.random.PRNGKey(2))
    )
    assert assign.shape == (1, n)
    assert assign[0, 3] == -1
    real = assign[0, :3]
    assert (real >= 0).all()
    assert len(set(real.tolist())) == 3  # no query reused


def test_consistent_match_prefers_strong_query():
    """A query whose mask/class obviously fits the instance wins the match."""
    cfg = CriterionConfig.tiny()
    b, t, q, h, w = 1, 2, 4, 8, 8
    logits = jnp.full((b, t, q, cfg.num_classes + 1), -5.0)
    masks = jnp.full((b, q, t, h, w), -8.0)
    logits = logits.at[0, :, 2, 3].set(6.0)  # query 2 predicts class 3
    masks = masks.at[0, 2, :, :4].set(8.0)  # and the top half
    out = {"pred_logits": logits, "pred_masks": masks}
    tgt_mask = jnp.zeros((b, 1, t, h, w)).at[0, 0, :, :4].set(1.0)
    targets = {
        "labels": jnp.array([[3]], jnp.int32),
        "masks": tgt_mask,
        "valid": jnp.array([[True]]),
        "frame_valid": jnp.ones((b, 1, t), bool),
    }
    assign = np.asarray(consistent_match(cfg, out, targets, jax.random.PRNGKey(0)))
    assert assign[0, 0] == 2


def test_matcher_outputs_guide_the_match():
    """Costs come from matcher_outputs (the frozen segmenter) when given."""
    cfg = CriterionConfig.tiny()
    b, t, q, h, w = 1, 2, 4, 8, 8
    weak = _outputs(b, t, q, cfg.num_classes, h, w, jax.random.PRNGKey(3))
    guide_logits = jnp.full((b, t, q, cfg.num_classes + 1), -5.0).at[0, :, 1, 5].set(9.0)
    guide_masks = jnp.full((b, q, t, h, w), -8.0).at[0, 1].set(8.0)
    guide = {"pred_logits": guide_logits, "pred_masks": guide_masks}
    targets = {
        "labels": jnp.array([[5]], jnp.int32),
        "masks": jnp.ones((b, 1, t, h, w)),
        "valid": jnp.array([[True]]),
        "frame_valid": jnp.ones((b, 1, t), bool),
    }
    assign = np.asarray(consistent_match(
        cfg, weak, targets, jax.random.PRNGKey(4), matcher_outputs=guide
    ))
    assert assign[0, 0] == 1


def test_device_consistent_match_matches_callback():
    """The on-device auction fallback (no-host-callback runtimes) must agree
    with the scipy greedy-over-frames solver on assignment cost."""
    import numpy as np

    from mmor_tpu.train.criterion import (
        _consistent_match_device, _consistent_solve,
    )

    rng = np.random.default_rng(0)
    for trial in range(10):
        b, t, q, n = 2, 4, 12, 6
        cost = rng.normal(size=(b, t, q, n)).astype(np.float32)
        first = rng.integers(0, t, size=(b, n)).astype(np.int32)
        valid = rng.random((b, n)) < 0.85
        ref = _consistent_solve(cost, first, valid)
        got = np.asarray(_consistent_match_device(
            jnp.asarray(cost), jnp.asarray(first), jnp.asarray(valid)))
        for i in range(b):
            assert np.all(got[i][~valid[i]] == -1)
            rows = got[i][valid[i]]
            assert np.all(rows >= 0)
            assert len(set(rows.tolist())) == len(rows)
            # greedy structure identical -> same per-frame groups; compare
            # total assignment cost (auction is eps-optimal per frame)
            c_got = sum(cost[i, first[i, k], got[i, k], k]
                        for k in range(n) if valid[i, k])
            c_ref = sum(cost[i, first[i, k], ref[i, k], k]
                        for k in range(n) if valid[i, k])
            assert c_got <= c_ref + 1e-2 + 1e-3 * abs(c_ref), (trial, c_got, c_ref)
