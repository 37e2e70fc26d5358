"""Video set criterion: Hungarian matching + point-sampled mask losses.

Equivalent of the reference ``VideoHungarianMatcher`` + ``VideoSetCriterion``
(`mask2former_video/modeling/{matcher,criterion}.py`): class cost is
``-prob[target]``; mask/dice costs and losses are computed on sampled points
(uniform for matching, uncertainty-biased for the loss); classification CE
uses a no-object weight ``eos_coef`` and optional class-frequency weights
(`criterion.py:100-157`). Targets use a static capacity ``N`` with a
``valid`` flag so the whole step jits.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.ops.matching import hungarian_match
from mmor_tpu.ops.sampling import point_sample, uncertain_point_coords


@dataclass(frozen=True)
class CriterionConfig:
    num_classes: int = 124
    eos_coef: float = 0.1
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    deep_supervision: bool = True

    @classmethod
    def tiny(cls, **kw):
        base = dict(num_classes=10, num_points=64)
        base.update(kw)
        return cls(**base)


def build_class_weights(
    cfg: CriterionConfig,
    class_freqs: dict[int, float] | None = None,
    weighting: str | tuple | None = None,
) -> jnp.ndarray:
    """(K+1,) CE weights: 1 everywhere, ``eos_coef`` for no-object, optionally
    frequency-derived per-class values (criterion.py:118-151)."""
    w = np.ones((cfg.num_classes + 1,), dtype=np.float32)
    w[-1] = cfg.eos_coef
    if class_freqs and weighting is not None:
        min_freq = min(v for v in class_freqs.values() if v != 0)
        normalized = {int(k): (v / min_freq if v != 0 else 0.0) for k, v in class_freqs.items()}
        for k, v in normalized.items():
            if v == 0:
                w[k] = 0.0
            elif isinstance(weighting, tuple) and weighting[0] == "power_law":
                w[k] = 1.0 / (v ** weighting[1])
            elif weighting == "linear":
                w[k] = 1.0 / v
            elif weighting == "log":
                w[k] = 1.0 / np.log(v + 1.0)
            else:
                raise ValueError(f"unknown weighting {weighting!r}")
    return jnp.asarray(w)


def _sample_masks_shared(masks: jax.Array, coords: jax.Array) -> jax.Array:
    """masks (B, N, T, H, W), coords (B, P, 2) shared per batch elem -> (B, N, T*P)."""
    b, n, t, h, w = masks.shape
    flat = masks.reshape(b * n, t, h, w).transpose(0, 2, 3, 1)  # (BN, H, W, T)
    coords_rep = jnp.repeat(coords, n, axis=0)  # (BN, P, 2)
    sampled = point_sample(flat, coords_rep)  # (BN, P, T)
    return sampled.transpose(0, 2, 1).reshape(b, n, -1)


def match(cfg: CriterionConfig, outputs, targets, key) -> jax.Array:
    """Hungarian assignment -> (B, N) query index per target (-1 if padded).

    Matching is non-differentiable (reference runs it under ``no_grad``).
    """
    outputs = jax.lax.stop_gradient(outputs)
    logits = outputs["pred_logits"].astype(jnp.float32)  # (B, Q, K+1)
    pred_masks = outputs["pred_masks"].astype(jnp.float32)  # (B, Q, T, H, W)
    labels = targets["labels"]  # (B, N)
    tgt_masks = targets["masks"].astype(jnp.float32)  # (B, N, T, H', W')
    valid = targets["valid"]  # (B, N)
    b, q = logits.shape[:2]
    n = labels.shape[1]

    probs = jax.nn.softmax(logits, axis=-1)
    cost_class = -jnp.take_along_axis(
        probs, jnp.maximum(labels, 0)[:, None, :], axis=-1
    )  # (B, Q, N)

    coords = jax.random.uniform(key, (b, cfg.num_points, 2))
    x = _sample_masks_shared(pred_masks, coords)  # (B, Q, T*P)
    t = _sample_masks_shared(tgt_masks, coords)  # (B, N, T*P)
    tp = x.shape[-1]

    pos = jax.nn.softplus(-x)  # cost of predicting 0 where target is 1
    neg = jax.nn.softplus(x)
    cost_mask = (jnp.einsum("bqp,bnp->bqn", pos, t)
                 + jnp.einsum("bqp,bnp->bqn", neg, 1 - t)) / tp

    xs = jax.nn.sigmoid(x)
    inter = 2 * jnp.einsum("bqp,bnp->bqn", xs, t)
    denom = xs.sum(-1)[:, :, None] + t.sum(-1)[:, None, :]
    cost_dice = 1 - (inter + 1) / (denom + 1)

    cost = (cfg.mask_weight * cost_mask
            + cfg.class_weight * cost_class
            + cfg.dice_weight * cost_dice)
    return hungarian_match(cost, valid)


def loss_labels(cfg, outputs, targets, assignment, class_weights) -> jax.Array:
    logits = outputs["pred_logits"].astype(jnp.float32)  # (B, Q, K+1)
    b, q, _ = logits.shape
    target_classes = jnp.full((b, q), cfg.num_classes, jnp.int32)
    # invalid/unmatched targets scatter to index q, which mode="drop"
    # discards (NOT -1: negative indices wrap in jax scatters even with drop)
    safe_assign = jnp.where(
        targets["valid"] & (assignment >= 0), assignment, q
    )
    target_classes = target_classes.at[
        jnp.arange(b)[:, None], safe_assign
    ].set(targets["labels"], mode="drop")
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    w = class_weights[target_classes]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def loss_masks(cfg, outputs, targets, assignment, key) -> tuple[jax.Array, jax.Array]:
    pred = outputs["pred_masks"].astype(jnp.float32)  # (B, Q, T, H, W)
    tgt = targets["masks"].astype(jnp.float32)  # (B, N, T, H', W')
    valid = targets["valid"]
    b, _q, t_frames, h, w = pred.shape
    n = tgt.shape[1]

    src = jnp.take_along_axis(
        pred, jnp.maximum(assignment, 0)[:, :, None, None, None], axis=1
    )  # (B, N, T, H, W)

    # flatten instances x frames into rows like the reference (criterion.py:193-196)
    src_rows = src.reshape(b * n * t_frames, h, w)
    tgt_rows = tgt.reshape(b * n * t_frames, *tgt.shape[-2:])
    coords = uncertain_point_coords(
        key, jax.lax.stop_gradient(src_rows), cfg.num_points,
        cfg.oversample_ratio, cfg.importance_sample_ratio,
    )
    point_logits = point_sample(src_rows[..., None], coords)[..., 0]  # (BNT, P)
    point_labels = point_sample(tgt_rows[..., None], coords)[..., 0]

    row_valid = jnp.repeat((valid & (assignment >= 0)).reshape(-1), t_frames)
    num_masks = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)

    ce = jax.nn.softplus(-point_logits) * point_labels + jax.nn.softplus(point_logits) * (
        1 - point_labels
    )
    loss_mask = jnp.sum(ce.mean(-1) * row_valid) / num_masks

    probs = jax.nn.sigmoid(point_logits)
    inter = 2 * jnp.sum(probs * point_labels, axis=-1)
    denom = jnp.sum(probs, axis=-1) + jnp.sum(point_labels, axis=-1)
    dice = 1 - (inter + 1) / (denom + 1)
    loss_dice = jnp.sum(dice * row_valid) / num_masks
    return loss_mask, loss_dice


def video_set_criterion(
    cfg: CriterionConfig,
    outputs: dict,
    targets: dict,
    key: jax.Array,
    class_weights: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Full criterion with deep supervision. Returns per-term and total losses."""
    if class_weights is None:
        class_weights = build_class_weights(cfg)

    layer_outputs = [outputs]
    if cfg.deep_supervision:
        layer_outputs += list(outputs.get("aux_outputs", ()))

    losses: dict[str, jax.Array] = {}
    total = 0.0
    for i, out in enumerate(layer_outputs):
        key, k_match, k_pts = jax.random.split(key, 3)
        assignment = match(cfg, out, targets, k_match)
        l_ce = loss_labels(cfg, out, targets, assignment, class_weights)
        l_mask, l_dice = loss_masks(cfg, out, targets, assignment, k_pts)
        suffix = "" if i == 0 else f"_{i - 1}"
        losses[f"loss_ce{suffix}"] = l_ce
        losses[f"loss_mask{suffix}"] = l_mask
        losses[f"loss_dice{suffix}"] = l_dice
        total = total + (cfg.class_weight * l_ce
                         + cfg.mask_weight * l_mask
                         + cfg.dice_weight * l_dice)
    losses["total"] = total
    return losses


def frame_costs(cfg: CriterionConfig, outputs, targets, key) -> jax.Array:
    """Per-frame match costs -> (B, T, Q, N).

    outputs: pred_logits (B, T, Q, K+1), pred_masks (B, Q, T, H, W);
    targets: labels (B, N), masks (B, N, T, H', W').
    """
    outputs = jax.lax.stop_gradient(outputs)
    logits = outputs["pred_logits"].astype(jnp.float32)
    pred_masks = outputs["pred_masks"].astype(jnp.float32)
    tgt_masks = targets["masks"].astype(jnp.float32)
    labels = targets["labels"]
    b, t, q, _ = logits.shape
    n = labels.shape[1]

    probs = jax.nn.softmax(logits, axis=-1)
    cost_class = -jnp.take_along_axis(
        probs, jnp.maximum(labels, 0)[:, None, None, :].repeat(t, 1).repeat(q, 2),
        axis=-1,
    )  # (B, T, Q, N)

    coords = jax.random.uniform(key, (b * t, cfg.num_points, 2))
    # per-frame sampling: fold T into batch
    pm = pred_masks.transpose(0, 2, 1, 3, 4).reshape(b * t, q, 1, *pred_masks.shape[-2:])
    tm = tgt_masks.transpose(0, 2, 1, 3, 4).reshape(b * t, n, 1, *tgt_masks.shape[-2:])
    x = _sample_masks_shared(pm, coords)  # (BT, Q, P)
    tgt = _sample_masks_shared(tm, coords)  # (BT, N, P)
    p = x.shape[-1]
    pos = jax.nn.softplus(-x)
    neg = jax.nn.softplus(x)
    cost_mask = (jnp.einsum("bqp,bnp->bqn", pos, tgt)
                 + jnp.einsum("bqp,bnp->bqn", neg, 1 - tgt)) / p
    xs = jax.nn.sigmoid(x)
    inter = 2 * jnp.einsum("bqp,bnp->bqn", xs, tgt)
    denom = xs.sum(-1)[:, :, None] + tgt.sum(-1)[:, None, :]
    cost_dice = 1 - (inter + 1) / (denom + 1)

    cost = (cfg.mask_weight * cost_mask.reshape(b, t, q, n)
            + cfg.class_weight * cost_class
            + cfg.dice_weight * cost_dice.reshape(b, t, q, n))
    return cost


def _consistent_solve(cost: np.ndarray, first_frame: np.ndarray,
                      valid: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    b, t, q, n = cost.shape
    out = np.full((b, n), -1, np.int32)
    for i in range(b):
        used: list[int] = []
        for f in range(t):
            cols = np.nonzero(valid[i] & (first_frame[i] == f))[0]
            if len(cols) == 0:
                continue
            free_rows = np.array([r for r in range(q) if r not in used])
            c = np.nan_to_num(cost[i, f][free_rows][:, cols], nan=1e9)
            rows, assigned = linear_sum_assignment(c)
            for r, a in zip(rows, assigned):
                out[i, cols[a]] = free_rows[r]
                used.append(int(free_rows[r]))
    return out


def _consistent_match_device(cost, first, valid):
    """On-device consistent matching for runtimes without host callbacks:
    frames in order, instances first-appearing at frame f auction-match
    against still-free queries (same greedy-over-frames structure as
    ``_consistent_solve``; each frame's assignment is eps-optimal)."""
    from mmor_tpu.ops.matching import auction_match

    b, t, q, n = cost.shape
    eps = 1e-4 * jnp.maximum(jnp.max(jnp.abs(cost)), 1.0)
    out = jnp.full((b, n), -1, jnp.int32)
    used = jnp.zeros((b, q), bool)
    big = 1e9
    for f in range(t):  # static clip length
        sel = valid & (first == f)  # (B, N)
        # pass eps from the REAL cost scale: the used-query mask inflates
        # the matrix to 1e9 and would wreck the auto-derived eps
        c = jnp.where(used[:, :, None], big, cost[:, f])
        assign = auction_match(c, sel, eps=eps)
        assign = jnp.where(sel, assign, -1)
        out = jnp.where(sel, assign, out)
        hit = jax.nn.one_hot(
            jnp.where(assign >= 0, assign, q), q + 1, dtype=bool
        )[..., :q].any(axis=1)
        used = used | hit
    return out


def consistent_match(
    cfg: CriterionConfig, outputs, targets, key,
    matcher_outputs=None,
) -> jax.Array:
    """DVIS consistent matching: each instance matches once, in its first
    visible frame; the query carries the identity for the whole clip
    (`VideoHungarianMatcher_Consistent`, matcher.py:198-260). When
    ``matcher_outputs`` is given (the frozen segmenter's predictions), costs
    come from it — the reference's segmenter-guided first-half-of-training
    matching (meta_architecture.py:670-677).

    targets need ``frame_valid`` (B, N, T); returns (B, N) query per instance.
    """
    cost_src = matcher_outputs if matcher_outputs is not None else outputs
    cost = frame_costs(cfg, cost_src, targets, key)  # (B, T, Q, N)
    frame_valid = targets["frame_valid"]  # (B, N, T)
    t = frame_valid.shape[-1]
    first = jnp.argmax(frame_valid.astype(jnp.int32), axis=-1)  # (B, N)
    first = jnp.where(jnp.any(frame_valid, -1), first, t)
    b, n = first.shape
    from mmor_tpu.ops.matching import _default_impl

    if _default_impl() == "auction":  # no host callbacks (axon)
        return _consistent_match_device(
            cost.astype(jnp.float32), first, targets["valid"])
    return jax.pure_callback(
        _consistent_solve,
        jax.ShapeDtypeStruct((b, n), jnp.int32),
        cost.astype(jnp.float32), first.astype(jnp.int32),
        targets["valid"].astype(bool),
        vmap_method="sequential",
    )
