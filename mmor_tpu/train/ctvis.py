"""CTVIS contrastive ReID loss — static-shape TPU formulation.

Equivalent of the reference ``CTCLPlugin`` + ``loss_reid``
(`dvis_Plus/ctvis.py:643-900`, following IDOL): per batch element, for every
GT instance and every anchor frame j > 0,

- the anchor is the ReID embedding of the query matched to that instance in
  frame j;
- positives are the embeddings of the same instance from frames < j (the
  reference's per-instance memory bank, optionally momentum-averaged);
- negatives are ``num_negatives`` other query embeddings sampled from each
  earlier frame;
- contrastive term: logsumexp over all (pos, neg) pairs of (neg - pos) with
  an appended 0 (multi-positive InfoNCE); aux term: squared error between
  cosine similarity and the 0/1 label.

The reference's python memory bank becomes dense (B, T, N, ...) tensors with
validity masks, so the loss jits; invalid (absent-instance / padded) anchors
contribute zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def ctvis_reid_loss(
    embeds: jax.Array,  # (B, T, Q, C) per-frame ReID embeddings
    assignment: jax.Array,  # (B, T, N) query index per instance (-1 invalid)
    valid: jax.Array,  # (B, T, N) instance visible in that frame
    key: jax.Array,
    num_negatives: int = 8,
    momentum: float | None = None,  # MOMENTUM_EMBED: EMA the positive bank
) -> dict[str, jax.Array]:
    b, t, q, c = embeds.shape
    n = assignment.shape[-1]
    valid = valid & (assignment >= 0)

    # per-instance anchor embeddings per frame: (B, T, N, C)
    inst = jnp.take_along_axis(
        embeds, jnp.maximum(assignment, 0)[..., None], axis=2
    )

    if momentum is not None:
        # momentum memory bank (SimpleTrainMemory with momentum_embed=True):
        # positives are EMA-smoothed per instance; frames where the instance
        # is absent carry the previous bank value forward
        def ema_step(prev, xs):
            cur, ok = xs
            new = momentum * prev + (1.0 - momentum) * cur
            out = jnp.where(ok[..., None], new, prev)
            return out, out

        _, inst_ema = jax.lax.scan(
            ema_step, inst[:, 0],
            (inst.transpose(1, 0, 2, 3), valid.transpose(1, 0, 2)),
        )
        inst = inst_ema.transpose(1, 0, 2, 3)

    # negatives: num_negatives random queries per (frame, instance), avoiding
    # the instance's own query by index shifting
    k_neg = jax.random.randint(key, (b, t, n, num_negatives), 0, q - 1)
    own = jnp.maximum(assignment, 0)[..., None]
    neg_idx = jnp.where(k_neg >= own, k_neg + 1, k_neg)  # skip own query
    emb_exp = jnp.broadcast_to(embeds[:, :, None], (b, t, n, q, c))
    neg = jnp.take_along_axis(emb_exp, neg_idx[..., None], axis=3)
    # (B, T, N, num_negatives, C)

    total_contras = 0.0
    total_aux = 0.0
    total_items = 0.0
    for j in range(1, t):
        anchor = inst[:, j]  # (B, N, C)
        anchor_ok = valid[:, j]  # (B, N)

        pos = inst[:, :j]  # (B, j, N, C)
        pos_ok = valid[:, :j]  # (B, j, N)
        negs = neg[:, :j].transpose(0, 2, 1, 3, 4).reshape(b, n, j * num_negatives, c)
        # negatives come from frames that exist regardless of instance validity
        negs_ok = jnp.ones((b, n, j * num_negatives), bool)

        pos_dot = jnp.einsum("bnc,bjnc->bnj", anchor, pos)  # (B, N, j)
        neg_dot = jnp.einsum("bnc,bnkc->bnk", anchor, negs)  # (B, N, j*K)

        pos_mask = pos_ok.transpose(0, 2, 1)  # (B, N, j)
        diff = neg_dot[:, :, None, :] - pos_dot[..., None]  # (B, N, j, jK)
        pair_ok = pos_mask[..., None] & negs_ok[:, :, None, :]
        diff = jnp.where(pair_ok, diff, NEG_INF)
        flat = diff.reshape(b, n, -1)
        padded = jnp.concatenate(
            [flat, jnp.zeros((b, n, 1), flat.dtype)], axis=-1
        )
        contras = jax.nn.logsumexp(padded, axis=-1)  # (B, N)

        has_pos = jnp.any(pos_mask, axis=-1)
        item_ok = anchor_ok & has_pos
        total_contras += jnp.sum(jnp.where(item_ok, contras, 0.0))

        # aux: squared error of cosine similarity vs 0/1 labels
        a_n = anchor / (jnp.linalg.norm(anchor, axis=-1, keepdims=True) + 1e-6)
        p_n = pos / (jnp.linalg.norm(pos, axis=-1, keepdims=True) + 1e-6)
        g_n = negs / (jnp.linalg.norm(negs, axis=-1, keepdims=True) + 1e-6)
        cos_pos = jnp.einsum("bnc,bjnc->bnj", a_n, p_n)
        cos_neg = jnp.einsum("bnc,bnkc->bnk", a_n, g_n)
        err_pos = jnp.where(pos_mask, (cos_pos - 1.0) ** 2, 0.0)
        err_neg = cos_neg ** 2
        denom = jnp.sum(pos_mask, -1) + cos_neg.shape[-1]
        aux = (jnp.sum(err_pos, -1) + jnp.sum(err_neg, -1)) / jnp.maximum(denom, 1)
        total_aux += jnp.sum(jnp.where(item_ok, aux, 0.0))

        total_items += jnp.sum(item_ok)

    denom = jnp.maximum(total_items, 1.0)
    return {
        "loss_reid": total_contras / denom,
        "loss_aux_reid": total_aux / denom,
    }
