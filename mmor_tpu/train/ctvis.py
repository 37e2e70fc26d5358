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


def _item_losses(pos_dot, neg_dot, cos_pos, cos_neg, pos_ok, neg_ok):
    """Shared loss_reid item math (`dvis_Plus/utils.py:97-150`), dense.

    pos/neg_dot: (..., P) / (..., K) anchor dot products; cos_*: cosine
    versions; *_ok: validity masks. Returns (contras, aux) per item (...,).
    contras = logsumexp over all valid (pos, neg) pairs of (neg - pos) with
    an appended 0; aux = mean((cos - label)^2) over valid entries.
    """
    diff = neg_dot[..., None, :] - pos_dot[..., :, None]  # (..., P, K)
    pair_ok = pos_ok[..., :, None] & neg_ok[..., None, :]
    diff = jnp.where(pair_ok, diff, NEG_INF)
    flat = diff.reshape(*diff.shape[:-2], -1)
    padded = jnp.concatenate(
        [flat, jnp.zeros((*flat.shape[:-1], 1), flat.dtype)], axis=-1)
    contras = jax.nn.logsumexp(padded, axis=-1)

    err_pos = jnp.where(pos_ok, (cos_pos - 1.0) ** 2, 0.0)
    err_neg = jnp.where(neg_ok, cos_neg ** 2, 0.0)
    denom = jnp.sum(pos_ok, -1) + jnp.sum(neg_ok, -1)
    aux = (jnp.sum(err_pos, -1) + jnp.sum(err_neg, -1)) / jnp.maximum(denom, 1)
    return contras, aux


def _unit(x, axis=-1):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + 1e-6)


def cl_ref_loss(
    refs: jax.Array,  # (B, T, Q, C) tracker pred_references
    assignment: jax.Array,  # (B, N) query index per instance (-1 invalid)
    valid: jax.Array,  # (B, N)
) -> dict[str, jax.Array]:
    """Tracker-stage contrastive reference loss — ``get_cl_loss_ref``
    (`dvis_Plus/meta_architecture.py:1005-1090`), dense/static-shape.

    Per anchor frame i >= 1 and matched instance: the anchor is that
    instance's reference embedding at frame i; one item per temporal
    direction — positives are the SAME query slot at frame i-1 (and i+1
    when it exists), negatives are the other Q-1 slots of that neighbor
    frame. The reference builds these items with python loops over the
    per-frame match result; DVIS matching is consistent across the clip, so
    the (B, N) consistent assignment yields identical indices."""
    b, t, q, c = refs.shape
    n = assignment.shape[-1]
    ok = valid & (assignment >= 0)
    a = jnp.maximum(assignment, 0)  # (B, N)

    # per-instance reference embeddings per frame: (B, T, N, C)
    inst = jnp.take_along_axis(refs, a[:, None, :, None], axis=2)
    inst_u = _unit(inst)
    refs_u = _unit(refs)
    # not-own-slot mask: (B, N, Q)
    not_own = jnp.arange(q)[None, None, :] != a[..., None]

    total_c = 0.0
    total_a = 0.0
    total_items = 0.0
    for d in (-1, +1):
        if t < 2:
            break
        if d == -1:
            anchors, anchors_u = inst[:, 1:], inst_u[:, 1:]      # i in 1..T-1
            nb, nb_u = refs[:, :-1], refs_u[:, :-1]              # frame i-1
            pos, pos_u = inst[:, :-1], inst_u[:, :-1]
        else:
            if t < 3:
                continue
            anchors, anchors_u = inst[:, 1:-1], inst_u[:, 1:-1]  # i in 1..T-2
            nb, nb_u = refs[:, 2:], refs_u[:, 2:]                # frame i+1
            pos, pos_u = inst[:, 2:], inst_u[:, 2:]
        ti = anchors.shape[1]
        pos_dot = jnp.sum(anchors * pos, -1)[..., None]          # (B,ti,N,1)
        neg_dot = jnp.einsum("btnc,btqc->btnq", anchors, nb)     # (B,ti,N,Q)
        cos_pos = jnp.sum(anchors_u * pos_u, -1)[..., None]
        cos_neg = jnp.einsum("btnc,btqc->btnq", anchors_u, nb_u)
        pos_ok = jnp.broadcast_to(ok[:, None, :, None], (b, ti, n, 1))
        neg_ok = jnp.broadcast_to(not_own[:, None], (b, ti, n, q))
        contras, aux = _item_losses(
            pos_dot, neg_dot, cos_pos, cos_neg, pos_ok, neg_ok)
        item_ok = jnp.broadcast_to(ok[:, None], (b, ti, n))
        total_c += jnp.sum(jnp.where(item_ok, contras, 0.0))
        total_a += jnp.sum(jnp.where(item_ok, aux, 0.0))
        total_items += jnp.sum(item_ok)

    denom = jnp.maximum(total_items, 1.0)
    return {"loss_reid": total_c / denom, "loss_aux_reid": total_a / denom}


def init_class_memory(num_classes: int, max_len: int, dim: int,
                      dtype=jnp.float32):
    """Cross-video per-class reference memory — ``Outputs_Memory_PerClasses``
    (`dvis_Plus/utils.py:6-52`) as a fixed-shape ring buffer: the
    reference's python list + shuffle-truncate becomes (K, max_len, C)
    slots with a monotone per-class write counter (oldest-overwrite)."""
    return {
        "bank": jnp.zeros((num_classes, max_len, dim), dtype),
        "count": jnp.zeros((num_classes,), jnp.int32),
    }


def cl_memory_loss(
    embds: jax.Array,  # (B, T, Q, C) refiner pred_embds
    assignment: jax.Array,  # (B, N)
    valid: jax.Array,  # (B, N)
    labels: jax.Array,  # (B, N) class ids
    memory: dict,
) -> tuple[dict[str, jax.Array], dict]:
    """Refiner-stage contrastive loss with cross-video class memory —
    ``get_cl_loss_with_memory`` (`dvis_Plus/meta_architecture.py:1547-1624`).

    Per frame i and matched instance: item 1 pairs the anchor against its
    own slot across ALL T frames (positives) and the frame's other Q-1
    slots (negatives); item 2 uses the class memory's stored references of
    the SAME class from earlier clips as negatives (skipped while the class
    bank is empty, like the reference). Afterwards the instance's T
    embeddings are pushed into its class's ring buffer. Returns
    (losses, new_memory) — thread the memory through the train state."""
    b, t, q, c = embds.shape
    n = assignment.shape[-1]
    k_cls, m_len = memory["bank"].shape[:2]
    ok = valid & (assignment >= 0)
    a = jnp.maximum(assignment, 0)
    cls = jnp.clip(labels, 0, k_cls - 1)

    inst = jnp.take_along_axis(embds, a[:, None, :, None], axis=2)  # (B,T,N,C)
    inst_u = _unit(inst)
    embds_u = _unit(embds)
    not_own = jnp.arange(q)[None, None, :] != a[..., None]  # (B, N, Q)

    # positives are shared by both items: own slot across all T frames
    anchors, anchors_u = inst, inst_u              # (B, T, N, C)
    pos_dot = jnp.einsum("btnc,bsnc->btns", anchors,
                         inst)                     # (B, T, N, T)
    cos_pos = jnp.einsum("btnc,bsnc->btns", anchors_u, inst_u)
    pos_ok = jnp.broadcast_to(ok[:, None, :, None], (b, t, n, t))

    # item 1 negatives: the frame's other slots
    neg_dot = jnp.einsum("btnc,btqc->btnq", anchors, embds)
    cos_neg = jnp.einsum("btnc,btqc->btnq", anchors_u, embds_u)
    neg_ok = jnp.broadcast_to(not_own[:, None], (b, t, n, q))
    contras1, aux1 = _item_losses(
        pos_dot, neg_dot, cos_pos, cos_neg, pos_ok, neg_ok)
    item_ok = jnp.broadcast_to(ok[:, None], (b, t, n))
    total_c = jnp.sum(jnp.where(item_ok, contras1, 0.0))
    total_a = jnp.sum(jnp.where(item_ok, aux1, 0.0))
    total_items = jnp.sum(item_ok)

    # item 2 negatives: the class bank's stored references (same class,
    # earlier clips); valid slots = min(count, max_len)
    bank = memory["bank"].astype(embds.dtype)
    mem = bank[cls]                                  # (B, N, M, C)
    mem_valid = (jnp.arange(m_len)[None, None, :]
                 < jnp.minimum(memory["count"][cls], m_len)[..., None])
    mneg_dot = jnp.einsum("btnc,bnmc->btnm", anchors, mem)
    mcos_neg = jnp.einsum("btnc,bnmc->btnm", anchors_u, _unit(mem))
    mneg_ok = jnp.broadcast_to(mem_valid[:, None], (b, t, n, m_len))
    contras2, aux2 = _item_losses(
        pos_dot, mneg_dot, cos_pos, mcos_neg, pos_ok, mneg_ok)
    item2_ok = item_ok & jnp.any(mem_valid, -1)[:, None]
    total_c += jnp.sum(jnp.where(item2_ok, contras2, 0.0))
    total_a += jnp.sum(jnp.where(item2_ok, aux2, 0.0))
    total_items += jnp.sum(item2_ok)

    # push_refiner: append each matched instance's T embeddings to its
    # class's ring buffer (sequential over instances — same-class
    # instances must not collide)
    def push_one(mem_state, bn):
        bank, count = mem_state
        bi, ni = bn // n, bn % n
        k = cls[bi, ni]
        emb = jax.lax.stop_gradient(inst[bi, :, ni]).astype(bank.dtype)
        slots = (count[k] + jnp.arange(t)) % m_len
        new_rows = bank[k].at[slots].set(emb)
        upd = ok[bi, ni]
        bank = bank.at[k].set(jnp.where(upd, new_rows, bank[k]))
        count = count.at[k].add(jnp.where(upd, t, 0))
        return (bank, count), None

    (new_bank, new_count), _ = jax.lax.scan(
        push_one, (memory["bank"], memory["count"]), jnp.arange(b * n))

    denom = jnp.maximum(total_items, 1.0)
    return (
        {"loss_reid": total_c / denom, "loss_aux_reid": total_a / denom},
        {"bank": new_bank, "count": new_count},
    )
