"""Training losses for MM2SG: token-weighted causal LM cross-entropy.

Parity with the reference's custom ``compute_loss``
(`LLaVA/llava/train/llava_trainer.py:136-174`): shifted CE over
``modified_labels`` with a per-vocab-class weight vector; normalization is the
weighted mean over non-ignored targets (torch ``CrossEntropyLoss(weight=...)``
semantics). Vocab weights follow `train.py:1310-1327`: ``1/(ln(freq)+1)`` for
counted tokens and ``min_weight/100`` for everything else.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.sg.prompts import IGNORE_INDEX


def build_vocab_weights(
    token_freqs: dict[int, float] | None, vocab_size: int
) -> np.ndarray | None:
    """Per-vocab-id CE weights from token-id frequency counts.

    ``token_freqs`` maps token id -> count (the reference maps token *strings*
    through the tokenizer vocab first; do that upstream).
    """
    if not token_freqs:
        return None
    weights_by_id = {tid: 1.0 / (np.log(c) + 1.0) for tid, c in token_freqs.items()}
    extra = min(weights_by_id.values()) / 100.0
    weights = np.full((vocab_size,), extra, dtype=np.float32)
    for tid, w in weights_by_id.items():
        weights[tid] = w
    return weights


def token_weighted_ce(
    logits: jax.Array,  # (B, T, V)
    labels: jax.Array,  # (B, T); IGNORE_INDEX positions excluded
    vocab_weights: jax.Array | None = None,  # (V,)
) -> jax.Array:
    """Shifted causal-LM CE, weighted-mean normalized like torch CE."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    if vocab_weights is not None:
        w = vocab_weights[safe_labels]
    else:
        w = jnp.ones_like(nll)
    w = w * valid
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)
