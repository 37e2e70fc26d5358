"""Referring tracker: ID-preserving query propagation across frames.

Equivalent of the reference ``ReferringTracker_noiser`` + ``Noiser``
(`dvis_Plus/tracker.py:96-381`, `dvis_Plus/noiser.py:8-79`):

- per frame, current queries are aligned to the previous frame's by cosine
  Hungarian matching (``Noiser.match_embds``); during training the alignment
  is stochastically corrupted (rs / wa / cc modes) to teach recovery;
- L layers of [referring cross-attention (query = projected reference,
  value = current frame queries, residual = identity path) -> self-attention
  -> FFN];
- class head on concat(reference, output); masks from a 3-layer MLP dotted
  with 1x1-projected mask features;
- ``state`` carries (last_output, last_frame_embeds) across windows (the
  reference's ``resume`` mechanism) so window inference is a pure fold.

Layouts are batch-first; the frame loop is a python unroll (T is a small
static clip length: 5 train / 3 window inference).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmor_tpu.models.layers import MLP
from mmor_tpu.models.mask2former_decoder import AttentionBlock, FFNBlock
from mmor_tpu.ops.matching import hungarian_match

TrackerState = dict[str, jax.Array]


@dataclass(frozen=True)
class TrackerConfig:
    hidden_dim: int = 256
    ffn_dim: int = 2048
    n_heads: int = 8
    n_layers: int = 6
    mask_dim: int = 256
    num_classes: int = 124
    noise_mode: str = "wa"  # none | rs | wa | cc
    noise_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @classmethod
    def tiny(cls, **kw):
        base = dict(hidden_dim=32, ffn_dim=64, n_heads=4, n_layers=2,
                    mask_dim=32, num_classes=10)
        base.update(kw)
        return cls(**base)


def match_embeddings(ref: jax.Array, cur: jax.Array) -> jax.Array:
    """Cosine Hungarian alignment. ref/cur: (B, Q, C) -> (B, Q) index into cur
    for every ref slot (Noiser.match_embds / MinVIS match_from_embds)."""
    refn = ref / (jnp.linalg.norm(ref, axis=-1, keepdims=True) + 1e-6)
    curn = cur / (jnp.linalg.norm(cur, axis=-1, keepdims=True) + 1e-6)
    cost = 1.0 - jnp.einsum("bqc,brc->bqr", curn, refn)  # (B, cur, ref)
    cost = jnp.nan_to_num(cost, nan=0.0)
    valid = jnp.ones(ref.shape[:2], dtype=bool)
    return hungarian_match(cost, valid)


def apply_noise(
    key: jax.Array,
    indices: jax.Array,  # (B, Q) matched alignment
    cur_no_norm: jax.Array,  # (B, Q, C)
    mode: str,
    noise_ratio: float,
    active: bool,
):
    """Training-time query-order corruption (noiser.py:14-43). Returns
    (indices, init_queries)."""
    b, q, c = cur_no_norm.shape
    aligned = jnp.take_along_axis(cur_no_norm, indices[..., None], axis=1)
    if not active or mode == "none":
        return indices, aligned

    k_act, k_perm, k_w, k_cc = jax.random.split(key, 4)
    perm = jax.vmap(lambda k: jax.random.permutation(k, q))(
        jax.random.split(k_perm, b)
    )  # (B, Q)
    shuffled = jnp.take_along_axis(cur_no_norm, perm[..., None], axis=1)

    if mode == "rs":
        noise_indices, noise_init = perm, shuffled
    elif mode == "wa":
        w = jax.random.uniform(k_w, (b, q, 1))
        noise_init = cur_no_norm * w + shuffled * (1 - w)
        keep = (w[..., 0] >= 0.5)
        noise_indices = jnp.where(keep, jnp.arange(q)[None], perm)
    elif mode == "cc":
        cut = jax.random.randint(k_cc, (b, q, 1), 0, c)
        chan = jnp.arange(c)[None, None, :]
        w = (chan < cut).astype(cur_no_norm.dtype)
        noise_init = cur_no_norm * w + shuffled * (1 - w)
        keep = cut[..., 0] >= c // 2
        noise_indices = jnp.where(keep, jnp.arange(q)[None], perm)
    else:
        raise ValueError(f"unknown noise mode {mode!r}")

    use_noise = jax.random.uniform(k_act, ()) < noise_ratio
    out_indices = jnp.where(use_noise, noise_indices, indices)
    out_init = jnp.where(use_noise, noise_init, aligned)
    return out_indices, out_init


class ReferringTracker(nn.Module):
    cfg: TrackerConfig

    def setup(self):
        cfg = self.cfg
        self.cross_attn = [
            AttentionBlock(cfg.hidden_dim, cfg.n_heads, cfg.dtype, cfg.param_dtype,
                           name=f"cross_attn_{i}")
            for i in range(cfg.n_layers)
        ]
        self.self_attn = [
            AttentionBlock(cfg.hidden_dim, cfg.n_heads, cfg.dtype, cfg.param_dtype,
                           name=f"self_attn_{i}")
            for i in range(cfg.n_layers)
        ]
        self.ffn = [
            FFNBlock(cfg.hidden_dim, cfg.ffn_dim, cfg.dtype, cfg.param_dtype,
                     name=f"ffn_{i}")
            for i in range(cfg.n_layers)
        ]
        self.ref_proj = MLP(cfg.hidden_dim, cfg.hidden_dim, 3, cfg.dtype,
                            cfg.param_dtype, name="ref_proj")
        self.decoder_norm = nn.LayerNorm(dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                                         name="decoder_norm")
        self.class_embed = nn.Dense(cfg.num_classes + 1, dtype=cfg.dtype,
                                    param_dtype=cfg.param_dtype, name="class_embed")
        self.mask_embed = MLP(cfg.hidden_dim, cfg.mask_dim, 3, cfg.dtype,
                              cfg.param_dtype, name="mask_embed")
        self.mask_feature_proj = nn.Dense(cfg.mask_dim, dtype=cfg.dtype,
                                          param_dtype=cfg.param_dtype,
                                          name="mask_feature_proj")

    def _layers(self, init, reference, frame_key, memory, per_layer_reference: bool):
        """One frame's L-layer stack; returns list of per-layer outputs."""
        outs = []
        x = init
        for j in range(self.cfg.n_layers):
            ref = self.ref_proj(x) if (per_layer_reference and j > 0) else reference
            x = self.cross_attn[j](x, ref, frame_key, memory)
            x = self.self_attn[j](x, x, x, x)
            x = self.ffn[j](x)
            outs.append(x)
        return outs

    def __call__(
        self,
        frame_embeds: jax.Array,  # (B, T, Q, C) normalized queries (pred_embds)
        frame_embeds_no_norm: jax.Array,  # (B, T, Q, C)
        mask_features: jax.Array,  # (B, T, H, W, mask_dim)
        state: TrackerState | None = None,  # None -> video start
        noise_key: jax.Array | None = None,
        train: bool = False,
    ):
        cfg = self.cfg
        b, t, q, c = frame_embeds.shape
        mask_features = self.mask_feature_proj(mask_features)

        last_output = None if state is None else state["last_output"]
        last_frame_embeds = None if state is None else state["last_frame_embeds"]

        per_frame_outputs = []  # list over T of list over L of (B, Q, C)
        references = []
        ret_indices = []
        key = noise_key if noise_key is not None else jax.random.PRNGKey(0)

        for i in range(t):
            key, k_noise = jax.random.split(key)
            cur = frame_embeds[:, i]
            cur_nn = frame_embeds_no_norm[:, i]
            first = i == 0 and state is None

            ref_embeds = cur if first else last_frame_embeds
            indices = match_embeddings(ref_embeds, cur)
            indices, init = apply_noise(
                k_noise, indices, cur_nn, cfg.noise_mode, cfg.noise_ratio,
                active=(train and not first),
            )
            ret_indices.append(indices)
            last_frame_embeds = jnp.take_along_axis(cur, indices[..., None], axis=1)

            if first:
                reference = self.ref_proj(cur_nn)
                outs = self._layers(init, reference, cur_nn, cur_nn,
                                    per_layer_reference=True)
            else:
                reference = self.ref_proj(last_output)
                outs = self._layers(init, reference, cur_nn, cur_nn,
                                    per_layer_reference=False)
            references.append(reference)
            last_output = outs[-1]
            per_frame_outputs.append(outs)

        new_state = {"last_output": last_output,
                     "last_frame_embeds": last_frame_embeds}

        # stack: (L, B, T, Q, C) and (B, T, Q, C)
        layer_outputs = jnp.stack(
            [jnp.stack([per_frame_outputs[i][l] for i in range(t)], axis=1)
             for l in range(cfg.n_layers)], axis=0,
        )
        refs = jnp.stack(references, axis=1)  # (B, T, Q, C)

        layers_to_predict = layer_outputs if train else layer_outputs[-1:]
        outs_class, outs_masks, embds = self._predict(
            layers_to_predict, refs, mask_features
        )

        out = {
            "pred_logits": outs_class[-1],  # (B, T, Q, K+1)
            "pred_masks": outs_masks[-1],  # (B, Q, T, H, W)
            "pred_embds": embds,  # (B, T, Q, C) final-layer normalized outputs
            "pred_references": refs,
            "aux_outputs": [
                {"pred_logits": c_, "pred_masks": m_}
                for c_, m_ in zip(outs_class[:-1], outs_masks[:-1])
            ],
            "ret_indices": ret_indices,
        }
        return out, new_state

    def _predict(self, layer_outputs, references, mask_features):
        """layer_outputs: (L, B, T, Q, C); references: (B, T, Q, C);
        mask_features: (B, T, H, W, mask_dim)."""
        x = self.decoder_norm(layer_outputs)
        refs = jnp.broadcast_to(references[None], x.shape)
        cls_in = jnp.concatenate([refs, x], axis=-1)
        outs_class = self.class_embed(cls_in)  # (L, B, T, Q, K+1)
        mask_embed = self.mask_embed(x)
        outs_masks = jnp.einsum("lbtqc,bthwc->lbqthw", mask_embed, mask_features)
        embds = x[-1]  # (B, T, Q, C)
        return outs_class, outs_masks, embds
