"""MM2SG: multimodal scene-graph generator (LLaVA-style) assembled TPU-first.

Equivalent surface to the reference ``LlavaLlamaForCausalLM`` +
``LlavaMetaForCausalLM.prepare_inputs_labels_for_multimodal``
(`LLaVA/llava/model/llava_arch.py:172-353`, `language_model/llava_llama.py`),
redesigned for XLA:

- all views are CLIP-encoded in one fused (B*V) call;
- the BERT pooler fuses views and appends pc/audio/segmask tokens — the
  multimodal block has a *static* token count (``cfg.num_multimodal_tokens``);
- the reference's dynamic embedding splice becomes a fixed-shape gather: each
  prompt carries exactly one ``IMAGE_TOKEN_INDEX`` sentinel and the output
  length is ``T + M - 1`` for every sample (left-padding keeps decode uniform).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmor_tpu.config import MM2SGConfig
from mmor_tpu.models.clip_vit import ClipVisionTower
from mmor_tpu.models.llama import (
    LlamaModel,
    build_cache,
    greedy_decode,
    greedy_decode_hostloop,
    make_decode_step,
)
from mmor_tpu.models.pooler import ImagePooler, MMProjector, SegmaskEncoder
from mmor_tpu.models.ptv3 import PointTransformerV3
from mmor_tpu.sg.prompts import IGNORE_INDEX, IMAGE_TOKEN_INDEX


def splice_multimodal(
    token_embeds: jax.Array,  # (B, T, D) embeddings of ids (sentinel slot arbitrary)
    sentinel_pos: jax.Array,  # (B,) int32 index of IMAGE_TOKEN_INDEX per row
    mm_embeds: jax.Array,  # (B, M, D)
    attention_mask: jax.Array,  # (B, T)
    labels: jax.Array | None = None,  # (B, T) or None
):
    """Replace the sentinel token with the M multimodal embeddings.

    Static-shape equivalent of `llava_arch.py:241-353`: output length is
    always T + M - 1. Returns (embeds, mask, positions_map, labels).
    """
    batch, t, dim = token_embeds.shape
    m = mm_embeds.shape[1]
    t_out = t + m - 1
    j = jnp.arange(t_out)[None, :]  # (1, T_out)
    pos = sentinel_pos[:, None]  # (B, 1)
    is_mm = (j >= pos) & (j < pos + m)
    tok_idx = jnp.where(j < pos, j, jnp.maximum(j - m + 1, 0))  # (B, T_out)
    mm_idx = jnp.clip(j - pos, 0, m - 1)

    gathered_tok = jnp.take_along_axis(token_embeds, tok_idx[..., None], axis=1)
    gathered_mm = jnp.take_along_axis(mm_embeds, mm_idx[..., None], axis=1)
    embeds = jnp.where(is_mm[..., None], gathered_mm, gathered_tok)

    gathered_mask = jnp.take_along_axis(attention_mask, tok_idx, axis=1)
    mask = jnp.where(is_mm, 1, gathered_mask).astype(attention_mask.dtype)

    out_labels = None
    if labels is not None:
        gathered_labels = jnp.take_along_axis(labels, tok_idx, axis=1)
        out_labels = jnp.where(is_mm, IGNORE_INDEX, gathered_labels)
    return embeds, mask, out_labels


def find_sentinel(input_ids: jax.Array) -> jax.Array:
    """Index of the (single) IMAGE_TOKEN_INDEX sentinel per row."""
    return jnp.argmax((input_ids == IMAGE_TOKEN_INDEX).astype(jnp.int32), axis=1)


class MM2SG(nn.Module):
    cfg: MM2SGConfig

    def setup(self):
        cfg = self.cfg
        self.vision_tower = ClipVisionTower(cfg.vision, name="vision_tower")
        self.image_pooler = ImagePooler(cfg.pooler, name="image_pooler")
        self.segmask_encoder = SegmaskEncoder(
            num_classes=cfg.segmask.num_classes,
            embed_dim=cfg.segmask.embed_dim,
            out_dim=cfg.segmask.out_dim,
            dtype=cfg.segmask.dtype,
            param_dtype=cfg.segmask.param_dtype,
            name="segmask_encoder",
        )
        self.mm_projector = MMProjector(
            cfg.llama.dim, dtype=cfg.llama.dtype, param_dtype=cfg.llama.param_dtype,
            name="mm_projector",
        )
        self.language_model = LlamaModel(cfg.llama, name="language_model")
        # PTv3 params materialize on first call with raw clouds; the pooler
        # also accepts precomputed (B, pc_feature_dim) features directly.
        self.point_encoder = nn.vmap(
            PointTransformerV3,
            in_axes=(0, 0),
            out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )(cfg.ptv3, name="point_encoder")

    def encode_pc(self, pc_points: jax.Array, pc_valid: jax.Array) -> jax.Array:
        """(B, P, 6) padded clouds -> (B, pc_feature_dim) pooled features.

        Missing clouds (all-invalid rows) produce zero features, matching the
        reference's zero fallback (builder.py:99-148)."""
        feats = self.point_encoder(pc_points, pc_valid)
        has_points = jnp.any(pc_valid, axis=1)
        return jnp.where(has_points[:, None], feats, 0.0)

    def encode_multimodal(
        self,
        images: jax.Array,  # (B, V, H, W, 3) CLIP-preprocessed pixels
        view_mask: jax.Array,  # (B, V) 1 for present views
        pc_feature: jax.Array | None = None,  # (B, pc_feature_dim) pooled PTv3 feature
        audio_embedding: jax.Array | None = None,  # (B, audio_dim)
        segmasks: jax.Array | None = None,  # (B, n_seg, 32, 32) int class ids
        pc_points: jax.Array | None = None,  # (B, P, 6) raw padded clouds
        pc_valid: jax.Array | None = None,  # (B, P)
    ) -> jax.Array:
        """Images + extra modalities -> (B, M, lm_dim) projected multimodal tokens.

        ``images`` may be CLIP-preprocessed floats (B, V, S, S, 3) or raw
        uint8 frames (B, V, H, W, 3) — raw frames preprocess on-device
        (pad-to-square + bicubic resize + normalize), fusing into the patch
        embedding per BASELINE's fused-preprocessing requirement."""
        cfg = self.cfg
        if images.dtype == jnp.uint8:
            from mmor_tpu.ops.image_preproc import preprocess_views

            images = preprocess_views(images, cfg.vision.image_size)
        if pc_points is not None:
            pc_feature = self.encode_pc(pc_points, pc_valid)
        batch, views = images.shape[:2]
        flat = images.reshape((batch * views,) + images.shape[2:])
        tokens = self.vision_tower(flat)  # (B*V, P, vis_dim)
        per_view = tokens.shape[1]
        tokens = tokens.reshape(batch, views * per_view, -1)
        token_mask = jnp.repeat(view_mask, per_view, axis=1)

        seg_features = None
        if segmasks is not None:
            n_seg = segmasks.shape[1]
            seg_flat = segmasks.reshape((batch * n_seg,) + segmasks.shape[2:])
            seg_features = self.segmask_encoder(seg_flat).reshape(batch, n_seg, -1)

        fused = self.image_pooler(
            tokens,
            token_mask,
            pc_feature=pc_feature,
            audio_embedding=audio_embedding,
            segmask_features=seg_features,
        )
        return self.mm_projector(fused)

    def __call__(
        self,
        input_ids: jax.Array,  # (B, T) with exactly one IMAGE_TOKEN_INDEX each
        attention_mask: jax.Array,  # (B, T)
        images: jax.Array,
        view_mask: jax.Array,
        pc_feature: jax.Array | None = None,
        audio_embedding: jax.Array | None = None,
        segmasks: jax.Array | None = None,
        pc_points: jax.Array | None = None,
        pc_valid: jax.Array | None = None,
        labels: jax.Array | None = None,
        return_cache: bool = False,
        last_logit_only: bool = False,
        prefill_pad_to: int | None = None,
        prefill_cache_buffers=None,
    ):
        """Prefill / training forward. Returns (logits, spliced_labels, aux).

        ``aux`` carries the expanded attention mask and (optionally) the KV
        stack for cache construction.
        """
        mm = self.encode_multimodal(
            images, view_mask, pc_feature, audio_embedding, segmasks,
            pc_points=pc_points, pc_valid=pc_valid,
        )
        sentinel = find_sentinel(input_ids)
        safe_ids = jnp.where(input_ids == IMAGE_TOKEN_INDEX, 0, input_ids)
        token_embeds = self.language_model.embed_tokens(safe_ids)
        embeds, mask, out_labels = splice_multimodal(
            token_embeds, sentinel, mm, attention_mask, labels
        )
        logits, kv = self.language_model(
            input_embeds=embeds, attention_mask=mask,
            last_logit_only=last_logit_only, prefill_pad_to=prefill_pad_to,
            prefill_cache_buffers=prefill_cache_buffers,
        )
        aux = {"attention_mask": mask}
        if return_cache:
            aux["kv"] = kv
        return logits, out_labels, aux

    def encode_prompt(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        images: jax.Array,
        view_mask: jax.Array,
        pc_feature: jax.Array | None = None,
        audio_embedding: jax.Array | None = None,
        segmasks: jax.Array | None = None,
        pc_points: jax.Array | None = None,
        pc_valid: jax.Array | None = None,
    ):
        """Everything of the prefill EXCEPT the LLaMA forward: multimodal
        encode + token embed + splice. Returns (embeds (B, T_out, D),
        mask (B, T_out)) — the inputs the piggyback-prefill path feeds
        chunk by chunk into the decode megakernel (ops/mega_overlap.py)."""
        mm = self.encode_multimodal(
            images, view_mask, pc_feature, audio_embedding, segmasks,
            pc_points=pc_points, pc_valid=pc_valid,
        )
        sentinel = find_sentinel(input_ids)
        safe_ids = jnp.where(input_ids == IMAGE_TOKEN_INDEX, 0, input_ids)
        token_embeds = self.language_model.embed_tokens(safe_ids)
        embeds, mask, _ = splice_multimodal(
            token_embeds, sentinel, mm, attention_mask
        )
        return embeds, mask

    def embed_step_tokens(self, ids: jax.Array) -> jax.Array:
        return self.language_model.embed_tokens(ids)

    def decode_step(self, embeds, positions, cache):
        return self.language_model(
            input_embeds=embeds,
            attention_mask=jnp.ones(embeds.shape[:2], jnp.int32),
            positions=positions,
            cache=cache,
        )


def generate(
    model: MM2SG,
    params: Any,
    batch: dict[str, jax.Array],
    *,
    max_cache_len: int,
    max_new_tokens: int,
    eos_token_id: int,
) -> jax.Array:
    """Greedy generation: prefill with multimodal splice, then KV-cached decode.

    ``batch`` holds input_ids/attention_mask/images/view_mask and optional
    pc_feature/audio_embedding/segmasks. Jit-able end to end; returns
    (B, max_new_tokens) int32 token ids.

    Instead of ``images``, the batch may carry ``raw_views`` — a tuple of V
    per-slot uint8 arrays (B, h_v, w_v, 3) at their native camera
    resolutions. Pad-to-square + bicubic resize + CLIP normalization then run
    on device inside this same jit'd graph (BASELINE's fused-preprocessing
    requirement; the reference does this per-sample in PIL on host,
    `scene_graph_prediction_model.py:117-121`).
    """
    batch = dict(batch)
    if "raw_views" in batch:
        from mmor_tpu.ops.image_preproc import preprocess_views

        size = model.cfg.vision.image_size
        views = [preprocess_views(rv, size).astype(model.cfg.vision.dtype)
                 for rv in batch.pop("raw_views")]
        batch["images"] = jnp.stack(views, axis=1)  # (B, V, S, S, 3)
    logits, _, aux = model.apply(
        params,
        batch["input_ids"],
        batch["attention_mask"],
        batch["images"],
        batch["view_mask"],
        pc_feature=batch.get("pc_feature"),
        audio_embedding=batch.get("audio_embedding"),
        segmasks=batch.get("segmasks"),
        pc_points=batch.get("pc_points"),
        pc_valid=batch.get("pc_valid"),
        return_cache=True,
        last_logit_only=True,  # prefill only needs the next-token logits
    )
    cache = build_cache(
        model.cfg.llama, aux["kv"], aux["attention_mask"], max_cache_len
    )

    lm = LlamaModel(model.cfg.llama)
    lm_params = {"params": params["params"]["language_model"]}

    return greedy_decode(
        lm,
        lm_params,
        logits,
        cache,
        max_new_tokens,
        eos_token_id=eos_token_id,
    )


def alloc_cache_buffers(cfg: MM2SGConfig, batch: int, max_cache_len: int):
    """Preallocated packed KV stacks for the donated-buffer prefill path.
    None for unquantized caches (those flow through build_cache's pad)."""
    lc = cfg.llama
    if not lc.kv_quant:
        return None
    d4 = lc.head_dim // 4
    if lc.mega_decode and lc.kv_bits == 4:
        # T-halved nibble layouts (ops/mega_decode.quantize_{k,v}_int4)
        shape = (lc.n_layers, batch, lc.n_heads, d4, max_cache_len // 2)
        vshape = (lc.n_layers, batch, lc.n_heads, max_cache_len // 8,
                  lc.head_dim)
    else:
        shape = (lc.n_layers, batch, lc.n_heads, d4, max_cache_len)
        vshape = ((lc.n_layers, batch, lc.n_heads, max_cache_len // 4,
                   lc.head_dim) if lc.mega_decode else shape)
    # mega scales live head-major (L, H, B, T) — see ops/mega_decode.py
    sshape = ((lc.n_layers, lc.n_heads, batch, max_cache_len)
              if lc.mega_decode
              else (lc.n_layers, batch, lc.n_heads, max_cache_len))
    return (jnp.zeros(shape, jnp.int32), jnp.ones(sshape, jnp.bfloat16),
            jnp.zeros(vshape, jnp.int32), jnp.ones(sshape, jnp.bfloat16))


def make_prefill(model: MM2SG, *, max_cache_len: int):
    """Jitted multimodal prefill -> (next-token logits, KV cache).

    ``cache_buffers`` (from ``alloc_cache_buffers`` or a previous
    generation's final cache) are DONATED: the prefill writes each layer's
    packed KV into them in place. Allocating the stacks inside the program
    instead leaves a cache-sized HLO temp (the carry cannot alias the
    program output — measured 5.46 GB at b20, the serving OOM).
    """

    def prefill(params, batch, cache_buffers):
        batch = dict(batch)
        if "raw_views" in batch:
            from mmor_tpu.ops.image_preproc import preprocess_views

            size = model.cfg.vision.image_size
            views = [preprocess_views(rv, size).astype(model.cfg.vision.dtype)
                     for rv in batch.pop("raw_views")]
            batch["images"] = jnp.stack(views, axis=1)
        logits, _, aux = model.apply(
            params,
            batch["input_ids"],
            batch["attention_mask"],
            batch["images"],
            batch["view_mask"],
            pc_feature=batch.get("pc_feature"),
            audio_embedding=batch.get("audio_embedding"),
            segmasks=batch.get("segmasks"),
            pc_points=batch.get("pc_points"),
            pc_valid=batch.get("pc_valid"),
            return_cache=True,
            last_logit_only=True,
            prefill_pad_to=max_cache_len,  # cache emitted at capacity, no pad copy
            prefill_cache_buffers=cache_buffers,
        )
        cache = build_cache(
            model.cfg.llama, aux["kv"], aux["attention_mask"], max_cache_len
        )
        return logits, cache

    return jax.jit(prefill, donate_argnums=(2,))


def generate_stepwise(
    model: MM2SG,
    params: Any,
    batch: dict[str, jax.Array],
    *,
    max_cache_len: int,
    max_new_tokens: int,
    eos_token_id: int,
    prefill_fn=None,
    step_fn=None,
    cache_buffers=None,
):
    """Greedy generation as jitted prefill + host-driven donated-cache steps.
    Returns (tokens, recycled_cache_buffers) — feed the buffers back in as
    ``cache_buffers`` for the next batch of the same shape (zero-allocation
    steady state).

    Same contract as ``generate``, but the KV cache is donated between step
    calls instead of carried through a while_loop — on runtimes that don't
    alias while_loop carries (the axon AOT path) this removes per-token
    full-cache copies and halves cache memory. Steps dispatch asynchronously;
    only the final stack syncs.
    """
    lm = LlamaModel(model.cfg.llama)
    lm_params = {"params": params["params"]["language_model"]}
    if prefill_fn is None:
        prefill_fn = make_prefill(model, max_cache_len=max_cache_len)
    if step_fn is None and not model.cfg.llama.mega_decode:
        step_fn = make_decode_step(lm)
    if cache_buffers is None:
        cache_buffers = alloc_cache_buffers(
            model.cfg, batch["input_ids"].shape[0], max_cache_len)
    logits, cache = prefill_fn(params, batch, cache_buffers)
    if model.cfg.llama.mega_decode:
        from mmor_tpu.ops.mega_decode import (
            MegaServer,
            greedy_decode_hostloop_mega,
        )

        server = (step_fn if isinstance(step_fn, MegaServer)
                  else MegaServer(model.cfg.llama, lm_params))
        tokens, final_cache = greedy_decode_hostloop_mega(
            server, logits, cache, max_new_tokens,
            eos_token_id=eos_token_id,
        )
    else:
        tokens, final_cache = greedy_decode_hostloop(
            lm, lm_params, logits, cache, max_new_tokens,
            eos_token_id=eos_token_id, step_fn=step_fn,
        )
    bsz = batch["input_ids"].shape[0]
    if (model.cfg.llama.kv_quant
            and final_cache["kv_mask"].shape[0] == bsz):
        recycled = (final_cache["k"], final_cache["k_s"],
                    final_cache["v"], final_cache["v_s"])
    else:
        # unquantized prefill allocates in-program; an EOS-compacted mega
        # cache shrank its batch axis and can't seed the next prefill
        recycled = None
    return tokens, recycled


def make_encode(model: MM2SG):
    """Jitted prompt encode: (params, batch) -> (embeds (B, T_out, D) bf16,
    mask (B, T_out)) — the prefill minus the LLaMA forward. Feeds the
    piggyback-prefill path (ops/mega_overlap.py)."""

    def encode(params, batch):
        batch = dict(batch)
        if "raw_views" in batch:
            from mmor_tpu.ops.image_preproc import preprocess_views

            size = model.cfg.vision.image_size
            views = [preprocess_views(rv, size).astype(model.cfg.vision.dtype)
                     for rv in batch.pop("raw_views")]
            batch["images"] = jnp.stack(views, axis=1)
        embeds, mask = model.apply(
            params,
            batch["input_ids"],
            batch["attention_mask"],
            batch["images"],
            batch["view_mask"],
            pc_feature=batch.get("pc_feature"),
            audio_embedding=batch.get("audio_embedding"),
            segmasks=batch.get("segmasks"),
            pc_points=batch.get("pc_points"),
            pc_valid=batch.get("pc_valid"),
            method=MM2SG.encode_prompt,
        )
        return embeds.astype(jnp.bfloat16), mask

    return jax.jit(encode)


def generate_overlapped(
    model: MM2SG,
    params: Any,
    batches: list[dict],
    *,
    max_cache_len: int,
    max_new_tokens: int,
    eos_token_id: int,
    chunk: int = 128,
    interpret: bool = False,
    force_reference: bool = False,
    engine_cache: dict | None = None,
):
    """Serve a SEQUENCE of same-shape batches with the next batch's LLaMA
    prefill piggybacked inside the current batch's decode steps.

    The reference serves strictly serially — full prefill, then lockstep
    decode per batch (`scene_graph_prediction_model.py:219-231`). Here only
    batch 0 pays a dedicated prefill; every later batch's prompt rides the
    previous batch's DMA-bound decode on the idle MXU (see
    ops/mega_overlap.py for the measured argument). Returns a list of
    (B, max_new_tokens) int32 token arrays, one per batch, with EOS fill
    after each row's first EOS (same semantics as generate_stepwise without
    early-exit compaction).
    """
    import numpy as np

    from mmor_tpu.ops.mega_overlap import (
        OverlapServer,
        alloc_pf_full,
        alloc_pf_work,
    )

    cfg = model.cfg.llama
    assert cfg.mega_decode, "overlapped serving rides the megakernel"
    b, t_in = batches[0]["input_ids"].shape
    for bt in batches[1:]:
        assert bt["input_ids"].shape == (b, t_in), "batches must share shape"
    t_out = t_in + model.cfg.num_multimodal_tokens - 1
    nc = -(-t_out // chunk)
    align = 256 if cfg.kv_bits == 4 else 128  # lane-tiled working cache
    while (nc * chunk) % align:
        nc += 1
    t2 = nc * chunk
    if nc * b > max_new_tokens - 1:
        raise ValueError(
            f"piggyback needs {nc * b} decode steps for {b} streams x "
            f"{nc} chunks but only {max_new_tokens - 1} are available")
    assert t2 <= max_cache_len

    # jitted programs + weight tapes survive across calls through
    # engine_cache (steady-state serving recompiles nothing)
    ec = engine_cache if engine_cache is not None else {}
    if "server" not in ec:
        lm_params = {"params": params["params"]["language_model"]}
        ec["encode"] = make_encode(model)
        ec["prefill"] = make_prefill(model, max_cache_len=max_cache_len)
        ec["server"] = OverlapServer(
            cfg, lm_params, batch=b, t_cap=max_cache_len, t2=t2,
            chunk=chunk, interpret=interpret,
            force_reference=force_reference)
    encode, prefill, server = ec["encode"], ec["prefill"], ec["server"]
    assert server.t2 == t2 and server.batch == b

    # batch 0: the only dedicated prefill (pipeline fill). The ~10 GB of
    # cache + prefill buffers also persist through engine_cache: frees
    # through the axon tunnel are asynchronous, so back-to-back calls that
    # re-allocated them transiently doubled the footprint and could OOM.
    bufs = ec.pop("bufs", None) or alloc_cache_buffers(
        model.cfg, b, max_cache_len)
    logits, cache = prefill(params, batches[0], bufs)
    tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)

    # work is left re-zeroed by each wave's flush; full rows are fully
    # overwritten before the handoff reads them — reuse both as-is
    work = ec.pop("work", None) or alloc_pf_work(cfg, t2)
    full = ec.pop("full", None) or alloc_pf_full(cfg, b, t2)
    last_row = t_out - 1 - (nc - 1) * chunk  # final-token row in last chunk

    outs = []
    for bi in range(len(batches)):
        nxt = None
        if bi + 1 < len(batches):
            embeds, mask = encode(params, batches[bi + 1])
            pad_t = t2 - embeds.shape[1]
            embeds = jnp.pad(embeds, ((0, 0), (0, pad_t), (0, 0)))
            mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, pad_t)))
            pos = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
            nxt = (embeds, mask, pos)
        toks = [tok]
        hiddens = []
        for i in range(1, max_new_tokens):
            widx, j = (i - 1) // nc, (i - 1) % nc
            if nxt is not None and widx < b:
                ck = dict(
                    x=nxt[0][widx, j * chunk:(j + 1) * chunk],
                    pos=nxt[2][widx, j * chunk:(j + 1) * chunk],
                    amask=nxt[1][widx, j * chunk:(j + 1) * chunk],
                    stream_amask=nxt[1][widx],
                    wp=jnp.asarray(j * chunk, jnp.int32),
                )
                tok, cache, work, x_pf = server.step_pf(
                    server.head, server.tapes, cache, tok[:, None], work, ck)
                if j == nc - 1:
                    full, work = server.flush(full, work,
                                              jnp.asarray(widx, jnp.int32))
                    hiddens.append(x_pf[last_row])
            else:
                tok, cache = server.step_plain(
                    server.head, server.tapes, cache, tok[:, None])
            toks.append(tok)
        out = np.asarray(jnp.stack(toks, axis=1))
        if eos_token_id >= 0:
            for r in range(b):
                hits = np.nonzero(out[r] == eos_token_id)[0]
                if hits.size:
                    out[r, hits[0]:] = eos_token_id
        outs.append(out)
        if nxt is not None:
            hidden = jnp.stack(hiddens)  # (B, D)
            cache, tok, full = server.handoff(cache, full, nxt[1][:, :t_out],
                                              hidden, server.head)
    if engine_cache is not None:
        ec["bufs"] = (cache["k"], cache["k_s"], cache["v"], cache["v_s"])
        ec["work"], ec["full"] = work, full
    return outs
