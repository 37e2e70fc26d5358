"""Piggyback-prefill serving glue: overlap the NEXT batch's LLaMA prefill
with the current batch's decode, inside the decode megakernel.

Measured motivation (docs/ROOFLINE.md): at b40 int4 the decode walk is
DMA-bound (~26 ms/token streaming 8.8 GB of weights+KV) with the MXU
nearly idle, while LLaMA prefill is MXU-bound (~3.1 s/batch). The
reference serves strictly serially — prefill, then lockstep decode
(`scene_graph_helpers/model/scene_graph_prediction_model.py:219-231`,
`main.py:55-60`). Here the prompt tokens of the next batch ride the SAME
weight stream: each decode step carries ``pf_chunk`` (128) consecutive
prompt tokens of one stream as extra matmul rows (mega_decode.py pf
support), so prefill compute hides under the decode DMA shadow and costs
~zero wall-clock.

Pipeline (steady state, per batch of B streams):

  encode (CLIP/pooler/splice -> prompt embeddings)   [serial, ~1.5 s]
  decode batch N x 300 steps                         [~7.9 s]
    step 0..B*nc-1: + piggyback chunk (stream w, chunk j) of batch N+1
      - chunk KV accumulates in a per-stream WORKING cache (~100 MB)
      - at wave end (nc chunks) the working cache flushes into the full
        prefill buffer and the stream's last-token hidden state is kept
  handoff: prefill buffer (T2 columns) repacks into the (donated) decode
  cache layout (t_cap columns), last-token hiddens -> lm_head -> first
  decode tokens of batch N+1.

The working/full prefill buffers live in the kernel's packed KV layouts
(mega_decode.quantize_{k,v}_int4 / models.llama.quantize_kv); repack is
a word-level nibble relayout (no dense int8 intermediate — the dense
unpack of a 7B cache would transiently cost ~4 GB).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mmor_tpu.config import LlamaConfig
from mmor_tpu.ops import mega_decode as md

# ------------------------------------------------------------------ #
# working prefill cache (one stream)
# ------------------------------------------------------------------ #


def alloc_pf_work(cfg: LlamaConfig, t2: int):
    """Zeroed single-stream working cache in the kernel's packed layout."""
    l, h, dh = cfg.n_layers, cfg.n_heads, cfg.head_dim
    if cfg.kv_bits == 4:
        k = jnp.zeros((l, h, dh // 4, t2 // 2), jnp.int32)
        v = jnp.zeros((l, h, t2 // 8, dh), jnp.int32)
    else:
        k = jnp.zeros((l, h, dh // 4, t2), jnp.int32)
        v = jnp.zeros((l, h, t2 // 4, dh), jnp.int32)
    # k_s and v_s must be SEPARATE buffers: both are donated through the
    # overlap step, and XLA rejects donating one buffer twice
    return dict(k=k, k_s=jnp.ones((l, h, t2), jnp.bfloat16),
                v=v, v_s=jnp.ones((l, h, t2), jnp.bfloat16))


def alloc_pf_full(cfg: LlamaConfig, batch: int, t2: int):
    """Zeroed all-streams prefill buffer (flushed into once per wave).
    Scales live (L, H, B, T2) — the decode cache's scale layout."""
    l, h, dh = cfg.n_layers, cfg.n_heads, cfg.head_dim
    if cfg.kv_bits == 4:
        k = jnp.zeros((l, batch, h, dh // 4, t2 // 2), jnp.int32)
        v = jnp.zeros((l, batch, h, t2 // 8, dh), jnp.int32)
    else:
        k = jnp.zeros((l, batch, h, dh // 4, t2), jnp.int32)
        v = jnp.zeros((l, batch, h, t2 // 4, dh), jnp.int32)
    return dict(k=k, k_s=jnp.ones((l, h, batch, t2), jnp.bfloat16),
                v=v, v_s=jnp.ones((l, h, batch, t2), jnp.bfloat16))


def apply_pf_work_update(work: dict, pfout: dict, wp) -> dict:
    """Write a chunk's quantized K/V columns [wp, wp+c) into the working
    cache (the chunk analogue of mega_decode.apply_kv_update).

    ``pfout`` is the kernel's sixth return element: knew/vnew (L, c, H,
    dh) int8 + scales (L, c, H). int4 caches requantize to the 4-bit grid
    and merge as nibbles; chunk slabs never straddle the T-halved side
    boundary (MegaGeometry.validate), so one traced shift covers the slab.
    """
    l, c, h, dh = pfout["knew"].shape
    t2 = work["k_s"].shape[-1]
    int4 = work["k"].shape[-1] == t2 // 2
    knew, vnew = pfout["knew"], pfout["vnew"]
    knew_s, vnew_s = pfout["knew_s"], pfout["vnew_s"]
    if int4:
        half = t2 // 2
        k4 = jnp.clip(jnp.round(knew.astype(jnp.float32) * (7.0 / 127.0)),
                      -7, 7)
        v4 = jnp.clip(jnp.round(vnew.astype(jnp.float32) * (7.0 / 127.0)),
                      -7, 7)
        knew_s = knew_s * (127.0 / 7.0)
        vnew_s = vnew_s * (127.0 / 7.0)
        ku = (k4 + 8).astype(jnp.int32) & 0xF
        vu = (v4 + 8).astype(jnp.int32) & 0xF
        side = wp // half
        ws = wp % half
        shift = side * 4
        # K slab: (L, c, H, dh) -> words (L, H, dh/4, c)
        kb = ku.transpose(0, 2, 3, 1).reshape(l, h, dh // 4, 4, c)
        kword = (kb[..., 0, :] | (kb[..., 1, :] << 8)
                 | (kb[..., 2, :] << 16) | (kb[..., 3, :] << 24))
        old = jax.lax.dynamic_slice(
            work["k"], (0, 0, 0, ws), (l, h, dh // 4, c))
        keep = ~jnp.left_shift(jnp.int32(0x0F0F0F0F), shift)
        k = jax.lax.dynamic_update_slice(
            work["k"], (old & keep) | jnp.left_shift(kword, shift),
            (0, 0, 0, ws))
        # V slab: (L, c, H, dh) -> words (L, H, c/4, dh) at row ws//4
        vb = vu.transpose(0, 2, 1, 3).reshape(l, h, c // 4, 4, dh)
        vword = (vb[..., 0, :] | (vb[..., 1, :] << 8)
                 | (vb[..., 2, :] << 16) | (vb[..., 3, :] << 24))
        oldv = jax.lax.dynamic_slice(
            work["v"], (0, 0, ws // 4, 0), (l, h, c // 4, dh))
        v = jax.lax.dynamic_update_slice(
            work["v"], (oldv & keep) | jnp.left_shift(vword, shift),
            (0, 0, ws // 4, 0))
    else:
        kb = (knew.astype(jnp.int32) & 0xFF).transpose(0, 2, 3, 1).reshape(
            l, h, dh // 4, 4, c)
        kword = (kb[..., 0, :] | (kb[..., 1, :] << 8)
                 | (kb[..., 2, :] << 16) | (kb[..., 3, :] << 24))
        k = jax.lax.dynamic_update_slice(work["k"], kword, (0, 0, 0, wp))
        vb = (vnew.astype(jnp.int32) & 0xFF).transpose(0, 2, 1, 3).reshape(
            l, h, c // 4, 4, dh)
        vword = (vb[..., 0, :] | (vb[..., 1, :] << 8)
                 | (vb[..., 2, :] << 16) | (vb[..., 3, :] << 24))
        v = jax.lax.dynamic_update_slice(work["v"], vword,
                                         (0, 0, wp // 4, 0))
    k_s = jax.lax.dynamic_update_slice(
        work["k_s"], knew_s.transpose(0, 2, 1).astype(work["k_s"].dtype),
        (0, 0, wp))
    v_s = jax.lax.dynamic_update_slice(
        work["v_s"], vnew_s.transpose(0, 2, 1).astype(work["v_s"].dtype),
        (0, 0, wp))
    return dict(k=k, k_s=k_s, v=v, v_s=v_s)


def flush_pf_work(full: dict, work: dict, stream) -> tuple[dict, dict]:
    """Write the finished stream's working cache into the full prefill
    buffer at batch row ``stream`` and return (full, zeroed work)."""
    out = dict(full)
    out["k"] = jax.lax.dynamic_update_slice(
        full["k"], work["k"][:, None], (0, stream, 0, 0, 0))
    out["v"] = jax.lax.dynamic_update_slice(
        full["v"], work["v"][:, None], (0, stream, 0, 0, 0))
    # full scales live (L, H, B, T2); work's are (L, H, T2)
    out["k_s"] = jax.lax.dynamic_update_slice(
        full["k_s"], work["k_s"][:, :, None], (0, 0, stream, 0))
    out["v_s"] = jax.lax.dynamic_update_slice(
        full["v_s"], work["v_s"][:, :, None], (0, 0, stream, 0))
    fresh = dict(k=jnp.zeros_like(work["k"]),
                 k_s=jnp.ones_like(work["k_s"]),
                 v=jnp.zeros_like(work["v"]),
                 v_s=jnp.ones_like(work["v_s"]))
    return out, fresh


# ------------------------------------------------------------------ #
# handoff: prefill buffer (T2 columns) -> decode cache (t_cap columns)
# ------------------------------------------------------------------ #


def repack_k_int4(k2: jax.Array, t2: int, t: int) -> jax.Array:
    """(..., dh/4, T2/2) T-halved words -> (..., dh/4, T/2) words of the
    t-capacity pairing, positions >= T2 zero. Pure word/nibble ops."""
    h2, hh = t2 // 2, t // 2
    lo2 = k2 & 0x0F0F0F0F           # position w
    hi2 = (k2 >> 4) & 0x0F0F0F0F    # position w + t2/2

    def nib(pos0):
        """nibble plane for positions [pos0, pos0 + hh) of the source."""
        parts = []
        n = 0
        while n < hh:
            p = pos0 + n
            if p < h2:
                w = min(hh - n, h2 - p)
                parts.append(lo2[..., p:p + w])
            elif p < t2:
                w = min(hh - n, t2 - p)
                parts.append(hi2[..., p - h2:p - h2 + w])
            else:
                w = hh - n
                parts.append(jnp.zeros(k2.shape[:-1] + (w,), k2.dtype))
            n += w
        return jnp.concatenate(parts, axis=-1)

    return nib(0) | (nib(hh) << 4)


def repack_v_int4(v2: jax.Array, t2: int, t: int) -> jax.Array:
    """(..., T2/8, dh) T-halved words -> (..., T/8, dh) of the t-capacity
    pairing (word row r packs positions {4r..4r+3} of each half)."""
    h2, hh = t2 // 2, t // 2
    lo2 = v2 & 0x0F0F0F0F
    hi2 = (v2 >> 4) & 0x0F0F0F0F

    def rows(pos0):
        parts = []
        n = 0
        while n < hh:
            p = pos0 + n
            if p < h2:
                w = min(hh - n, h2 - p)
                parts.append(lo2[..., p // 4:(p + w) // 4, :])
            elif p < t2:
                w = min(hh - n, t2 - p)
                parts.append(hi2[..., (p - h2) // 4:(p - h2 + w) // 4, :])
            else:
                w = hh - n
                parts.append(jnp.zeros(
                    v2.shape[:-2] + (w // 4,) + v2.shape[-1:], v2.dtype))
            n += w
        return jnp.concatenate(parts, axis=-2)

    return rows(0) | (rows(hh) << 4)


def make_overlap_step(cfg: LlamaConfig, geo: md.MegaGeometry, *,
                      interpret: bool = False, donate: bool = True,
                      force_reference: bool = False,
                      return_logits: bool = False,
                      return_kv: bool = False,
                      update_state: bool = True):
    """Jitted piggyback decode step:

    (head_params, tapes, cache, tok (B,1), work, chunk) ->
        (nxt (B,), cache', work', x_pf (c, D) bf16)

    ``chunk``: x (c, D) bf16 embeddings | pos (c,) int32 rope positions |
    amask (c,) int32 | stream_amask (T2,) int32 (the stream's full
    attention-mask row) | wp scalar int32 (first column of this chunk).
    The decode cache AND the working prefill cache are donated.

    ``return_logits`` appends the (B, V) f32 decode logits;
    ``return_kv`` appends the decode column (knew, knew_s, vnew, vnew_s)
    and the chunk's pf column dict (knew/knew_s/vnew/vnew_s slabs);
    ``update_state=False`` drops cache'/work' from the outputs (never
    donates) — the lockstep observer mode used by the on-chip overlap
    parity check. Output order:
    nxt[, cache', work'], x_pf[, logits][, dec_kv, pf_kv].
    """
    from mmor_tpu.ops.quantized_matmul import int8_matmul_packed

    use_ref = force_reference or (
        interpret is False and jax.devices()[0].platform not in (
            "tpu", "axon"))

    def step(head_params, tapes, cache, tok, work, chunk):
        x = jnp.take(head_params["embed"], tok[:, 0], axis=0
                     ).astype(jnp.bfloat16)
        cos, sin = md.rope_tables(cache["tok_pos"], cfg.head_dim,
                                  cfg.rope_theta)
        pcos, psin = md.rope_tables(chunk["pos"], cfg.head_dim,
                                    cfg.rope_theta)
        t2 = geo.pf_t
        mask_row = (chunk["stream_amask"].astype(jnp.int32)
                    * (jnp.arange(t2) < chunk["wp"]).astype(jnp.int32))
        pf = dict(x=chunk["x"], cos=pcos, sin=psin, amask=chunk["amask"],
                  mask=mask_row, k=work["k"], k_s=work["k_s"],
                  v=work["v"], v_s=work["v_s"])
        run = (md.mega_decode_layers_reference if use_ref
               else functools.partial(md.mega_decode_layers,
                                      interpret=interpret))
        x, knew, knew_s, vnew, vnew_s, pfout = run(
            x, tapes, cache, cos, sin, geo, eps=cfg.norm_eps, pf=pf)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        h = (x32 * jax.lax.rsqrt(var + cfg.norm_eps)
             * head_params["final_norm"].astype(jnp.float32))
        logits = int8_matmul_packed(
            h.astype(jnp.bfloat16), head_params["lm_head_wp"],
            head_params["lm_head_scale"], int8_mxu=cfg.quant_int8_mxu)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        outs = (nxt,)
        if update_state:
            outs += (md.apply_kv_update(cache, knew, knew_s, vnew, vnew_s),
                     apply_pf_work_update(work, pfout, chunk["wp"]))
        outs += (pfout["x"],)
        if return_logits:
            outs += (logits.astype(jnp.float32),)
        if return_kv:
            outs += ((knew, knew_s, vnew, vnew_s),
                     {k: pfout[k] for k in
                      ("knew", "knew_s", "vnew", "vnew_s")})
        return outs

    dn = (2, 4) if (donate and update_state) else ()
    return jax.jit(step, donate_argnums=dn)


class OverlapServer:
    """Serving bundle for piggybacked prefill+decode over SAME-SHAPE batch
    streams. Owns the weight tapes (shared with the plain MegaServer path),
    the jitted overlap/plain steps, and the flush/handoff programs."""

    def __init__(self, cfg: LlamaConfig, lm_params: dict, *, batch: int,
                 t_cap: int, t2: int, chunk: int = 128,
                 interpret: bool = False, force_reference: bool = False):
        self.cfg, self.batch = cfg, batch
        self.t_cap, self.t2, self.chunk = t_cap, t2, chunk
        self.geo = md.MegaGeometry.from_config(cfg, batch=batch,
                                               t_cap=t_cap,
                                               pf_chunk=chunk, pf_t=t2)
        geo_plain = md.MegaGeometry.from_config(cfg, batch=batch,
                                                t_cap=t_cap)
        self.tapes, self.head = md.make_mega_lm(lm_params, self.geo)
        kw = dict(interpret=interpret, force_reference=force_reference)
        self.step_pf = make_overlap_step(cfg, self.geo, **kw)
        self.step_plain = md.make_mega_decode_step(cfg, geo_plain, **kw)
        self.flush = jax.jit(flush_pf_work, donate_argnums=(0, 1))
        from mmor_tpu.ops.quantized_matmul import int8_matmul_packed

        def handoff(old_cache, full, amask, hidden, head_params):
            cache = pf_full_to_decode_cache(full, amask, t_cap, t2)
            h32 = hidden.astype(jnp.float32)
            var = jnp.mean(h32 * h32, axis=-1, keepdims=True)
            h = (h32 * jax.lax.rsqrt(var + cfg.norm_eps)
                 * head_params["final_norm"].astype(jnp.float32))
            logits = int8_matmul_packed(
                h.astype(jnp.bfloat16), head_params["lm_head_wp"],
                head_params["lm_head_scale"], int8_mxu=cfg.quant_int8_mxu)
            tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            fresh = dict(k=jnp.zeros_like(full["k"]),
                         k_s=jnp.ones_like(full["k_s"]),
                         v=jnp.zeros_like(full["v"]),
                         v_s=jnp.ones_like(full["v_s"]))
            return cache, tok0, fresh

        # the retiring batch's decode cache is donated: its buffers become
        # the new cache (same shapes), keeping steady-state HBM at
        # one decode cache + one prefill buffer
        self.handoff = jax.jit(handoff, donate_argnums=(0, 1))


def pf_full_to_decode_cache(full: dict, amask: jax.Array, t_cap: int,
                            t2: int) -> dict:
    """Finished prefill buffer + the batch's (B, P) spliced attention mask
    -> a decode cache dict at ``t_cap`` capacity (the batch handoff).

    Chunk slabs can only land at multiples of pf_chunk, so positions are
    COLUMN indices (left-padded prompts put zeros at masked columns, like
    build_cache's prefill path)."""
    b, p = amask.shape
    int4 = full["k"].shape[-1] == t2 // 2
    if int4:
        k = repack_k_int4(full["k"], t2, t_cap)
        v = repack_v_int4(full["v"], t2, t_cap)
    else:
        k = jnp.pad(full["k"], [(0, 0)] * 4 + [(0, t_cap - t2)])
        v = jnp.pad(full["v"], [(0, 0)] * 3
                    + [(0, (t_cap - t2) // 4), (0, 0)])
    pad_s = [(0, 0)] * 3 + [(0, t_cap - t2)]
    mask = jnp.zeros((b, t_cap), jnp.int32).at[:, :p].set(
        amask.astype(jnp.int32))
    return dict(
        k=k,
        k_s=jnp.pad(full["k_s"], pad_s, constant_values=1.0),
        v=v,
        v_s=jnp.pad(full["v_s"], pad_s, constant_values=1.0),
        kv_mask=mask,
        write_pos=jnp.asarray(p, jnp.int32),
        tok_pos=jnp.sum(amask.astype(jnp.int32), axis=1),
    )
