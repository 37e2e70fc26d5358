"""Pallas deformable-attention sampler: gather -> one-hot matmuls in VMEM.

The XLA gather formulation (ops/deformable_attention.py) is descriptor-rate
bound at ~36 M desc/s on this chip — ~48 ms per frame-layer, 97% of the
panoptic frame time (docs/DESIGN.md §4). The XLA "tiled" core fixes the
arithmetic but materializes ~2.8 GB of one-hot S matrices per layer in HBM
and measures slower. This kernel keeps S in VMEM:

- queries are processed in 2-D spatial tiles sized INVERSELY to their
  level's scale (16x16 / 8x8 / 4x4), so every (query-tile, value-level)
  pair samples inside one fixed (32 rows x 40 cols) value window —
  up-sampling pairs included;
- per grid step (tile, value-level) the window is DMA'd once from
  head-major (M, H, W, D) value maps (x-starts 8-aligned; the 8-col
  alignment slack is inside the 40-col extent);
- bilinear corners + attention weights collapse into a per-head one-hot
  S (TQ, 32*40) built in VMEM registers (bf16, like the gather core's
  weight dtype) and consumed by one (TQ, 1280) x (1280, 32) MXU matmul
  per head; the three value-level steps accumulate into the same
  resident output block;
- samples whose corners fall outside their window (offsets beyond the
  ±8-pixel slack) are dropped from S and recomputed exactly by a
  `lax.cond`-gated pass of the gather core — with reference-scale
  offsets (`ms_deform_attn.py` init: radius <= n_points pixels) the
  overflow set is empty.

Reference semantics: `ms_deform_attn_core_pytorch` (zero padding,
align_corners=False), like the other cores in this package.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WH, WW = 32, 40          # value-window rows / cols (K = WH*WW)
TILE_Q = 16              # query tile edge at the finest query level


def _tile_edges(query_shapes):
    """Query-tile edge per level: scale-proportional so every tile spans
    <= TILE_Q value pixels at the FINEST level."""
    w0 = max(w for _, w in query_shapes)
    return [max(1, TILE_Q * w // w0) for _, w in query_shapes]


def _kernel(meta_ref, iy_ref, ix_ref, wy0_ref, wy1_ref, wx0_ref, wx1_ref,
            *rest, n_levels: int, n_heads: int, tq: int, head_dim: int,
            mm_dtype):
    v_refs = rest[:n_levels]
    out_ref = rest[n_levels]
    win_ref, sem = rest[n_levels + 1], rest[n_levels + 2]
    s = pl.program_id(0)
    lvl = s % n_levels
    f32 = jnp.float32

    # window DMA: head-major (M, H, W, D) -> (M, WH, WW, D) scratch
    ys = meta_ref[s, 0]
    xs = meta_ref[s, 1]
    for li in range(n_levels):
        @pl.when(lvl == li)
        def _(li=li):
            cp = pltpu.make_async_copy(
                v_refs[li].at[:, pl.ds(ys, WH), pl.ds(xs, WW), :],
                win_ref, sem)
            cp.start()
            cp.wait()

    @pl.when(lvl == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    k = WH * WW
    ity = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WH, 1), 2)
    itx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, WW), 3)
    for m in range(n_heads):
        iy = iy_ref[0, m][:, :, None, None]     # (TQ, P, 1, 1)
        ix = ix_ref[0, m][:, :, None, None]
        wy0 = wy0_ref[0, m][:, :, None, None]
        wy1 = wy1_ref[0, m][:, :, None, None]
        wx0 = wx0_ref[0, m][:, :, None, None]
        wx1 = wx1_ref[0, m][:, :, None, None]
        wy_oh = (jnp.where(ity == iy, wy0, 0.0)
                 + jnp.where(ity == iy + 1, wy1, 0.0))   # (TQ, P, WH, 1)
        wx_oh = (jnp.where(itx == ix, wx0, 0.0)
                 + jnp.where(itx == ix + 1, wx1, 0.0))   # (TQ, P, 1, WW)
        s_mat = jnp.sum(wy_oh * wx_oh, axis=1).reshape(tq, k)
        part = jax.lax.dot_general(
            s_mat.astype(mm_dtype),
            win_ref[m].reshape(k, head_dim),
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        out_ref[0, m] += part


def _precompute(loc, attn, query_shapes, spatial_shapes, edges):
    """XLA-side coordinate/weight prep -> per-(tile, level) operand blocks.

    Returns (meta (S,2) i32, coords dict of (S, M, TQ, P) arrays, overflow
    mask (Lq, M, L, P) bool, tile_of_query (for output un-tiling)).
    loc/attn are single-sample: (Lq, M, L, P, 2) / (Lq, M, L, P)."""
    lq, m, n_levels, p, _ = loc.shape
    tq = TILE_Q * TILE_Q
    f32 = jnp.float32

    metas, iys, ixs, wy0s, wy1s, wx0s, wx1s = [], [], [], [], [], [], []
    out_slots = []   # (qlevel, tile row, tile col) per tile
    ovf_chunks = []
    q0 = 0
    for qi, ((hq, wq), edge) in enumerate(zip(query_shapes, edges)):
        n_ty = -(-hq // edge)
        n_tx = -(-wq // edge)
        lq_l = hq * wq
        loc_l = loc[q0:q0 + lq_l].reshape(hq, wq, m, n_levels, p, 2)
        attn_l = attn[q0:q0 + lq_l].reshape(hq, wq, m, n_levels, p)
        pad_y, pad_x = n_ty * edge - hq, n_tx * edge - wq
        # ragged-tile pad queries REPLICATE the edge rows/cols: their
        # attention weights are zero so they contribute nothing, but they
        # participate in the tile's window-anchor min below — a constant
        # center pad (0.5) dragged edge tiles' windows toward the image
        # center at production shapes (92x160 % 16 != 0), kicking every
        # real sample out of its window and re-running the slow gather
        # residual each frame
        loc_l = jnp.pad(loc_l, ((0, pad_y), (0, pad_x)) + ((0, 0),) * 4,
                        mode="edge")
        attn_l = jnp.pad(attn_l, ((0, pad_y), (0, pad_x)) + ((0, 0),) * 3)
        # (n_ty, n_tx, edge*edge, M, L, P, ...)
        loc_t = loc_l.reshape(n_ty, edge, n_tx, edge, m, n_levels, p, 2
                              ).transpose(0, 2, 1, 3, 4, 5, 6, 7
                              ).reshape(n_ty * n_tx, edge * edge, m,
                                        n_levels, p, 2)
        attn_t = attn_l.reshape(n_ty, edge, n_tx, edge, m, n_levels, p
                                ).transpose(0, 2, 1, 3, 4, 5, 6
                                ).reshape(n_ty * n_tx, edge * edge, m,
                                          n_levels, p)
        ovf_t = []
        for lvl, (hv, wv) in enumerate(spatial_shapes):
            ty = (loc_t[..., lvl, :, 1] * hv - 0.5).astype(f32)
            tx = (loc_t[..., lvl, :, 0] * wv - 0.5).astype(f32)
            y0 = jnp.floor(ty)
            x0 = jnp.floor(tx)
            wy1 = ty - y0
            wx1 = tx - x0
            y0i = y0.astype(jnp.int32)
            x0i = x0.astype(jnp.int32)
            aw = attn_t[..., lvl, :]

            ys = jnp.clip(jnp.min(jnp.clip(y0i, 0, hv - 1), axis=(1, 2, 3)),
                          0, max(hv - WH, 0))                 # (ntile,)
            xs = jnp.min(jnp.clip(x0i, 0, wv - 1), axis=(1, 2, 3))
            xs = jnp.clip((xs // 8) * 8, 0, max(wv - WW, 0))

            iy = y0i - ys[:, None, None, None]
            ix = x0i - xs[:, None, None, None]
            yin0 = (iy >= 0) & (iy < WH) & (y0i >= 0) & (y0i < hv)
            yin1 = (iy + 1 >= 0) & (iy + 1 < WH) & (y0i + 1 >= 0) & (y0i + 1 < hv)
            xin0 = (ix >= 0) & (ix < WW) & (x0i >= 0) & (x0i < wv)
            xin1 = (ix + 1 >= 0) & (ix + 1 < WW) & (x0i + 1 >= 0) & (x0i + 1 < wv)
            ovf = ((((y0i >= 0) & (y0i < hv) & ~yin0 & (1.0 - wy1 > 0))
                    | ((y0i + 1 >= 0) & (y0i + 1 < hv) & ~yin1 & (wy1 > 0))
                    | ((x0i >= 0) & (x0i < wv) & ~xin0 & (1.0 - wx1 > 0))
                    | ((x0i + 1 >= 0) & (x0i + 1 < wv) & ~xin1 & (wx1 > 0)))
                   & (aw != 0))
            aw = jnp.where(ovf, 0.0, aw)
            ovf_t.append(ovf)

            pad_q = tq - edge * edge
            def padq(a):
                a = a.transpose(0, 2, 1, 3)  # (ntile, M, q, P)
                return jnp.pad(a, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
            iys.append(padq(jnp.where(yin0 | yin1, iy, -7)))
            ixs.append(padq(jnp.where(xin0 | xin1, ix, -7)))
            wy0s.append(padq(jnp.where(yin0, (1.0 - wy1) * aw, 0.0)))
            wy1s.append(padq(jnp.where(yin1, wy1 * aw, 0.0)))
            wx0s.append(padq(jnp.where(xin0, 1.0 - wx1, 0.0)))
            wx1s.append(padq(jnp.where(xin1, wx1, 0.0)))
            metas.append(jnp.stack([ys, xs], axis=1))
        # (ntile, q, M, L, P) -> (Lq_l, M, L, P) overflow rows
        ovf_all = jnp.stack(ovf_t, axis=3)  # (ntile, q, M, L, P)
        ovf_all = (ovf_all.reshape(n_ty, n_tx, edge, edge, m, n_levels, p)
                   .transpose(0, 2, 1, 3, 4, 5, 6)
                   .reshape(n_ty * edge, n_tx * edge, m, n_levels, p)
                   [:hq, :wq].reshape(lq_l, m, n_levels, p))
        ovf_chunks.append(ovf_all)
        out_slots.append((qi, hq, wq, edge, n_ty, n_tx))
        q0 += lq_l

    # interleave per level: operand row order is (tile-major, level-minor)
    n_l = len(spatial_shapes)
    # per query level we appended n_levels entries each covering all tiles
    # of that level: reshape to (tiles, levels) interleave
    def interleave(chunks, tile_counts):
        out = []
        idx = 0
        for ntile in tile_counts:
            lv = chunks[idx:idx + n_l]
            idx += n_l
            stacked = jnp.stack(lv, axis=1)  # (ntile, L, ...)
            out.append(stacked.reshape(ntile * n_l, *stacked.shape[2:]))
        return jnp.concatenate(out, axis=0)

    tile_counts = [nty * ntx for (_, _, _, _, nty, ntx) in out_slots]
    meta = interleave(metas, tile_counts)
    coords = dict(
        iy=interleave(iys, tile_counts), ix=interleave(ixs, tile_counts),
        wy0=interleave(wy0s, tile_counts), wy1=interleave(wy1s, tile_counts),
        wx0=interleave(wx0s, tile_counts), wx1=interleave(wx1s, tile_counts),
    )
    ovf = jnp.concatenate(ovf_chunks, axis=0)
    return meta, coords, ovf, out_slots


def ms_deform_attn_pallas(
    value: jax.Array,  # (N, S, M, D)
    spatial_shapes: tuple[tuple[int, int], ...],
    sampling_locations: jax.Array,  # (N, Lq, M, L, P, 2)
    attention_weights: jax.Array,  # (N, Lq, M, L, P)
    *,
    query_shapes: tuple[tuple[int, int], ...] | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Pallas tiled deformable attention for grid-organized queries.
    Batch samples run as one pallas_call each (a Python loop over N, not a
    true vmap — trace/HLO size grows with N; panoptic windows are N<=3)."""
    from mmor_tpu.ops.deformable_attention import _masked_gather_core

    if jax.devices()[0].platform not in ("tpu", "axon"):
        interpret = True  # CPU fallback, like the quantized matmuls

    n, s_len, m, d = value.shape
    _, lq, _, n_levels, p, _ = sampling_locations.shape
    if query_shapes is None:
        query_shapes = spatial_shapes
    edges = _tile_edges(query_shapes)
    tq = TILE_Q * TILE_Q
    f32 = jnp.float32

    # head-major padded value maps: (M, H, W, D) per level, padded so any
    # (WH, WW) window starting in-range is in-bounds
    v_levels = []
    start = 0
    for hv, wv in spatial_shapes:
        vl = jax.lax.dynamic_slice_in_dim(value, start, hv * wv, axis=1)
        vl = vl.reshape(n, hv, wv, m, d).transpose(0, 3, 1, 2, 4)
        vl = jnp.pad(vl, ((0, 0), (0, 0), (0, max(0, WH - hv) + WH),
                          (0, max(0, WW - wv) + WW), (0, 0)))
        v_levels.append(vl)  # window/matmul dtype follows the value dtype
        start += hv * wv

    def one_sample(loc, attn, vls):
        meta, coords, ovf, out_slots = _precompute(
            loc, attn, query_shapes, spatial_shapes, edges)
        steps = meta.shape[0]
        n_tiles = steps // n_levels

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, m, tq, p), lambda s, meta: (s, 0, 0, 0)),
                pl.BlockSpec((1, m, tq, p), lambda s, meta: (s, 0, 0, 0)),
                pl.BlockSpec((1, m, tq, p), lambda s, meta: (s, 0, 0, 0)),
                pl.BlockSpec((1, m, tq, p), lambda s, meta: (s, 0, 0, 0)),
                pl.BlockSpec((1, m, tq, p), lambda s, meta: (s, 0, 0, 0)),
                pl.BlockSpec((1, m, tq, p), lambda s, meta: (s, 0, 0, 0)),
            ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_levels,
            out_specs=pl.BlockSpec(
                (1, m, tq, d), lambda s, meta, nl=n_levels: (s // nl, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((m, WH, WW, d), value.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            functools.partial(_kernel, n_levels=n_levels, n_heads=m,
                              tq=tq, head_dim=d, mm_dtype=value.dtype),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles, m, tq, d), f32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(meta, coords["iy"], coords["ix"], coords["wy0"], coords["wy1"],
          coords["wx0"], coords["wx1"], *vls)

        # un-tile: (n_tiles, M, TQ, D) -> (Lq, M, D)
        parts = []
        t0 = 0
        for (qi, hq, wq, edge, n_ty, n_tx) in out_slots:
            nt = n_ty * n_tx
            o = out[t0:t0 + nt, :, :edge * edge]     # (nt, M, e*e, D)
            o = (o.reshape(n_ty, n_tx, m, edge, edge, d)
                  .transpose(0, 3, 1, 4, 2, 5)
                  .reshape(n_ty * edge, n_tx * edge, m, d)
                  [:hq, :wq].reshape(hq * wq, m, d))
            parts.append(o)
            t0 += nt
        return jnp.concatenate(parts, axis=0), ovf

    outs, ovfs = _vmap_fallback(
        one_sample, sampling_locations.astype(f32),
        attention_weights.astype(f32), v_levels)

    def residual(_):
        res = _masked_gather_core(
            value, spatial_shapes, sampling_locations,
            jnp.where(ovfs, attention_weights, 0.0))
        return res.reshape(n, lq, m, d).astype(f32)

    out = outs + jax.lax.cond(
        jnp.any(ovfs), residual, lambda _: jnp.zeros_like(outs), None)
    return out.reshape(n, lq, m * d).astype(value.dtype)


def _vmap_fallback(one_sample, locs, attns, v_levels):
    """vmap over batch with the (batch-indexed) value maps closed over."""
    outs, ovfs = [], []
    for b in range(locs.shape[0]):
        vls = [v[b] for v in v_levels]
        o, f = one_sample(locs[b], attns[b], vls)
        outs.append(o)
        ovfs.append(f)
    return jnp.stack(outs), jnp.stack(ovfs)
