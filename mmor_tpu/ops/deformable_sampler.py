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
- value maps are stored HEAD-GROUPED: (G, H, W, hpg*D) with hpg = 128//D
  heads side by side on the lane dim, so the minor dim is a whole
  128-lane tile. Mosaic's HBM window DMA requires the sliced memref's
  minor dim to be tile-aligned ("Slice shape along dimension 3 must be
  aligned to tiling (128)") — a head-major (M, H, W, D=32) layout is
  un-DMA-able. Per grid step (tile, value-level) one (G, 32, 40, 128)
  window is DMA'd (x-starts 8-aligned; the alignment slack is inside
  the 40-col extent);
- bilinear corners + attention weights collapse into a per-head one-hot
  S (32*40, TQ) built transposed in VMEM registers and consumed by one
  lhs-contracted (1280, TQ) x (1280, 128) MXU matmul per head against
  the head's GROUP window; the head's own D-lane block of the product
  is mask-accumulated into the output (the other lanes are that S
  applied to sibling heads' values — discarded). Lane width is 128
  either way on the MXU, so the masked form costs no extra cycles. The
  three value-level steps accumulate into the same resident block;
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
            n_groups: int, hpg: int, mm_dtype):
    v_refs = rest[:n_levels]
    out_ref = rest[n_levels]
    win_ref, sem = rest[n_levels + 1], rest[n_levels + 2]
    s = pl.program_id(0)
    lvl = s % n_levels
    f32 = jnp.float32
    lanes = hpg * head_dim

    # window DMA: head-grouped (G, H, W, hpg*D) -> (G, WH, WW, hpg*D)
    # scratch; the minor dim is a whole number of 128-lane tiles. meta
    # stores xs/8 and the x8 happens HERE: bf16 HBM memrefs are
    # (8,128)(2,1)-tiled (W is a sublane dim) and Mosaic must PROVE the
    # dynamic slice offset divisible by 8 — it can for x*8, not for a
    # loaded scalar ("Failed to prove that a tile index in dimension 2 is
    # divisible by the tiling (8)").
    ys = meta_ref[s, 0]
    xs = meta_ref[s, 1] * 8
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

    # S is built TRANSPOSED — (WH, WW, TQ), queries on the lane dim — so the
    # (WH, WW) merge is a leading/sublane-dim collapse, which Mosaic's
    # layout inference supports; the natural (TQ, WH, WW) -> (TQ, K) form is
    # a lane-dim merge and fails to compile on this chip
    # ("infer-vector-layout: unsupported shape cast" —
    # tools/perf/probe_mosaic_reshape.py isolates both forms). The matmul
    # then contracts lhs dim 0 (lhs-transposed), which Mosaic lowers
    # natively.
    k = WH * WW
    ity = jax.lax.broadcasted_iota(jnp.int32, (1, WH, 1, 1), 1)
    itx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WW, 1), 2)
    lane_head = jax.lax.broadcasted_iota(
        jnp.int32, (tq, lanes), 1) // head_dim        # lane -> head-in-group
    for g in range(n_groups):
        win_k = win_ref[g].reshape(k, lanes)          # sublane merge (legal)
        for h in range(hpg):
            m = g * hpg + h
            if m >= n_heads:
                break
            iy = iy_ref[0, m][:, None, None, :]     # (P, 1, 1, TQ)
            ix = ix_ref[0, m][:, None, None, :]
            wy0 = wy0_ref[0, m][:, None, None, :]
            wy1 = wy1_ref[0, m][:, None, None, :]
            wx0 = wx0_ref[0, m][:, None, None, :]
            wx1 = wx1_ref[0, m][:, None, None, :]
            wy_oh = (jnp.where(ity == iy, wy0, 0.0)
                     + jnp.where(ity == iy + 1, wy1, 0.0))  # (P, WH, 1, TQ)
            wx_oh = (jnp.where(itx == ix, wx0, 0.0)
                     + jnp.where(itx == ix + 1, wx1, 0.0))  # (P, 1, WW, TQ)
            s_t = jnp.sum(wy_oh * wx_oh, axis=0)            # (WH, WW, TQ)
            # HIGHEST only for f32 operands: they otherwise get ONE bf16
            # MXU pass (6.5e-3 abs err vs the f32 gather oracle on-chip);
            # on bf16 operands Mosaic rejects fp32 contract precision
            # ("Bad lhs type"), and bf16 is already the serving dtype.
            prec = (jax.lax.Precision.HIGHEST
                    if mm_dtype == jnp.float32 else None)
            part = jax.lax.dot_general(
                s_t.reshape(k, tq).astype(mm_dtype),
                win_k,
                (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=prec)                             # (TQ, lanes)
            if hpg > 1:
                part = jnp.where(lane_head == h, part, 0.0)
            out_ref[0, g] += part


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
            # the clip bound must ALSO be sublane-aligned: meta stores xs//8
            # and the kernel reconstructs the start as (xs//8)*8, so a
            # non-multiple-of-8 bound (any wv with (wv-WW) % 8 != 0) would
            # shift the DMA'd window up to 7 columns off the one-hot ix
            # offsets. Safe to round the bound DOWN: value maps are padded
            # by >= WW beyond wv and out-of-range corners are masked by
            # xin0/xin1.
            xs = jnp.clip((xs // 8) * 8, 0, (max(wv - WW, 0) // 8) * 8)

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
                # (ntile, M, P, q): queries last so the kernel reads them on
                # the lane dim (transposed-S build — see _kernel)
                a = a.transpose(0, 2, 3, 1)
                return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, pad_q)))
            iys.append(padq(jnp.where(yin0 | yin1, iy, -7)))
            ixs.append(padq(jnp.where(xin0 | xin1, ix, -7)))
            wy0s.append(padq(jnp.where(yin0, (1.0 - wy1) * aw, 0.0)))
            wy1s.append(padq(jnp.where(yin1, wy1 * aw, 0.0)))
            wx0s.append(padq(jnp.where(xin0, 1.0 - wx1, 0.0)))
            wx1s.append(padq(jnp.where(xin1, wx1, 0.0)))
            # xs stored /8: the kernel re-multiplies so Mosaic can prove
            # the sublane-tile divisibility of the dynamic window slice
            metas.append(jnp.stack([ys, xs // 8], axis=1))
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

    # head-grouped padded value maps: (G, H, W, hpg*D) per level — hpg
    # heads side by side on the lane dim so the minor extent is a whole
    # number of 128-lane tiles (Mosaic's window-DMA alignment rule);
    # padded so any (WH, WW) window starting in-range is in-bounds
    if d <= 128 and 128 % d == 0:
        hpg = 128 // d
    elif d % 128 == 0:
        hpg = 1
    else:
        raise ValueError(
            f"head_dim={d} is not DMA-tileable (needs d | 128 or 128 | d)")
    mp = -(-m // hpg) * hpg
    n_groups = mp // hpg
    lanes = hpg * d
    v_levels = []
    start = 0
    for hv, wv in spatial_shapes:
        vl = jax.lax.dynamic_slice_in_dim(value, start, hv * wv, axis=1)
        vl = vl.reshape(n, hv, wv, m, d)
        if mp != m:
            vl = jnp.pad(vl, ((0, 0),) * 3 + ((0, mp - m), (0, 0)))
        vl = (vl.reshape(n, hv, wv, n_groups, lanes)
                .transpose(0, 3, 1, 2, 4))
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
                pl.BlockSpec((1, m, p, tq), lambda s, meta: (s, 0, 0, 0)),
                pl.BlockSpec((1, m, p, tq), lambda s, meta: (s, 0, 0, 0)),
                pl.BlockSpec((1, m, p, tq), lambda s, meta: (s, 0, 0, 0)),
                pl.BlockSpec((1, m, p, tq), lambda s, meta: (s, 0, 0, 0)),
                pl.BlockSpec((1, m, p, tq), lambda s, meta: (s, 0, 0, 0)),
                pl.BlockSpec((1, m, p, tq), lambda s, meta: (s, 0, 0, 0)),
            ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_levels,
            out_specs=pl.BlockSpec(
                (1, n_groups, tq, lanes),
                lambda s, meta, nl=n_levels: (s // nl, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((n_groups, WH, WW, lanes), value.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            functools.partial(_kernel, n_levels=n_levels, n_heads=m,
                              tq=tq, head_dim=d, n_groups=n_groups,
                              hpg=hpg, mm_dtype=value.dtype),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles, n_groups, tq, lanes), f32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(meta, coords["iy"], coords["ix"], coords["wy0"], coords["wy1"],
          coords["wx0"], coords["wx1"], *vls)
        # ungroup lanes: (n_tiles, G, TQ, hpg*D) -> (n_tiles, M, TQ, D)
        out = (out.reshape(n_tiles, n_groups, tq, hpg, d)
                  .transpose(0, 1, 3, 2, 4)
                  .reshape(n_tiles, mp, tq, d)[:, :m])

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
