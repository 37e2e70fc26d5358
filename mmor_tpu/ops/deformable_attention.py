"""Multi-scale deformable attention sampling — TPU-native (XLA gather) core.

Replaces the reference's CUDA extension
(`panoptic_segmentation/mask2former/modeling/pixel_decoder/ops/src/`, see
SURVEY.md §2.3). Numerics follow the reference's own oracle
``ms_deform_attn_core_pytorch`` (`functions/ms_deform_attn_func.py:53-72`):
bilinear sampling with zero padding and ``align_corners=False`` over each
feature level, weighted by per-point attention.

The gather formulation lets XLA fuse and differentiate the whole op; shapes
are static (levels are a compile-time tuple) so it jits anywhere. A Pallas
kernel can replace the gather behind the same API if it ever dominates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

def _sample_level(
    value_l: jax.Array,  # (N, M, H*W, D) one level, heads leading
    h: int,
    w: int,
    loc: jax.Array,  # (N, Lq, M, P, 2) normalized [0,1]
) -> jax.Array:
    """Bilinear zero-padded sampling -> (N, M, Lq, P, D).

    One (2, 2, D) windowed gather per sampling point instead of four row
    gathers: the window start clamps into bounds and each gathered corner
    gets the bilinear hat weight evaluated at its ACTUAL coordinate —
    algebraically identical to zero-padded ``grid_sample`` (out-of-window
    corners land at hat weight 0), but with 4x fewer gather descriptors and
    contiguous 2-column reads. This is the TPU gather-unit-friendly layout
    (gathers, not matmuls, dominate the pixel decoder).
    """
    n, m, _, d = value_l.shape
    _, lq, _, points, _ = loc.shape

    # align_corners=False pixel mapping (torch grid_sample convention)
    x = (loc[..., 0] * w - 0.5).astype(jnp.float32)  # (N, Lq, M, P)
    y = (loc[..., 1] * h - 0.5).astype(jnp.float32)
    ys = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(h - 2, 0))
    xs = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(w - 2, 0))

    # (N, M, K, 2) window starts, K = Lq*P
    starts = jnp.stack([ys, xs], axis=-1).transpose(0, 2, 1, 3, 4).reshape(
        n, m, lq * points, 2
    )
    value_img = value_l.reshape(n, m, h, w, d)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    sy, sx = min(2, h), min(2, w)  # degenerate 1-pixel levels shrink the window
    gather_one = lambda v, s: jax.lax.gather(
        v, s, dnums, slice_sizes=(sy, sx, d), mode="promise_in_bounds"
    )  # (H, W, D), (K, 2) -> (K, sy, sx, D)
    # keep the gather output in the value dtype (bf16 halves the dominant
    # HBM traffic of the op); the combine accumulates in f32
    windows = jax.vmap(jax.vmap(gather_one))(value_img, starts)
    windows = windows.reshape(n, m, lq, points, sy, sx, d)

    # hat weights at the actual corner coordinates; OOB corners (coordinate
    # farther than 1 from the sample) get weight 0 == zero padding
    ysf = ys.astype(jnp.float32)
    xsf = xs.astype(jnp.float32)
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(y - ysf))
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(y - (ysf + 1.0)))
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(x - xsf))
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(x - (xsf + 1.0)))
    wgt = jnp.stack([
        jnp.stack([wy0 * wx0, wy0 * wx1], axis=-1),
        jnp.stack([wy1 * wx0, wy1 * wx1], axis=-1),
    ], axis=-2)  # (N, Lq, M, P, 2, 2)
    wgt = wgt.transpose(0, 2, 1, 3, 4, 5)[..., :sy, :sx]  # (N, M, Lq, P, sy, sx)

    return jnp.einsum(
        "nmqpyxd,nmqpyx->nmqpd",
        windows,
        wgt.astype(windows.dtype),
        preferred_element_type=jnp.float32,
    )


def _masked_gather_core(value, spatial_shapes, loc, attn_w):
    """The gather core with externally-masked weights (residual path)."""
    return _gather_core(value, spatial_shapes, loc, attn_w)


def _gather_core(value, spatial_shapes, sampling_locations, attention_weights):
    """Original windowed-gather formulation (also the training/vjp-simple
    fallback and the exact residual path of the tiled core)."""
    n, s, m, d = value.shape
    value_md = value.transpose(0, 2, 1, 3)  # (N, M, S, D)
    lq = sampling_locations.shape[1]
    out = jnp.zeros((n, m, lq, d), dtype=jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(value_md, start, h * w, axis=2)
        start += h * w
        sampled = _sample_level(value_l, h, w, sampling_locations[:, :, :, lvl])
        w_l = attention_weights[:, :, :, lvl].astype(jnp.float32).transpose(0, 2, 1, 3)
        out = out + jnp.einsum("nmqpd,nmqp->nmqd", sampled, w_l)
    return out.transpose(0, 2, 1, 3).reshape(n, lq, m * d).astype(value.dtype)


def _corner_decomp(coord, extent):
    """align_corners=False bilinear corners along one axis.

    coord: sampling location in [0,1] units; extent: H or W.
    Returns (c0 int32, w0, w1) with corners (c0, c0+1); out-of-range corners
    are NOT clipped (callers drop them, matching zero padding)."""
    t = (coord * extent - 0.5).astype(jnp.float32)
    c0 = jnp.floor(t)
    w1 = t - c0
    return c0.astype(jnp.int32), 1.0 - w1, w1


def _tile_rows(lq_shapes, target):
    """Per query level: rows-per-tile so a tile has ~``target`` queries."""
    plan = []
    for h, w in lq_shapes:
        tr = max(1, min(h, target // max(1, min(w, target))))
        plan.append(tr)
    return plan


def ms_deform_attn_tiled(
    value: jax.Array,  # (N, S, M, D)
    spatial_shapes: tuple[tuple[int, int], ...],
    sampling_locations: jax.Array,  # (N, Lq, M, L, P, 2)
    attention_weights: jax.Array,  # (N, Lq, M, L, P)
    *,
    query_shapes: tuple[tuple[int, int], ...] | None = None,
    window_rows: int = 16,
    tile_queries: int = 160,
) -> jax.Array:
    """MXU-native deformable attention for grid-organized queries.

    The encoder's queries ARE the flattened level grids (reference
    `msdeformattn.py`: encoder self-attention), so a run of consecutive
    queries is a spatial row band whose sampling points land in a matching
    row band of each value level (near-identity offsets,
    `ms_deform_attn.py` init). This core exploits that:

    - queries are processed in row-band tiles of ~``tile_queries``;
    - for each (tile, value level) a ``window_rows``-row band of the level
      (contiguous in the flattened S axis -> one dynamic slice, no gather)
      is fetched;
    - bilinear sampling + attention weighting collapse into ONE matmul per
      (tile, head, level): out = S @ window, where S's rows are built from
      two separable 2-corner one-hots (exact hat weights, f32) summed over
      the P points — the 4 bilinear corners are the outer product of the
      y/x one-hots, so S has exactly the grid_sample sparsity but lives as
      a dense (tile_q, window) operand the MXU consumes directly.

    Samples whose corners fall inside the feature map but OUTSIDE the
    fetched window (offsets larger than the band) are dropped from the
    matmul and routed through an exact residual pass: a `lax.cond`-gated
    run of the gather core with all in-window weights zeroed. With
    reference-scale offsets the overflow set is empty and the cond costs
    one predicate.

    Numerics: identical sampling semantics to `_gather_core` / the
    reference `ms_deform_attn_core_pytorch` (zero padding,
    align_corners=False); weights accumulate in f32.
    """
    n, s, m, d = value.shape
    _, lq, _, levels, points, _ = sampling_locations.shape
    if query_shapes is None:
        query_shapes = spatial_shapes
    assert lq == sum(h * w for h, w in query_shapes), "query grid mismatch"
    assert s == sum(h * w for h, w in spatial_shapes)

    f32 = jnp.float32
    loc = sampling_locations.astype(f32)
    attn = attention_weights.astype(f32)
    trs = _tile_rows(query_shapes, tile_queries)

    # per value level: (N, H*W, M, D) views
    v_levels = []
    start = 0
    for h, w in spatial_shapes:
        v_levels.append(
            jax.lax.dynamic_slice_in_dim(value, start, h * w, axis=1))
        start += h * w

    out_parts = []  # per query level: (N, Lq_l, M, D) f32
    overflow_any = jnp.zeros((), jnp.bool_)
    overflow_mask = jnp.zeros((n, lq, m, levels, points), jnp.bool_)
    q0 = 0
    for (hq, wq), tr in zip(query_shapes, trs):
        lq_l = hq * wq
        ntile = -(-hq // tr)
        pad_rows = ntile * tr - hq
        tq = tr * wq
        loc_l = loc[:, q0:q0 + lq_l]
        attn_l = attn[:, q0:q0 + lq_l]
        if pad_rows:
            # replicate the last row's queries (zero attention weight):
            # a constant center pad (0.5) would drag the band anchor's min
            # toward the image center for bottom tiles — see the same fix
            # in deformable_sampler._precompute
            loc_l = jnp.pad(loc_l, ((0, 0), (0, pad_rows * wq), (0, 0),
                                    (0, 0), (0, 0), (0, 0)), mode="edge")
            attn_l = jnp.pad(attn_l, ((0, 0), (0, pad_rows * wq), (0, 0),
                                      (0, 0), (0, 0)))
        # (N, ntile, TQ, M, L, P, ...)
        loc_t = loc_l.reshape(n, ntile, tq, m, levels, points, 2)
        attn_t = attn_l.reshape(n, ntile, tq, m, levels, points)

        acc = jnp.zeros((n, ntile, tq, m, d), f32)
        ovf_l = []
        for lvl, (hv, wv) in enumerate(spatial_shapes):
            wh = min(window_rows, hv)
            y0, wy0, wy1 = _corner_decomp(loc_t[..., lvl, :, 1], hv)
            x0, wx0, wx1 = _corner_decomp(loc_t[..., lvl, :, 0], wv)
            aw = attn_t[..., lvl, :]  # (N, ntile, TQ, P)

            # window start per (batch, tile): min in-bounds corner row,
            # clamped so the band fits the level
            ys = jnp.min(jnp.clip(y0, 0, hv - 1), axis=(2, 3, 4))
            ys = jnp.clip(ys, 0, max(hv - wh, 0))  # (N, ntile)

            iy0 = y0 - ys[:, :, None, None, None]
            iy1 = iy0 + 1
            yin0 = (iy0 >= 0) & (iy0 < wh) & (y0 >= 0) & (y0 < hv)
            yin1 = (iy1 >= 0) & (iy1 < wh) & (y0 + 1 >= 0) & (y0 + 1 < hv)
            xin0 = (x0 >= 0) & (x0 < wv)
            xin1 = (x0 + 1 >= 0) & (x0 + 1 < wv)

            # overflow: corner inside the map but outside the y-band.
            # An overflowing SAMPLE is dropped from S entirely (aw -> 0) and
            # recomputed whole by the residual pass — corner-level splitting
            # would double-count its in-window corners there.
            ovf = (((y0 >= 0) & (y0 < hv) & ~yin0 & (wy0 > 0))
                   | ((y0 + 1 >= 0) & (y0 + 1 < hv) & ~yin1 & (wy1 > 0)))
            ovf = ovf & (aw != 0)
            ovf_l.append(ovf)
            aw = jnp.where(ovf, 0.0, aw)

            # head-major layouts so the big ops are clean batched matmuls
            # over leading (batch, tile, head) dims — interleaved einsum
            # dims made XLA materialize transposed copies of the
            # gigabyte-scale S (measured 545 ms/frame vs the gather core's
            # 308 before this reorder)
            to_hm = lambda a: a.transpose(0, 1, 3, 2, 4)  # btqmp -> btmqp
            iy0h, iy1h = to_hm(iy0), to_hm(iy1)
            x0h = to_hm(x0)
            awh = to_hm(aw)  # overflow samples already zeroed above
            ity = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, 1, wh), 5)
            itx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, 1, wv), 5)
            wy_oh = (to_hm(jnp.where(yin0, wy0, 0.0))[..., None]
                     * (ity == iy0h[..., None])
                     + to_hm(jnp.where(yin1, wy1, 0.0))[..., None]
                     * (ity == iy1h[..., None]))  # (N,ntile,M,TQ,P,wh)
            wx_oh = (to_hm(jnp.where(xin0, wx0, 0.0))[..., None]
                     * (itx == x0h[..., None])
                     + to_hm(jnp.where(xin1, wx1, 0.0))[..., None]
                     * (itx == (x0h + 1)[..., None]))  # (N,ntile,M,TQ,P,wv)
            wy_oh = wy_oh * awh[..., None]

            # S: contract P -> (N, ntile, M, TQ, wh*wv), batch dims leading
            s_mat = jax.lax.dot_general(
                wy_oh, wx_oh,
                (((4,), (4,)), ((0, 1, 2, 3), (0, 1, 2, 3))),
                preferred_element_type=f32)  # (N,ntile,M,TQ,wh,wv)
            s_mat = s_mat.reshape(n, ntile, m, tq, wh * wv)

            # window fetch: rows [ys, ys+wh) of the row-major level are
            # contiguous -> one dynamic slice per (batch, tile); transpose
            # to head-major (small vs S) for the batched matmul
            v_l = v_levels[lvl]  # (N, H*W, M, D)

            def fetch(vb, ysb):
                return jax.vmap(lambda y: jax.lax.dynamic_slice(
                    vb, (y * wv, 0, 0), (wh * wv, m, d)))(ysb)

            win = jax.vmap(fetch)(v_l, ys)  # (N, ntile, wh*wv, M, D)
            win = win.transpose(0, 1, 3, 2, 4)  # (N, ntile, M, wh*wv, D)

            # (TQ, K) @ (K, D) batched over (N, ntile, M)
            out_hm = jax.lax.dot_general(
                s_mat.astype(value.dtype), win,
                (((4,), (3,)), ((0, 1, 2), (0, 1, 2))),
                preferred_element_type=f32)  # (N, ntile, M, TQ, D)
            acc = acc + out_hm.transpose(0, 1, 3, 2, 4)
        # ovf entries: (N, ntile, TQ, M, P) per level -> (N,ntile,TQ,M,L,P)
        ovf_lvl = jnp.stack(ovf_l, axis=4)
        ovf_lvl = ovf_lvl.reshape(n, ntile * tq, m, levels, points)[
            :, :lq_l]
        overflow_mask = jax.lax.dynamic_update_slice(
            overflow_mask, ovf_lvl, (0, q0, 0, 0, 0))
        overflow_any = overflow_any | jnp.any(ovf_lvl)
        out_parts.append(acc.reshape(n, ntile * tq, m, d)[:, :lq_l])
        q0 += lq_l

    out = jnp.concatenate(out_parts, axis=1)  # (N, Lq, M, D) f32

    def residual(_):
        res = _masked_gather_core(
            value, spatial_shapes, sampling_locations,
            jnp.where(overflow_mask, attention_weights, 0.0))
        return res.reshape(n, lq, m, d).astype(f32)

    out = out + jax.lax.cond(
        overflow_any, residual, lambda _: jnp.zeros_like(out), None)
    return out.reshape(n, lq, m * d).astype(value.dtype)


def ms_deform_attn(
    value: jax.Array,  # (N, S, M, D) flattened multi-level features
    spatial_shapes: tuple[tuple[int, int], ...],  # static ((H1,W1), ...)
    sampling_locations: jax.Array,  # (N, Lq, M, L, P, 2) in [0,1]
    attention_weights: jax.Array,  # (N, Lq, M, L, P), softmaxed over L*P
) -> jax.Array:
    """Deformable attention core -> (N, Lq, M*D)."""
    n, s, m, d = value.shape
    _, lq, _, levels, _points, _ = sampling_locations.shape
    assert levels == len(spatial_shapes), "level count mismatch"
    assert s == sum(h * w for h, w in spatial_shapes), "flattened size mismatch"

    value_md = value.transpose(0, 2, 1, 3)  # (N, M, S, D)
    out = jnp.zeros((n, m, lq, d), dtype=jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(value_md, start, h * w, axis=2)
        start += h * w
        sampled = _sample_level(value_l, h, w, sampling_locations[:, :, :, lvl])
        w_l = attention_weights[:, :, :, lvl].astype(jnp.float32).transpose(0, 2, 1, 3)
        out = out + jnp.einsum("nmqpd,nmqp->nmqd", sampled, w_l)

    return out.transpose(0, 2, 1, 3).reshape(n, lq, m * d).astype(value.dtype)
