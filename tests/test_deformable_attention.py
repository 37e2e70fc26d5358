"""Deformable attention vs the reference's pure-PyTorch oracle semantics.

The oracle below re-states `ms_deform_attn_core_pytorch`
(`ops/functions/ms_deform_attn_func.py:53-72`) using torch (CPU), exactly as
the reference's own op test does (`ops/test.py:31-55`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.ops.deformable_attention import ms_deform_attn

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def oracle(value, spatial_shapes, sampling_locations, attention_weights):
    value = torch.from_numpy(value)
    sampling_locations = torch.from_numpy(sampling_locations)
    attention_weights = torch.from_numpy(attention_weights)
    n, s, m, d = value.shape
    _, lq, _, levels, points, _ = sampling_locations.shape
    value_list = value.split([h * w for h, w in spatial_shapes], dim=1)
    grids = 2 * sampling_locations - 1
    samples = []
    for lid, (h, w) in enumerate(spatial_shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        samples.append(
            F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        )
    attn = attention_weights.transpose(1, 2).reshape(n * m, 1, lq, levels * points)
    out = (torch.stack(samples, dim=-2).flatten(-2) * attn).sum(-1).view(n, m * d, lq)
    return out.transpose(1, 2).contiguous().numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_grid_sample_oracle(seed):
    rng = np.random.default_rng(seed)
    shapes = ((6, 4), (3, 2))
    n, m, d, lq, points = 2, 4, 8, 5, 3
    s = sum(h * w for h, w in shapes)
    value = rng.standard_normal((n, s, m, d), dtype=np.float32)
    loc = rng.uniform(-0.2, 1.2, (n, lq, m, len(shapes), points, 2)).astype(np.float32)
    attn = rng.uniform(0, 1, (n, lq, m, len(shapes), points)).astype(np.float32)
    attn /= attn.reshape(n, lq, m, -1).sum(-1)[..., None, None]

    got = np.asarray(ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    want = oracle(value, shapes, loc, attn)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gradients_flow():
    shapes = ((4, 4),)
    n, m, d, lq, points = 1, 2, 4, 3, 2
    s = 16
    key = jax.random.PRNGKey(0)
    value = jax.random.normal(key, (n, s, m, d))
    loc = jax.random.uniform(jax.random.PRNGKey(1), (n, lq, m, 1, points, 2))
    attn = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(2), (n, lq, m, 1, points)), axis=-1
    )

    def loss(value, loc, attn):
        return jnp.sum(ms_deform_attn(value, shapes, loc, attn) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(value, loc, attn)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.max(jnp.abs(g))) > 0


def _grid_refs(shapes):
    refs = []
    for h, w in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        refs.append(np.stack([gx.ravel(), gy.ravel()], -1))
    return np.concatenate(refs, 0)


@pytest.mark.parametrize("off_scale", [0.03, 0.7])
def test_tiled_matches_oracle(off_scale):
    """MXU-tiled core vs the torch grid_sample oracle, grid queries.

    off_scale=0.7 pushes most samples outside the y-band windows and
    exercises the exact lax.cond residual path."""
    from mmor_tpu.ops.deformable_attention import ms_deform_attn_tiled

    rng = np.random.default_rng(3)
    shapes = ((12, 20), (6, 10), (3, 5))
    n, m, d, points = 2, 4, 8, 4
    s = sum(h * w for h, w in shapes)
    lq = s
    value = rng.standard_normal((n, s, m, d), dtype=np.float32)
    ref = _grid_refs(shapes)
    L = len(shapes)
    off = rng.uniform(-off_scale, off_scale, (n, lq, m, L, points, 2))
    loc = (ref[None, :, None, None, None, :] + off).astype(np.float32)
    attn = rng.uniform(0, 1, (n, lq, m, L, points)).astype(np.float32)
    attn /= attn.reshape(n, lq, m, -1).sum(-1)[..., None, None]

    got = np.asarray(ms_deform_attn_tiled(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        window_rows=6))
    want = oracle(value, shapes, loc, attn)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_tiled_gradients_flow():
    from mmor_tpu.ops.deformable_attention import ms_deform_attn_tiled

    shapes = ((4, 4), (2, 2))
    n, m, d, points = 1, 2, 4, 2
    s = 20
    lq = s
    key = jax.random.PRNGKey(0)
    value = jax.random.normal(key, (n, s, m, d))
    ref = jnp.asarray(_grid_refs(shapes), jnp.float32)
    loc = jnp.broadcast_to(
        ref[None, :, None, None, None, :], (n, lq, m, 2, points, 2))
    loc = loc + 0.05 * jax.random.normal(jax.random.PRNGKey(1), loc.shape)
    attn = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(2), (n, lq, m, 2 * points)),
        axis=-1).reshape(n, lq, m, 2, points)

    def loss(value, loc, attn):
        return jnp.sum(ms_deform_attn_tiled(value, shapes, loc, attn,
                                            window_rows=4) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(value, loc, attn)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.max(jnp.abs(g))) > 0


@pytest.mark.parametrize("off_scale", [0.03, 0.5])
def test_pallas_sampler_matches_oracle(off_scale):
    """Pallas one-hot-matmul sampler (interpret mode) vs the torch
    grid_sample oracle; off_scale=0.5 exercises the residual path."""
    from mmor_tpu.ops.deformable_sampler import ms_deform_attn_pallas

    rng = np.random.default_rng(5)
    shapes = ((24, 40), (12, 20), (6, 10))
    n, m, d, points = 2, 4, 8, 4
    s = sum(h * w for h, w in shapes)
    lq = s
    value = rng.standard_normal((n, s, m, d), dtype=np.float32)
    ref = _grid_refs(shapes)
    L = len(shapes)
    off = rng.uniform(-off_scale, off_scale, (n, lq, m, L, points, 2))
    loc = (ref[None, :, None, None, None, :] + off).astype(np.float32)
    attn = rng.uniform(0, 1, (n, lq, m, L, points)).astype(np.float32)
    attn /= attn.reshape(n, lq, m, -1).sum(-1)[..., None, None]

    got = np.asarray(ms_deform_attn_pallas(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        interpret=True))
    want = oracle(value, shapes, loc, attn)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_sampler_no_overflow_at_ragged_grids():
    """Window anchoring on RAGGED tile grids (production R50 shapes are
    92x160/46x80/23x40 — none divisible by their tile edges) must keep
    reference-scale samples inside their windows: the zero-weight pad
    queries used to sit at the image center (constant 0.5 pad) and dragged
    edge tiles' windows away from their real queries, firing the slow
    gather residual on every frame. Pad queries now replicate edge rows."""
    from mmor_tpu.ops.deformable_sampler import (_precompute, _tile_edges)

    shapes = ((46, 80), (23, 40))
    m, p = 2, 4
    s = sum(h * w for h, w in shapes)
    lq = s
    rng = np.random.default_rng(3)
    ref = _grid_refs(shapes)
    # reference-init-scale offsets: within a few pixels of the query point
    off = rng.uniform(-0.02, 0.02, (lq, m, len(shapes), p, 2))
    loc = jnp.asarray(ref[:, None, None, None, :] + off, jnp.float32)
    attn = rng.uniform(0.1, 1.0, (lq, m, len(shapes), p))
    attn = jnp.asarray(attn / attn.reshape(lq, m, -1).sum(-1)
                       .reshape(lq, m, 1, 1), jnp.float32)
    edges = _tile_edges(shapes)
    meta, coords, ovf, _ = _precompute(loc, attn, shapes, shapes, edges)
    assert not bool(jnp.any(ovf)), (
        f"{int(jnp.sum(ovf))} in-map samples fell outside their windows")


def test_pallas_sampler_misaligned_window_bound():
    """Regression (ADVICE r4 high): a level width with (wv - WW) % 8 != 0
    used to clip the 8-aligned window x-start to a NON-multiple-of-8 bound
    (max(wv-WW,0)); meta stores xs//8 and the kernel reconstructs (xs//8)*8,
    so the DMA'd window shifted up to 7 columns off the one-hot ix offsets
    — silently wrong output (max_abs_err ~4.4 at a (32,44) level). The
    bound is now rounded down to a multiple of 8."""
    from mmor_tpu.ops.deformable_sampler import ms_deform_attn_pallas

    rng = np.random.default_rng(7)
    shapes = ((32, 44),)  # wv - WW = 4: the misaligned clip bound
    m, d, points = 2, 8, 4
    s = sum(h * w for h, w in shapes)
    lq = s
    value = rng.standard_normal((1, s, m, d), dtype=np.float32)
    ref = _grid_refs(shapes)
    off = rng.uniform(-0.03, 0.03, (1, lq, m, 1, points, 2))
    loc = (ref[None, :, None, None, None, :] + off).astype(np.float32)
    attn = rng.uniform(0, 1, (1, lq, m, 1, points)).astype(np.float32)
    attn /= attn.reshape(1, lq, m, -1).sum(-1)[..., None, None]

    got = np.asarray(ms_deform_attn_pallas(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        interpret=True))
    want = oracle(value, shapes, loc, attn)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("scale_px", [8.0, 16.0, 32.0])
def test_pallas_sampler_trained_offset_stress(scale_px):
    """Offset-distribution stress (VERDICT r3 #3): trained models learn
    offsets well beyond the reference init (~4 px at the finest level).
    At x2/x4/x8 of that scale, at ragged production R50 shapes, the
    sampler must (a) stay EXACT vs the oracle — the gather residual covers
    whatever falls outside the (32x40) windows — and (b) keep the
    fast-path/residual split sane: the window slack is ~8 rows around a
    16-row tile, so x2 (8 px) must stay fully in-window and even x8 must
    keep the overflow a small minority (it costs one slow gather pass per
    frame when nonzero)."""
    from mmor_tpu.ops.deformable_sampler import (
        _precompute,
        _tile_edges,
        ms_deform_attn_pallas,
    )

    shapes = ((23, 40), (12, 20), (6, 10))  # production aspect, test-sized
    m, p = 2, 4
    s = sum(h * w for h, w in shapes)
    lq = s
    rng = np.random.default_rng(11)
    ref = _grid_refs(shapes)
    # normalized offsets equivalent to scale_px pixels AT EACH LEVEL
    # (trained offsets scale with the level's resolution)
    widths = np.array([w for _, w in shapes], dtype=np.float32)
    heights = np.array([h for h, _ in shapes], dtype=np.float32)
    unit = rng.uniform(-1.0, 1.0, (lq, m, len(shapes), p, 2))
    off = np.stack([
        unit[..., 0] * (scale_px / 4.0) / widths[None, None, :, None],
        unit[..., 1] * (scale_px / 4.0) / heights[None, None, :, None],
    ], axis=-1)
    loc = np.clip(ref[:, None, None, None, :] + off, 0.0, 1.0).astype(np.float32)
    attn = rng.uniform(0.1, 1.0, (lq, m, len(shapes), p)).astype(np.float32)
    attn /= attn.reshape(lq, m, -1).sum(-1).reshape(lq, m, 1, 1)

    # (b) split accounting
    edges = _tile_edges(shapes)
    _, _, ovf, _ = _precompute(
        jnp.asarray(loc), jnp.asarray(attn), shapes, shapes, edges)
    frac = float(jnp.mean(ovf.astype(jnp.float32)))
    if scale_px <= 8.0:
        assert frac == 0.0, f"x2 init-scale offsets overflowed ({frac:.4f})"
    else:
        assert frac < 0.35, f"overflow fraction {frac:.3f} at {scale_px}px"

    # (a) exactness regardless of the split
    value = rng.standard_normal((1, s, m, 8)).astype(np.float32)
    got = np.asarray(ms_deform_attn_pallas(
        jnp.asarray(value), shapes,
        jnp.asarray(loc[None]), jnp.asarray(attn[None]), interpret=True))
    want = oracle(value, shapes, loc[None], attn[None])
    np.testing.assert_allclose(got, want, atol=1e-4)
