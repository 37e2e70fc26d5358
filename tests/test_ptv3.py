"""PTv3 TPU-native encoder: shapes, masking, permutation invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmor_tpu.config import PTv3Config
from mmor_tpu.models.ptv3 import (
    PointTransformerV3,
    encode_pointcloud_batch,
    voxelize,
)


def _cloud(key, n_valid, capacity):
    pts = jax.random.uniform(key, (capacity, 6), minval=0.0, maxval=2.0)
    # snap xyz to a coarse lattice so every point owns a distinct voxel
    xyz = jnp.round(pts[:, :3] * 20) / 20 + jnp.arange(capacity)[:, None] * 0.06
    pts = pts.at[:, :3].set(xyz)
    valid = jnp.arange(capacity) < n_valid
    return jnp.where(valid[:, None], pts, 0.0), valid


@pytest.fixture(scope="module")
def tiny_ptv3():
    cfg = PTv3Config.tiny()
    model = PointTransformerV3(cfg)
    pts, valid = _cloud(jax.random.PRNGKey(0), 200, cfg.max_points)
    params = model.init(jax.random.PRNGKey(1), pts, valid)
    return cfg, model, params


def test_voxelize_origin_shift():
    # values chosen off voxel boundaries (floor of float ratios is exact)
    pts = jnp.array([[1.0, 2.0, 3.0, 0, 0, 0], [1.07, 2.0, 3.12, 0, 0, 0]])
    valid = jnp.array([True, True])
    grid, _ = voxelize(pts, valid, 0.05)
    np.testing.assert_array_equal(np.asarray(grid[0]), [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(grid[1]), [1, 0, 2])


def test_forward_shape_and_finite(tiny_ptv3):
    cfg, model, params = tiny_ptv3
    pts, valid = _cloud(jax.random.PRNGKey(2), 180, cfg.max_points)
    out = model.apply(params, pts, valid)
    assert out.shape == (cfg.out_dim,)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_padding_content_ignored(tiny_ptv3):
    cfg, model, params = tiny_ptv3
    pts, valid = _cloud(jax.random.PRNGKey(3), 150, cfg.max_points)
    out1 = model.apply(params, pts, valid)
    # garbage in padded rows must not change the result
    garbage = jnp.where(valid[:, None], pts, 123.0)
    out2 = model.apply(params, garbage, valid)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_permutation_invariance(tiny_ptv3):
    cfg, model, params = tiny_ptv3
    pts, valid = _cloud(jax.random.PRNGKey(4), cfg.max_points, cfg.max_points)
    out1 = model.apply(params, pts, valid)
    perm = jax.random.permutation(jax.random.PRNGKey(5), cfg.max_points)
    out2 = model.apply(params, pts[perm], valid[perm])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_batch_vmap(tiny_ptv3):
    cfg, model, params = tiny_ptv3
    pts0, valid0 = _cloud(jax.random.PRNGKey(6), 100, cfg.max_points)
    pts1, valid1 = _cloud(jax.random.PRNGKey(7), 250, cfg.max_points)
    batch_pts = jnp.stack([pts0, pts1])
    batch_valid = jnp.stack([valid0, valid1])
    out = encode_pointcloud_batch(model, params, batch_pts, batch_valid)
    assert out.shape == (2, cfg.out_dim)
    single = model.apply(params, pts0, valid0)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), atol=1e-5)


def test_curve_neighborhood_locality():
    """The stem's k=3 depthwise mix along the serialized curve stands in for
    spconv's submanifold 3x3x3 aggregation (models/ptv3.py docstring). That
    analogy is only sound if curve-adjacent points are SPATIALLY adjacent —
    quantify it: for dense and for clustered clouds, most consecutive pairs
    in hilbert/z order must fall within a Chebyshev-2 voxel neighborhood
    (i.e. inside the 5x5x5 hull around the 3x3x3 kernel's support)."""
    from mmor_tpu.ops.serialization import encode

    rng = np.random.default_rng(0)

    def locality(coords, order):
        code = np.asarray(encode(jnp.asarray(coords, jnp.int32), order))
        idx = np.argsort(code, kind="stable")
        sorted_coords = coords[idx]
        cheb = np.abs(np.diff(sorted_coords, axis=0)).max(axis=1)
        return (cheb <= 2).mean(), np.median(cheb)

    # dense block: every voxel of a 16^3 grid occupied
    g = np.stack(np.meshgrid(*([np.arange(16)] * 3), indexing="ij"), -1)
    dense = g.reshape(-1, 3)
    frac_h, med_h = locality(dense, "hilbert")
    frac_z, med_z = locality(dense, "z")
    # hilbert steps are unit steps by construction on a dense grid
    assert med_h == 1 and frac_h == 1.0
    assert frac_z > 0.85, frac_z  # z-order takes occasional long jumps

    # clustered cloud (realistic OR scene: a few dense blobs). Sparse at
    # grid resolution, so judge curve steps RELATIVE to each point's true
    # nearest neighbor: the curve mix aggregates neighborhoods about as
    # local as a spatial kernel could (ratio ~1 = perfect).
    centers = rng.uniform(0, 800, (6, 3))
    pts = np.concatenate([
        c + rng.normal(0, 20, (300, 3)) for c in centers
    ]).clip(0, 1023).astype(np.int32)
    code = np.asarray(encode(jnp.asarray(pts, jnp.int32), "hilbert"))
    idx = np.argsort(code, kind="stable")
    cheb = np.abs(np.diff(pts[idx], axis=0)).max(axis=1)
    d = np.abs(pts[:, None] - pts[None]).max(-1).astype(np.float64)
    np.fill_diagonal(d, 1e9)
    nn = d.min(1)
    ratio = cheb / np.maximum(nn[idx][:-1], 1)
    assert np.median(ratio) <= 2.5, np.median(ratio)  # measured 1.75
    assert (ratio <= 3).mean() > 0.7  # measured 0.81
